"""Isolate Pallas raster kernel costs: cond overhead, loop body, fetch, interp.

Builds stripped kernel variants over the same real face tables and times them
on the device.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, n=10):
    import jax

    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return 1e3 * (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from foundationpose_tpu.core import geometry as geo, meshio
    from foundationpose_tpu.ops import raster

    FC = 128
    B, H, W = 252, 160, 160
    tile_rows = 8
    Pt = tile_rows * W
    n_tiles = H // tile_rows
    Fp = 1280
    n_chunks = Fp // FC

    rng = np.random.default_rng(0)
    pix = np.stack(
        [
            np.tile(np.arange(W, dtype=np.float32), H),
            np.repeat(np.arange(H, dtype=np.float32), W),
            np.ones(H * W, np.float32),
        ],
        axis=-1,
    )
    coeffT = jnp.asarray(rng.normal(size=(B, 9, Fp)).astype(np.float32))
    invzT = jnp.asarray(rng.uniform(1, 3, size=(B, 3, Fp)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(B, Fp, 64)).astype(np.float32))
    pix = jnp.asarray(pix)
    active_all = jnp.ones((B, n_tiles, 128), jnp.int32)
    # realistic culled bitmap: ~2 active chunks per tile
    act = np.zeros((B, n_tiles, 128), np.int32)
    for ti in range(n_tiles):
        act[:, ti, (ti // 2) % n_chunks] = 1
        act[:, ti, (ti // 2 + 1) % n_chunks] = 1
    active_cull = jnp.asarray(act)

    def make(variant, use_cond):
        def kern(pix_ref, coeff_ref, invz_ref, table_ref, active_ref, out_ref):
            tile = pl.program_id(1)
            px = pix_ref[:, 0:1]
            py = pix_ref[:, 1:2]
            pxb = jnp.broadcast_to(px, (Pt, FC))
            pyb = jnp.broadcast_to(py, (Pt, FC))

            def chunk(c, carry):
                best, bchunk = carry
                ds = pl.ds(c * FC, FC)
                w = [
                    pxb * coeff_ref[0, 3 * k : 3 * k + 1, ds]
                    + pyb * coeff_ref[0, 3 * k + 1 : 3 * k + 2, ds]
                    + coeff_ref[0, 3 * k + 2 : 3 * k + 3, ds]
                    for k in range(3)
                ]
                inside = jnp.minimum(w[0], jnp.minimum(w[1], w[2])) >= -1e-6
                piz = (
                    w[0] * invz_ref[0, 0:1, ds]
                    + w[1] * invz_ref[0, 1:2, ds]
                    + w[2] * invz_ref[0, 2:3, ds]
                )
                score = jnp.where(inside, piz, -1.0)
                imp = score > best
                return jnp.where(imp, score, best), jnp.where(
                    imp, jnp.float32(c), bchunk
                )

            def body(c, carry):
                if use_cond:
                    return jax.lax.cond(
                        active_ref[0, tile, c] != 0,
                        lambda cy: chunk(c, cy),
                        lambda cy: cy,
                        carry,
                    )
                return chunk(c, carry)

            init = (
                jnp.full((Pt, FC), -1.0, jnp.float32),
                jnp.zeros((Pt, FC), jnp.float32),
            )
            best, bchunk = jax.lax.fori_loop(0, n_chunks, body, init)
            if variant == "loop":
                out_ref[0, :, :] = jnp.broadcast_to(
                    jnp.max(best, axis=-1, keepdims=True), (Pt, 16)
                )
                return

            top = jnp.max(best, axis=-1, keepdims=True)
            hit = top > 0.0
            iota = jax.lax.broadcasted_iota(jnp.int32, (Pt, FC), 1)
            win = jnp.min(
                jnp.where(best == top, iota, FC), axis=-1, keepdims=True
            )
            onehot = (iota == win).astype(jnp.float32)
            wchunk = jnp.sum(onehot * bchunk, axis=-1, keepdims=True)
            if variant == "reduce":
                out_ref[0, :, :] = jnp.broadcast_to(wchunk, (Pt, 16))
                return

            def body2(c, row):
                def fetch(r):
                    ds = pl.ds(c * FC, FC)
                    sel = onehot * (wchunk == jnp.float32(c))
                    return r + jnp.dot(
                        sel, table_ref[0, ds, :],
                        preferred_element_type=jnp.float32,
                    )

                if use_cond:
                    return jax.lax.cond(
                        active_ref[0, tile, c] != 0, fetch, lambda r: r, row
                    )
                return fetch(row)

            row = jax.lax.fori_loop(
                0, n_chunks, body2, jnp.zeros((Pt, 64), jnp.float32)
            )
            if variant == "fetch":
                out_ref[0, :, :] = row[:, :16]
                return

            hitf = hit.astype(jnp.float32)
            attrs = [row[:, 16 * k : 16 * k + 16] for k in range(3, 4)] * 3
            dx = px - row[:, 9:10]
            dy = py - row[:, 10:11]
            pw = []
            for k in range(3):
                w_k = (
                    row[:, 3 * k : 3 * k + 1] * dx
                    + row[:, 3 * k + 1 : 3 * k + 2] * dy
                    + row[:, 3 * k + 2 : 3 * k + 3]
                )
                pw.append(w_k * attrs[k][:, 0:1])
            s = jnp.maximum(pw[0] + pw[1] + pw[2], 1e-12)
            interp = (pw[0] * attrs[0] + pw[1] * attrs[1] + pw[2] * attrs[2]) / s
            interp = interp * hitf
            mask_col = jax.lax.broadcasted_iota(jnp.int32, (Pt, 16), 1) == 11
            out_ref[0, :, :] = jnp.where(mask_col, hitf, interp)

        f = pl.pallas_call(
            kern,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec((Pt, 3), lambda b, t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 9, Fp), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, Fp), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Fp, 64), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_tiles, 128), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, Pt, 16), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, H * W, 16), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )
        return jax.jit(lambda: f(pix, coeffT, invzT, table, active_all)), jax.jit(
            lambda: f(pix, coeffT, invzT, table, active_cull)
        )

    for variant in ("loop", "reduce", "fetch", "full"):
        for use_cond in (False, True):
            fa, fc = make(variant, use_cond)
            msa = t(fa)
            msc = t(fc) if use_cond else float("nan")
            print(
                f"{variant:7s} cond={use_cond}: all-active {msa:7.1f} ms"
                + (f"   culled {msc:7.1f} ms" if use_cond else "")
            )


if __name__ == "__main__":
    main()
