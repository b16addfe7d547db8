"""Pinpoint raster kernel per-cell overhead: empty kernel, dynamic-bound
loops vs static loops, and output-write cost, on the production grid."""

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

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    FC = 128
    B, H, W = 252, 160, 160
    Fp = 1280
    C = Fp // FC

    rng = np.random.default_rng(0)
    coeffT = jnp.asarray(rng.normal(size=(B, 9, Fp)).astype(np.float32))
    invzT = jnp.asarray(rng.uniform(1, 3, size=(B, 3, Fp)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(B, Fp, 64)).astype(np.float32))
    # ranges: ~2.2 active chunks per tile on average
    rg = np.zeros((B, 64, 2), np.int32)

    def run(tile_rows, variant):
        Pt = tile_rows * W
        n_tiles = H // tile_rows
        pix = np.stack(
            [
                np.tile(np.arange(W, dtype=np.float32), H),
                np.repeat(np.arange(H, dtype=np.float32), W),
                np.ones(H * W, np.float32),
            ],
            axis=-1,
        )
        pix_j = jnp.asarray(pix)
        r = np.zeros((B, n_tiles, 2), np.int32)
        for ti in range(n_tiles):
            lo = int(ti * C / n_tiles)
            r[:, ti, 0] = lo
            r[:, ti, 1] = min(lo + 2, C)
        ranges = jnp.asarray(r)

        def kern(pix_ref, coeff_ref, invz_ref, table_ref, ranges_ref, out_ref):
            tile = pl.program_id(1)
            c_lo = ranges_ref[0, tile, 0]
            c_hi = ranges_ref[0, tile, 1]
            if variant == "empty":
                out_ref[0, :, :] = jnp.zeros((Pt, 16), jnp.float32)
                return
            px = pix_ref[:, 0:1]
            py = pix_ref[:, 1:2]
            pxb = jnp.broadcast_to(px, (Pt, FC))
            pyb = jnp.broadcast_to(py, (Pt, FC))
            lane_iota = jax.lax.broadcasted_iota(jnp.int32, (Pt, FC), 1)
            lane_rev = FC - 1 - lane_iota

            def body(c, carry):
                packed_best, best_chunk = carry
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
                packed = (
                    jax.lax.bitcast_convert_type(score, jnp.int32)
                    & ~jnp.int32(FC - 1)
                ) | lane_rev
                improved = packed > packed_best
                return (
                    jnp.where(improved, packed, packed_best),
                    jnp.where(improved, jnp.float32(c), best_chunk),
                )

            init = (
                jnp.full((Pt, FC), np.float32(-1.0).view(np.int32), jnp.int32),
                jnp.zeros((Pt, FC), jnp.float32),
            )
            if variant in ("static", "pass1_static"):
                def bodyg(c, carry):
                    on = (c >= c_lo) & (c < c_hi)
                    new = body(c, carry)
                    return (
                        jnp.where(on, new[0], carry[0]),
                        jnp.where(on, new[1], carry[1]),
                    )

                packed_best, best_chunk = jax.lax.fori_loop(0, C, bodyg, init)
            elif variant == "static2":
                # exactly 2 chunks, statically unrolled at c_lo, c_lo+1
                packed_best, best_chunk = body(c_lo, init)
                packed_best, best_chunk = body(c_lo + 1, (packed_best, best_chunk))
            else:  # dynamic
                packed_best, best_chunk = jax.lax.fori_loop(c_lo, c_hi, body, init)

            if variant.startswith("pass1"):
                out_ref[0, :, :] = jnp.broadcast_to(
                    packed_best[:, :1].astype(jnp.float32), (Pt, 16)
                )
                return
            packed_top = jnp.max(packed_best, axis=-1, keepdims=True)
            hit = packed_top > 0
            win_lane = (FC - 1) - (packed_top & jnp.int32(FC - 1))
            onehot_lane = (lane_iota == win_lane).astype(jnp.float32)

            def body2(c, row):
                ds = pl.ds(c * FC, FC)
                sel = onehot_lane * (best_chunk == jnp.float32(c))
                return row + jnp.dot(
                    sel, table_ref[0, ds, :], preferred_element_type=jnp.float32
                )

            row = jax.lax.fori_loop(
                c_lo, c_hi, body2, jnp.zeros((Pt, 64), jnp.float32)
            )
            out_ref[0, :, :] = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (Pt, 16), 1) == 11,
                hit.astype(jnp.float32),
                row[:, :16],
            )

        f = pl.pallas_call(
            kern,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec((Pt, 3), lambda b, t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 9, Fp), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, Fp), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Fp, 64), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_tiles, 2), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, Pt, 16), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, H * W, 16), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )
        g = jax.jit(lambda: f(pix_j, coeffT, invzT, table, ranges))
        return t(g)

    for tr in (4, 8):
        for variant in ("empty", "pass1_dyn", "pass1_static", "dyn", "static", "static2"):
            ms = run(tr, variant)
            print(f"tile_rows={tr} {variant:13s}: {ms:7.1f} ms")


if __name__ == "__main__":
    main()
