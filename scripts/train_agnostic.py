"""Train the object-agnostic RefineNet + ScoreNet pair on the randomized
mesh corpus and save a reusable checkpoint (weights/agnostic by default).

Run on the TPU (single process — see tests/conftest.py note about the
shared chip):

    cd /root/repo && timeout 7200 python scripts/train_agnostic.py \
        --steps-refiner 20000 --steps-scorer 12000 --out weights/agnostic

The checkpoint is what evalsuite/harness.py's learned mode and
apps/run_pose.py --mode learned consume: ONE net pair for every object
(reference parity: predict_pose_refine.py:93-147, training_config.py:20).
"""

import argparse
import json
import logging
import os
import sys
import time

# repo root importable regardless of invocation directory (do NOT set
# PYTHONPATH for this — it would shadow the host's sitecustomize path that
# registers the TPU PJRT plugin)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights/agnostic")
    ap.add_argument("--n-meshes", type=int, default=40)
    ap.add_argument("--corpus-seed", type=int, default=7)
    ap.add_argument("--steps-refiner", type=int, default=20000)
    ap.add_argument("--steps-scorer", type=int, default=10000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-hyp", type=int, default=16)
    ap.add_argument("--input-size", type=int, default=160)
    ap.add_argument("--lr-refiner", type=float, default=2e-4)
    ap.add_argument("--lr-scorer", type=float, default=5e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-faces", type=int, default=2048,
                    help="training render face budget (eval uses 4096; the "
                    "nets are resolution/face-count independent)")
    ap.add_argument("--chunk", type=int, default=25,
                    help="lax.scan steps per dispatch (remote-TPU link "
                    "amortization)")
    ap.add_argument("--cpu", action="store_true", help="force CPU (tests)")
    # resumable phases: the remote tunnel wedges stochastically on long
    # processes. With --resume, finished phases (refiner.npz / scorer.npz
    # present) are skipped and interrupted phases continue from the
    # periodic resume snapshot. Outer retry loop:
    #   for i in $(seq 8); do timeout 1500 python scripts/train_agnostic.py \
    #       --resume --out weights/agnostic && break; done
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s] %(message)s")
    # persistent compile cache (slow 2-CPU host)
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from foundationpose_tpu.models import agnostic

    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]])

    t0 = time.time()
    print(f"[train_agnostic] preparing {args.n_meshes}-mesh corpus",
          file=sys.stderr, flush=True)
    prepped = agnostic.prepare_corpus(
        args.n_meshes, seed=args.corpus_seed, max_faces=args.max_faces
    )
    n_tex = sum(p["textured"] for p in prepped)
    print(f"[train_agnostic] corpus ready ({n_tex} textured) "
          f"+{time.time()-t0:.0f}s; training refiner", file=sys.stderr,
          flush=True)

    def cb(tag):
        def f(step, loss):
            print(f"[train_agnostic +{time.time()-t0:.0f}s] {tag} "
                  f"step {step} loss {loss:.4f}", file=sys.stderr, flush=True)
        return f

    import numpy as _np

    os.makedirs(args.out, exist_ok=True)
    ref_path = os.path.join(args.out, "refiner.npz")
    sco_path = os.path.join(args.out, "scorer.npz")
    stats_path = os.path.join(args.out, "train_stats.json")
    stats = (json.load(open(stats_path))
             if args.resume and os.path.exists(stats_path) else {})

    if args.resume and os.path.exists(ref_path) and "refiner" in stats:
        print("[train_agnostic] refiner phase already done; skipping",
              file=sys.stderr, flush=True)
        from foundationpose_tpu.models.refine_net import RefineNet
        import jax.numpy as jnp

        net_r = RefineNet(c_in=6, dtype=jnp.float32)
        dummy = jnp.zeros((1, args.input_size, args.input_size, 6))
        import jax as _jax

        params_r = agnostic.load_params_npz(
            ref_path, net_r.init(_jax.random.PRNGKey(0), dummy, dummy)
        )
    else:
        _, params_r, stats_r = agnostic.train_agnostic_refiner(
            prepped, K, steps=args.steps_refiner, batch=args.batch,
            input_size=args.input_size, lr=args.lr_refiner, seed=args.seed,
            chunk=args.chunk, log_cb=cb("refiner"),
            resume_path=os.path.join(args.out, "resume_refiner.npz"),
        )
        agnostic.save_params_npz(ref_path, params_r, dtype=_np.float16)
        stats["refiner"] = stats_r
        json.dump(stats, open(stats_path, "w"))
        print(f"[train_agnostic] refiner done {stats_r}; training scorer",
              file=sys.stderr, flush=True)

    _, params_s, stats_s = agnostic.train_agnostic_scorer(
        prepped, K, steps=args.steps_scorer, n_hyp=args.n_hyp,
        input_size=args.input_size, lr=args.lr_scorer, seed=args.seed,
        chunk=args.chunk, log_cb=cb("scorer"),
        resume_path=os.path.join(args.out, "resume_scorer.npz"),
    )
    agnostic.save_params_npz(sco_path, params_s, dtype=_np.float16)
    stats["scorer"] = stats_s
    json.dump(stats, open(stats_path, "w"))
    meta = {
        "input_size": args.input_size,
        "n_meshes": args.n_meshes,
        "corpus_seed": args.corpus_seed,
        "refiner": stats.get("refiner"),
        "scorer": stats_s,
        "K_train": K.tolist(),
        "note": "one net pair for every object (object-agnostic); "
                "corpus meshes are random primitives/compounds held out "
                "from the evaluation suite",
    }
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
