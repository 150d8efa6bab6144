"""Run several large-scene experiments in ONE python process.

On this environment a fresh process pays ~8 minutes of tunneled-chip
attach latency before its first TPU program runs; chaining experiments
through one process pays it once (and shares warm jit caches between
experiments with equal shapes).

Each experiment is a run_c5.py argv (the runner is shape-generic: config-4
is just --views 30 --size 512 --gt-n 400 --init-n 5120). Failures are
isolated per experiment.

Usage:
  env JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache_tpu \
      PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/exp_round2_batch.py [names...]   # default: all
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache_tpu")

EXPERIMENTS = {
    # Config-5: single-stage 3000-step control (is multi-stage density
    # control doing anything beyond just-more-steps?).
    "c5_long": ["--out", "runs/c5_r2_long", "--data", "runs/c5/data",
                "--skip-ceiling", "--steps", "3000"],
    # Config-5: coarser merge cell (stacks spread ~±2·jitter=0.04, so a
    # 0.04 cell splits a stack across up to 8 cells; 0.08 collapses it).
    "c5_merge8": ["--out", "runs/c5_r2_m8", "--data", "runs/c5/data",
                  "--skip-ceiling", "--stages", "3", "--merge-cell", "0.08",
                  "--steps", "1000"],
    # Config-4 at its stated shape, round-2 recipe, multi-stage + merge.
    "c4_multi": ["--out", "runs/c4_r2", "--views", "30", "--size", "512",
                 "--gt-n", "400", "--init-n", "5120",
                 "--cull-budget", "2048", "--stages", "3",
                 "--merge-cell", "0.04", "--steps", "1000"],
    # Config-4 single-stage control: round-2 sampling/eval fixes alone.
    "c4_single": ["--out", "runs/c4_r2_single", "--data", "runs/c4_r2/data",
                  "--skip-ceiling", "--views", "30", "--size", "512",
                  "--gt-n", "400", "--init-n", "5120",
                  "--cull-budget", "2048", "--stages", "1",
                  "--steps", "1000"],
    # Deeper schedules + greedy polish on the winning merge recipe.
    "c5_deep": ["--out", "runs/c5_r2e", "--data", "runs/c5/data",
                "--skip-ceiling", "--stages", "5", "--merge-cell", "0.04",
                "--steps", "1000", "--polish", "2"],
    "c4_deep": ["--out", "runs/c4_r2d", "--data", "runs/c4_r2/data",
                "--skip-ceiling", "--views", "30", "--size", "512",
                "--gt-n", "400", "--init-n", "5120",
                "--cull-budget", "2048", "--stages", "5",
                "--merge-cell", "0.04", "--steps", "1000", "--polish", "2"],
    # Adaptive-coverage A/B at scale (vs c5_r2c's 25.93 / c4_r2's 26.10).
    # At mask-sharp 60 the 1-px floor sits BELOW the 1/60 world-space
    # floor at these scene depths, so c5_px/c4_px are *floor-inactive*
    # consistency checks — measured: c5_px reproduces the fixed-mask run
    # bit-identically (25.928929622808745 dB), validating the plumbing.
    "c5_px": ["--out", "runs/c5_px", "--data", "runs/c5/data",
              "--skip-ceiling", "--stages", "3", "--merge-cell", "0.04",
              "--steps", "1000", "--mask-px", "1.0"],
    # The ACTIVE A/B: world-space cap raised 4x; the px floor then
    # dominates at t > ~1.2 and keeps far silhouettes ~1 px soft.
    "c5_px_sharp": ["--out", "runs/c5_px_sharp", "--data", "runs/c5/data",
                    "--skip-ceiling", "--stages", "3",
                    "--merge-cell", "0.04", "--steps", "1000",
                    "--mask-px", "1.0", "--mask-sharp", "240"],
    "c4_px": ["--out", "runs/c4_px", "--data", "runs/c4_r2/data",
              "--skip-ceiling", "--views", "30", "--size", "512",
              "--gt-n", "400", "--init-n", "5120",
              "--cull-budget", "2048", "--stages", "3",
              "--merge-cell", "0.04", "--steps", "1000",
              "--mask-px", "1.0"],
}


def main(argv=None):
    names = (argv if argv is not None else sys.argv[1:]) or \
        list(EXPERIMENTS)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import run_c5

    for name in names:
        args = EXPERIMENTS[name]
        print(f"\n##### experiment {name}: {' '.join(args)}", flush=True)
        t0 = time.perf_counter()
        try:
            run_c5.main(args)
        except Exception:
            traceback.print_exc()
            print(f"##### experiment {name} FAILED", flush=True)
        print(f"##### experiment {name} done in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
