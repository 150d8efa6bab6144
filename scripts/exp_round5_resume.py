"""Round-5 resume queue (fresh process after the stack4 worker hang).

The c5_stack4 phase-2 proposal program hung the tunneled TPU client
(zero CPU, no progress for 40+ min — the r4-documented worker-crash
mode; the identical program shape ran three full rounds before it, so
this is the nondeterministic worker fault, not a shape fault). Killing
the exact client PID and re-attaching fresh is the proven recovery.

Re-prioritized queue — bank the perf measurements (VERDICT r4 items
2-3) before spending more wall on the quality stacking, which has
already beaten its bar (c5 28.51 >= 28.4):

  1. perf: rep_step + large_baseline + dist_overhead_auto
  2. c5_stack_b — continue stacking from c5_stack3 (28.51)
  3. c4_stack — stacked rounds from c4_headline (28.39)
  4. c5_metropolis — annealed-acceptance A/B vs c5_stack1
  5. decomp, prior_ab (reduced), c4_guard_ab (reduced)
  6. bench_guards last (fresh BENCH_LARGE baseline armed)

Usage:
  env JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache_tpu \
      PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/exp_round5_resume.py [names...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache_tpu")

import exp_round5_batch as q
import exp_round5_perf as p
from exp_round4_resume import chip_probe  # noqa: F401


def c5_stack_b():
    """Continue the c5 stack from round 3's scene (28.51) under a new
    tag (the crashed round-4 attempt left no scene)."""
    q._stack("c5_stack_b", q.b.C5_FR10, "runs/c5_stack3/scene_c5.json",
             max_rounds=2, seed0=110)


def prior_ab():
    q.prior_ab(steps=300, stages=3)


def c4_guard_ab():
    q.c4_guard_ab(steps=400, seeds=(0,))


def main(argv=None):
    names = (argv if argv is not None else sys.argv[1:]) or [
        "chip_probe", "rep_step", "large_baseline", "dist_overhead_auto",
        "c5_stack_b", "c4_stack", "c5_metropolis", "decomp",
        "prior_ab", "c4_guard_ab", "bench_guards"]
    for name in names:
        print(f"\n##### round-5 resume {name} "
              f"[{time.strftime('%H:%M:%S')}]", flush=True)
        t0 = time.perf_counter()
        try:
            fn = (globals().get(name) or getattr(p, name, None)
                  or getattr(q, name))
            fn()
        except Exception:
            traceback.print_exc()
            print(f"##### round-5 resume {name} FAILED", flush=True)
        print(f"##### round-5 resume {name} done in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
