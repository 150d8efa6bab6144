"""Round-4 final TPU sequence (fresh process after the c5-refine device
fault): dist_overhead re-measure (min over 3 warm reps), the c5 headline
refine at the round-3-proven cull_budget=2048 shape (the budget-4096
proposal program faults the tunneled TPU worker even at chunk=32 — see
train/refine.py docstring), and the c4 refine-bias A/B.
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

import exp_round4_batch as b
from exp_round4_resume import chip_probe


def c5_headline_refine_b2048():
    import run_c5

    args = [a for a in b.C5_FR10]
    run_c5.main(args + [
        "--out", "runs/c5_headline",
        "--from-scene", "runs/c5_headline/scene_c5.json",
        "--cull-budget", "2048",
        "--polish", "0", "--refine", "1", "--alternate", "0"])


def main(argv=None):
    names = (argv if argv is not None else sys.argv[1:]) or [
        "chip_probe", "dist_overhead", "c5_headline_refine_b2048",
        "refine_bias_ab"]
    for name in names:
        print(f"\n##### round-4 final {name}", flush=True)
        t0 = time.perf_counter()
        try:
            fn = globals().get(name) or getattr(b, name)
            fn()
        except Exception:
            traceback.print_exc()
            print(f"##### round-4 final {name} FAILED", flush=True)
        print(f"##### round-4 final {name} done in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
