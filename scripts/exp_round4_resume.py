"""Round-4 batch resume: the TPU worker crashed at the start of
c5_headline's refine phase (after the 27.47 polished scene was saved).
Resume the remaining items in one process:

  * chip_probe — a tiny program to absorb the post-crash recovery wait;
  * c5_headline_refine — stack the gated refine/polish alternation on the
    saved runs/c5_headline/scene_c5.json via --from-scene (no retrain);
  * dist_overhead — re-measure with the min-over-3-warm-reps estimator;
  * refine_bias_ab + bench_guards — from exp_round4_batch.

Usage: same env as exp_round4_batch.py; names optional.
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


def chip_probe():
    import jax.numpy as jnp
    import numpy as np

    t0 = time.perf_counter()
    x = jnp.ones((256, 256)) @ jnp.ones((256, 256))
    print(f"chip probe: sum={float(np.asarray(x).sum()):.0f} "
          f"in {time.perf_counter() - t0:.1f}s", flush=True)


def c5_headline_refine():
    import run_c5

    args = [a for a in b.C5_FR10]
    run_c5.main(args + [
        "--out", "runs/c5_headline",
        "--from-scene", "runs/c5_headline/scene_c5.json",
        "--polish", "0", "--refine", "2", "--alternate", "2"])


def main(argv=None):
    names = (argv if argv is not None else sys.argv[1:]) or [
        "chip_probe", "c5_headline_refine", "dist_overhead",
        "refine_bias_ab", "bench_guards"]
    for name in names:
        print(f"\n##### round-4 resume {name}", flush=True)
        t0 = time.perf_counter()
        try:
            fn = globals().get(name) or getattr(b, name)
            fn()
        except Exception:
            traceback.print_exc()
            print(f"##### round-4 resume {name} FAILED", flush=True)
        print(f"##### round-4 resume {name} done in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
