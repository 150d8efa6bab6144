"""Round-5 perf batch (one process): VERDICT r4 items 2 and 3.

  * rep_step — the M=51,200 culled+fused warm step with the chunk-frozen
    repulsion prep (train/loss.RepulsionStatic), member + monopole far
    fields, vs the committed 7.61 / 6.94 ms (docs/PARITY.md). Target:
    monopole ≤ ~6.0 ms;
  * large_baseline — re-commit BENCH_LARGE.json from the measured step
    (the bench guard's tripwire follows the improvement);
  * dist_overhead_auto — config-1 single (auto spc=100) vs sharded
    (auto spc=350, the new out-of-the-box default) overhead, plus a
    sharded spc=100 arm for the PSNR-identity check (same chunk
    boundaries → same RNG stream as the single driver);
  * bench_guards — full bench.py with both regression guards armed.

Usage:
  env JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache_tpu \
      PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/exp_round5_perf.py [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache_tpu")

import exp_round4_batch as b
from exp_round4_resume import chip_probe  # noqa: F401

OUT = "runs/r5_hw"


def _save(name, payload):
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, f"{name}.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(f"{name}: {json.dumps(payload)}", flush=True)


def rep_step(steps=50, reps=3):
    """Large-scene warm step with the static repulsion tables, both
    far-field modes, K=256 (the docs/PARITY.md large-scene shape)."""
    import bench_large as bl

    from burn_raymarching_tpu.config import LossConfig, TrainConfig

    out = {"committed_ms": {"member": 7.61, "monopole": 6.94}}
    ds = bl.make_dataset(10 * 256 * 256)
    padded, mask = bl.make_params(51200)
    for ff in ("monopole", "member"):
        cfg = TrainConfig(
            loss=LossConfig(repulsion_far_field=ff),
            batch_size=16384, use_culling=True, cull_budget=256,
            cull_tile=512, cull_hierarchical=True, cull_cluster_group=64,
            cull_cluster_budget=32, cluster_repulsion=True,
            weight_decay_mode="decoupled", warm_start=True, warm_steps=16,
            steps_per_call=steps, checkpoint_dir=None)
        best, rays, _ = bl.bench_variant(cfg, ds, padded, mask, "warm",
                                         steps, reps)
        out[ff] = {"ms_per_step": round(best * 1e3, 3),
                   "mrays_per_s": round(rays / 1e6, 3)}
        _save("rep_step", out)


def large_baseline():
    import bench

    bench.write_large_baseline()


def dist_overhead_auto(reps=3):
    """Config-1: single (auto 100) vs sharded auto (350) vs sharded
    spc=100 (PSNR-identity arm). Warm walls are min over reps-1."""
    import numpy as np

    from burn_raymarching_tpu.data.image_io import load_image_as_array
    from burn_raymarching_tpu.data.scene_io import load_cameras
    from burn_raymarching_tpu.parallel.distributed import DistributedTrainer
    from burn_raymarching_tpu.train.loop import Trainer, build_dataset

    reps = max(int(reps), 2)
    out = {}
    arms = [
        ("single_auto", dict(), "single"),
        ("sharded_auto", dict(), "sharded"),
        ("sharded_spc100", dict(steps_per_call=100), "sharded"),
    ]
    for name, cfg_kw, kind in arms:
        cfg = b._config1(**cfg_kw)
        cams = load_cameras(cfg.cameras_json)
        tgts = [load_image_as_array(c["file"]) for c in cams]
        ds = build_dataset(cfg)
        walls = []
        psnr = n = chunk = None
        for rep in range(reps):
            if kind == "single":
                tr = Trainer(cfg, ds, log=lambda s: None)
            else:
                tr = DistributedTrainer(cfg, ds, data=1, model=1,
                                        log=lambda s: None)
            chunk = tr._chunk
            t0 = time.perf_counter()
            padded, mask = tr.run()
            walls.append(round(time.perf_counter() - t0, 1))
            psnr = round(b._eval_cfg1(tr, cfg, padded, mask, cams, tgts), 2)
            n = int(np.asarray(mask).sum())
        out[name] = {"psnr": psnr, "final_n": n, "steps_per_call": chunk,
                     "wall_cold_s": walls[0], "walls_warm_s": walls[1:],
                     "wall_warm_s": min(walls[1:])}
        _save("dist_overhead_auto", out)
    out["overhead_auto"] = round(
        out["sharded_auto"]["wall_warm_s"]
        / out["single_auto"]["wall_warm_s"] - 1, 4)
    out["psnr_identity_spc100"] = (
        out["sharded_spc100"]["psnr"] == out["single_auto"]["psnr"])
    out["round4"] = {"spc100_overhead": 0.130, "spc350_overhead": 0.049}
    _save("dist_overhead_auto", out)


def bench_guards():
    b.bench_guards()


def main(argv=None):
    names = (argv if argv is not None else sys.argv[1:]) or [
        "chip_probe", "rep_step", "large_baseline", "dist_overhead_auto",
        "bench_guards"]
    for name in names:
        print(f"\n##### round-5 perf {name}", flush=True)
        t0 = time.perf_counter()
        try:
            fn = globals().get(name) or getattr(b, name)
            fn()
        except Exception:
            traceback.print_exc()
            print(f"##### round-5 perf {name} FAILED", flush=True)
        print(f"##### round-5 perf {name} done in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
