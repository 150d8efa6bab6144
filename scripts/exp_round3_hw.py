"""Round-3 hardware/driver measurements in ONE python process.

Covers VERDICT r2 items 3, 4, 6:
  * dist_parity  — DistributedTrainer on a REAL-chip (data=1, model=1)
    mesh running the config-1 exact recipe, vs the single-chip Trainer:
    PSNR parity + wall/step overhead (the sharded driver had only ever run
    on virtual CPU meshes).
  * model_gap    — the model-sharded fused-kernel gap: each pod device of
    an 8-way M-sharded config-5 owns M/8 ≈ 6.4k primitives and must run
    the XLA-twin culled march + XLA repulsion (the fused kernels are
    single-device-table only). Measure both step times at that per-shard
    shape on the real chip so the multi-host step cost is a measurement.
  * exact_polish — greedy polish on the best exact-mode seed (34.60), and
    a 10-seed TURBO distribution to test the "cold prefill regularizes the
    trajectory" variance hypothesis against exact mode's sigma = 1.65.

Usage:
  env JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache_tpu \
      PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/exp_round3_hw.py [dist_parity model_gap exact_polish ...]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache_tpu")

OUT = "runs/r3_hw"


def _save(name, payload):
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"{name}.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"{name}: {json.dumps(payload)}", flush=True)


def _config1(seed=0):
    from burn_raymarching_tpu.config import TrainConfig

    return TrainConfig(cameras_json="/root/reference/data/cameras.json",
                       checkpoint_dir=None, seed=seed,
                       steps_dir=os.path.join(OUT, "steps_tmp"),
                       scene_json=os.path.join(OUT, "scene_tmp.json"))


def _eval(tr, cfg, padded, mask, cams, tgts):
    from burn_raymarching_tpu.train.evaluate import evaluate_views

    return evaluate_views(padded, cams, tgts, cfg.width, cfg.height,
                          mask=mask, smooth_k=cfg.max_smooth_k,
                          march_fn=tr.march_fn,
                          march_normal_fn=tr.march_normal_fn)["mean"]


def dist_parity():
    """Config-1 exact recipe: Trainer vs DistributedTrainer((1,1) mesh) on
    the real chip — PSNR parity and wall overhead."""
    from burn_raymarching_tpu.data.image_io import load_image_as_array
    from burn_raymarching_tpu.data.scene_io import load_cameras
    from burn_raymarching_tpu.parallel.distributed import DistributedTrainer
    from burn_raymarching_tpu.train.loop import Trainer, build_dataset

    cfg = _config1()
    cams = load_cameras(cfg.cameras_json)
    tgts = [load_image_as_array(c["file"]) for c in cams]
    ds = build_dataset(cfg)
    out = {}
    for name, mk in [("single", lambda: Trainer(cfg, ds,
                                                log=lambda s: None)),
                     ("sharded_1x1", lambda: DistributedTrainer(
                         cfg, ds, data=1, model=1, log=lambda s: None))]:
        tr = mk()
        t0 = time.perf_counter()
        padded, mask = tr.run()
        wall = time.perf_counter() - t0
        # Warm re-run for the steady-state number (first run pays jit).
        tr2 = mk()
        t0 = time.perf_counter()
        padded, mask = tr2.run()
        wall_warm = time.perf_counter() - t0
        psnr = _eval(tr2, cfg, padded, mask, cams, tgts)
        import numpy as np

        out[name] = {"psnr": round(psnr, 2),
                     "final_n": int(np.asarray(mask).sum()),
                     "wall_cold_s": round(wall, 1),
                     "wall_warm_s": round(wall_warm, 1)}
    out["overhead_warm"] = round(
        out["sharded_1x1"]["wall_warm_s"] / out["single"]["wall_warm_s"] - 1,
        4)
    _save("dist_parity", out)


def model_gap(m=6400, steps=100, budget=1024, data_dir="runs/c5/data",
              size=256, batch=16384):
    """Per-shard-M step cost: fused kernels vs the XLA twins the M-sharded
    path must use, at the 51,200/8 = 6,400 per-device table size, on the
    c5 dataset (100-view 256^2, Morton tile batches, warm start, cluster
    repulsion) — the single-device proxy for one pod device's work."""
    import jax
    import numpy as np

    from burn_raymarching_tpu.config import RenderConfig, TrainConfig
    from burn_raymarching_tpu.models.scene import init_scene_params_cloud
    from burn_raymarching_tpu.train.loop import Trainer, build_dataset

    cfg = TrainConfig(
        batch_size=batch, width=size, height=size,
        stages=1, steps_per_stage=steps, steps_per_call=steps,
        base_lr=0.02, init_n=m, init_layout="cloud",
        init_points=os.path.join(data_dir, "points.json"),
        warm_start=True, use_fused_shade=True,
        use_culling=True, cull_budget=budget,
        dataset_order="morton", sample_mode="tile",
        cluster_repulsion=True, weight_decay_mode="decoupled",
        min_smooth_k=128.0, max_smooth_k=128.0,
        lr_scale_centers=0.001, lr_scale_radii=0.1, lr_scale_light=0.5,
        render=RenderConfig(softmax_sharpness=40.0, mask_sharpness=60.0),
        cameras_json=os.path.join(data_dir, "cameras.json"),
        checkpoint_dir=None)
    ds = build_dataset(cfg)
    pts = np.asarray(json.load(open(cfg.init_points))["points"],
                     np.float32).reshape(-1, 3)
    out = {"m": m, "budget": budget, "steps": steps}
    for name in ("fused", "xla_twin"):
        import jax.numpy as jnp

        from burn_raymarching_tpu.models.scene import pad_params
        from burn_raymarching_tpu.train.optimizer import anneal_for_step

        tr = Trainer(cfg, ds, log=lambda s: None)
        if name == "xla_twin":
            # What each model-shard device runs: XLA culled march + XLA
            # cluster repulsion (single-device fused kernels unavailable).
            tr.culled_march_normal_fn = None
            tr.repulsion_fn = None
            tr._step_fn = tr._build_step()
        params = init_scene_params_cloud(
            m, seed=0, radius=cfg.init_cloud_radius,
            points=pts, jitter=cfg.init_points_jitter)
        # run_stage's setup by hand so the timed region is ONLY the
        # scan-chunked step program (prefill dominates a 100-step stage).
        padded, mask = pad_params(params, tr._bucket(params.n))
        opt_state = tr.tx.init(padded)
        tr.prefill_t_cache(padded, mask, anneal_for_step(cfg, 0, 1)[1])
        cl_idx, cl_valid = tr._build_cluster_table(padded, mask)
        key = jax.random.PRNGKey(0)
        args_ = lambda: (padded, opt_state, key, mask, ds.packed,  # noqa
                         tr._sample_fg[0], tr._sample_fg[1], tr.t_cache,
                         jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                         cl_idx, cl_valid)
        r = tr._step_fn(*args_())
        np.asarray(r[3])                                     # compile+sync
        t0 = time.perf_counter()
        r = tr._step_fn(*args_())
        np.asarray(r[3])                                     # device sync
        wall = time.perf_counter() - t0
        out[name] = {"wall_s": round(wall, 2),
                     "ms_per_step": round(wall / steps * 1e3, 2)}
    out["xla_over_fused"] = round(
        out["xla_twin"]["ms_per_step"] / out["fused"]["ms_per_step"], 3)
    _save("model_gap", out)


def exact_polish(best_seed=4, rounds=3):
    """Greedy polish on the best exact-mode seed (VERDICT r2 item 6)."""
    from burn_raymarching_tpu.data.image_io import load_image_as_array
    from burn_raymarching_tpu.data.scene_io import load_cameras
    from burn_raymarching_tpu.train.loop import Trainer, build_dataset

    cfg = _config1(seed=best_seed)
    cams = load_cameras(cfg.cameras_json)
    tgts = [load_image_as_array(c["file"]) for c in cams]
    ds = build_dataset(cfg)
    tr = Trainer(cfg, ds, log=print)
    padded, mask = tr.run()
    base = _eval(tr, cfg, padded, mask, cams, tgts)
    padded, mask = tr.polish(padded, mask, rounds=rounds, cameras=cams,
                             targets=tgts, export=False)
    polished = _eval(tr, cfg, padded, mask, cams, tgts)
    _save("exact_polish", {"seed": best_seed, "rounds": rounds,
                           "exact": round(base, 2),
                           "polished": round(polished, 2)})


def turbo_seeds(n=10):
    """Turbo-mode seed distribution (prefill-regularization hypothesis):
    exact mode measured 31.6 +- 1.65 over seeds 0-9; if turbo's cold
    prefill + warm march regularizes the density-control trajectory its
    sigma should be materially smaller on the SAME seeds."""
    import numpy as np

    from burn_raymarching_tpu.data.image_io import load_image_as_array
    from burn_raymarching_tpu.data.scene_io import load_cameras
    from burn_raymarching_tpu.train.loop import Trainer, build_dataset

    cfg0 = _config1()
    cams = load_cameras(cfg0.cameras_json)
    tgts = [load_image_as_array(c["file"]) for c in cams]
    ds = build_dataset(cfg0)
    psnrs, final_n = [], []
    for seed in range(n):
        cfg = dataclasses.replace(_config1(seed=seed), warm_start=True,
                                  use_fused_shade=True)
        tr = Trainer(cfg, ds, log=lambda s: None)
        padded, mask = tr.run()
        p = _eval(tr, cfg, padded, mask, cams, tgts)
        psnrs.append(round(p, 2))
        final_n.append(int(np.asarray(mask).sum()))
        print(f"turbo seed {seed}: {p:.2f} dB N={final_n[-1]}", flush=True)
    arr = np.asarray(psnrs)
    _save("turbo_seeds", {
        "psnr": psnrs, "final_n": final_n,
        "mean": round(float(arr.mean()), 2),
        "std": round(float(arr.std()), 2),
        "min": float(arr.min()), "max": float(arr.max()),
        "exact_reference": {"mean": 31.6, "std": 1.65, "max": 34.6}})


def main(argv=None):
    names = (argv if argv is not None else sys.argv[1:]) or \
        ["dist_parity", "model_gap", "exact_polish", "turbo_seeds"]
    for name in names:
        print(f"\n##### hw experiment {name}", flush=True)
        t0 = time.perf_counter()
        try:
            globals()[name]()
        except Exception:
            traceback.print_exc()
            print(f"##### hw experiment {name} FAILED", flush=True)
        print(f"##### hw experiment {name} done in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
