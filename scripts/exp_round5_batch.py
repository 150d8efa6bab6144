"""Round-5 hardware batch in ONE python process (attach latency paid once).

Covers VERDICT r4 "next round" items 1/4/6/7 (the quality arms; the perf
items 2/3 run in scripts/exp_round5_perf.py after the repulsion-prep and
steps_per_call code lands):

  * c5_stack / c4_stack — exhaust the gated-refine lever: stacked
    --from-scene rounds with the round-5 widened proposal families
    (joint color logits, light/ambient micro-search, band-weighted
    acceptance, residual bias, finer 4-phase anneal) until two
    consecutive rounds gain < 0.05 dB (item 1);
  * c5_metropolis — annealed Metropolis acceptance vs greedy, SAME
    start scene / seed / proposal budget as c5_stack round 1 (item 6);
  * decomp — error decomposition before/after on the stacked scenes
    (item 1's Done bar);
  * prior_ab — sparse (2k points, ~25-deep stacks) vs dense
    (init_n-point) SfM prior at a reduced c5 schedule (item 7);
  * c4_guard_ab — stage guard on/off at the c4 recipe, reduced
    schedule, 2 seeds (item 4).

Per-experiment try/except: a TPU worker crash kills only this process's
later device_puts, so order matters — run the headline stacks first.

Usage:
  env JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache_tpu \
      PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/exp_round5_batch.py [names...]   # default: all
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
from exp_round4_resume import chip_probe  # noqa: F401  (queue entry)

OUT = "runs/r5_hw"

# The widened refine family for stacked rounds on an already-refined
# scene: finer 4-phase anneal (r4 acceptance concentrated at the finest
# sigma), joint color proposals, light micro-search, band-weighted
# acceptance (the ±2 px fringe carries 74% of residual error).
STACK_REFINE = ["--polish", "0", "--refine", "1", "--alternate", "0",
                "--refine-proposals", "768", "--refine-phases", "4",
                "--refine-bias", "residual",
                "--refine-sigma-c", "0.2", "--refine-sigma-r", "0.1",
                "--refine-colors", "0.25", "--refine-light", "64",
                "--refine-fringe", "4"]


def _save(name, payload):
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, f"{name}.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(f"{name}: {json.dumps(payload)}", flush=True)


def _result(run):
    path = os.path.join(run, "results.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _stack(tag, base_args, start_scene, max_rounds=4, seed0=100):
    """Run gated widened-refine rounds, each --from-scene the previous
    round's export, until two consecutive rounds gain < 0.05 dB."""
    import run_c5

    prev = start_scene
    record = {"start_scene": start_scene, "rounds": []}
    for i in range(1, max_rounds + 1):
        out = f"runs/{tag}{i}"
        run_c5.main(list(base_args) + STACK_REFINE + [
            "--out", out, "--from-scene", prev,
            "--seed", str(seed0 + i)])
        r = _result(out)
        gain = r["trained"] - r["init"]
        record["rounds"].append({"out": out, "init": r["init"],
                                 "trained": r["trained"],
                                 "gain_db": round(gain, 3),
                                 "wall_s": r["train_wall_s"]})
        _save(f"{tag}_record", record)
        prev = os.path.join(out, "scene_c5.json")
        gains = [rr["gain_db"] for rr in record["rounds"]]
        if len(gains) >= 2 and gains[-1] < 0.05 and gains[-2] < 0.05:
            record["saturated"] = True
            _save(f"{tag}_record", record)
            print(f"{tag}: saturated after {i} rounds", flush=True)
            break
    return record


def c5_stack():
    _stack("c5_stack", b.C5_FR10, "runs/c5_headline2/scene_c5.json",
           max_rounds=4)


def c4_stack():
    _stack("c4_stack", b.C4_HD, "runs/c4_headline/scene_c5.json",
           max_rounds=3)


def c5_metropolis():
    """Annealed-acceptance A/B: same start / seed / budget as c5_stack
    round 1, plus --refine-temp 0.3 (VERDICT r4 item 6)."""
    import run_c5

    run_c5.main(list(b.C5_FR10) + STACK_REFINE + [
        "--out", "runs/c5_stack1m",
        "--from-scene", "runs/c5_headline2/scene_c5.json",
        "--seed", "101", "--refine-temp", "0.3"])
    greedy = _result("runs/c5_stack1")
    metro = _result("runs/c5_stack1m")
    _save("metropolis_ab", {
        "greedy": None if not greedy else
        {"init": greedy["init"], "trained": greedy["trained"]},
        "metropolis": {"init": metro["init"], "trained": metro["trained"]},
    })


def decomp():
    """Error decomposition on the final stacked scenes (+ the committed
    baselines for before/after)."""
    import diag_error_decomp

    def last_with_scene(tag, n):
        for i in range(n, 0, -1):
            d = f"runs/{tag}{i}"
            if os.path.exists(os.path.join(d, "scene_c5.json")):
                return d
        return None

    c4 = last_with_scene("c4_stack", 3)
    if c4:
        diag_error_decomp.main(["--run", c4, "--data", "runs/c4_r2/data"])
    c5 = last_with_scene("c5_stack", 4)
    if c5:
        diag_error_decomp.main(["--run", c5, "--data", "runs/c5/data",
                                "--size", "256", "--views", "10"])


def prior_ab(steps=400, stages=3):
    """Sparse (2k-point, ~25-deep stacked) vs dense (init_n-point) SfM
    prior at a reduced c5 schedule — the init density lever (item 7)."""
    import run_c5

    common = ["--data", "runs/c5/data", "--skip-ceiling",
              "--stages", str(stages), "--steps", str(steps),
              "--merge-cell", "0.04", "--coverage", "gaussian",
              "--mask-sharp", "40",
              "--coverage-stages", "sigmoid,gaussian",
              "--fringe-weight", "10"]
    out = {}
    for prior in ("points", "dense"):
        run_c5.main(common + ["--prior", prior,
                              "--out", f"runs/c5_prior_{prior}"])
        r = _result(f"runs/c5_prior_{prior}")
        out[prior] = {"init": r["init"], "trained": r["trained"],
                      "n_final": r["n_final"], "wall_s": r["train_wall_s"]}
    _save("prior_ab", out)


def c4_guard_ab(steps=500, seeds=(0, 1)):
    """Stage guard on/off at the c4 recipe shape (reduced schedule):
    does the guard fire at scale, and what does it cost when it doesn't
    (VERDICT r4 item 4)? Uses the c4 data/init/recipe minus the greedy
    post-composition (the guard only acts during staged training)."""
    import numpy as np

    from burn_raymarching_tpu.config import (
        DensityConfig, LossConfig, RenderConfig, TrainConfig,
    )
    from burn_raymarching_tpu.data.image_io import load_image_as_array
    from burn_raymarching_tpu.data.scene_io import load_cameras
    from burn_raymarching_tpu.train.evaluate import evaluate_views
    from burn_raymarching_tpu.train.loop import Trainer, build_dataset

    data = "runs/c4_r2/data"
    cams = load_cameras(os.path.join(data, "cameras.json"))
    tgts = [load_image_as_array(c["file"]) for c in cams]
    out = {}
    for guard in (False, True):
        for seed in seeds:
            cfg = TrainConfig(
                batch_size=16384, width=512, height=512,
                stages=5, steps_per_stage=steps, base_lr=0.02, seed=seed,
                init_n=5120, init_layout="cloud",
                init_points=os.path.join(data, "points.json"),
                warm_start=True, use_fused_shade=True,
                use_culling=True, cull_budget=2048,
                dataset_order="morton", sample_mode="tile",
                cluster_repulsion=True, init_points_jitter=0.02,
                weight_decay_mode="decoupled",
                min_smooth_k=128.0, max_smooth_k=128.0,
                lr_scale_centers=0.001, lr_scale_radii=0.1,
                lr_scale_light=0.5,
                coverage_mode_stages=("sigmoid", "gaussian"),
                stage_guard=guard, stage_guard_views=6,
                render=RenderConfig(softmax_sharpness=40.0,
                                    mask_sharpness=40.0,
                                    coverage_mode="gaussian"),
                loss=LossConfig(),
                density=DensityConfig(merge_cell=0.04),
                cameras_json=os.path.join(data, "cameras.json"),
                checkpoint_dir=None,
                scene_json=os.path.join(OUT, "scene_tmp.json"),
                steps_dir=os.path.join(OUT, "steps_tmp"))
            ds = build_dataset(cfg)
            tr = Trainer(cfg, ds, log=lambda s: None)
            t0 = time.perf_counter()
            padded, mask = tr.run()
            wall = round(time.perf_counter() - t0, 1)
            psnr = evaluate_views(
                padded, cams, tgts, cfg.width, cfg.height, mask=mask,
                smooth_k=cfg.max_smooth_k, march_fn=tr.march_fn,
                march_normal_fn=tr.march_normal_fn,
                softmax_sharpness=40.0, mask_sharpness=40.0,
                coverage_mode="gaussian",
                cull=tr._cull_render())["mean"]
            out[f"guard{int(guard)}_seed{seed}"] = {
                "psnr": round(float(psnr), 2), "wall_s": wall,
                "n_final": int(np.asarray(mask).sum()),
                "guard_retries": tr.guard_retry_count,
                "guard_boundary_redos": tr.guard_boundary_redo_count}
            _save("c4_guard_ab", out)


def main(argv=None):
    names = (argv if argv is not None else sys.argv[1:]) or [
        "chip_probe", "c5_stack", "c5_metropolis", "c4_stack",
        "decomp", "prior_ab", "c4_guard_ab"]
    for name in names:
        print(f"\n##### round-5 {name}", flush=True)
        t0 = time.perf_counter()
        try:
            fn = globals().get(name) or getattr(b, name)
            fn()
        except Exception:
            traceback.print_exc()
            print(f"##### round-5 {name} FAILED", flush=True)
        print(f"##### round-5 {name} done in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
