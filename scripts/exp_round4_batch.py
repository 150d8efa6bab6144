"""Round-4 hardware batch in ONE python process (attach latency paid once).

Covers VERDICT r3 "next round" items 1-5:
  * bench_large_baseline — write BENCH_LARGE.json (the flagship M=51,200
    culled+fused warm step) so bench.py's new second guard has a
    committed tripwire (item 5);
  * dist_overhead — config-1 single vs (1,1)-mesh sharded wall, after
    moving the whole scan chunk (incl. Adam) inside shard_map: target
    <10% overhead vs round 3's +36% (item 3);
  * turbo_guard_seeds — the 10-seed turbo distribution with the in-run
    stage guard: target 10/10 >= 32.8 dB at ~1x run cost (item 2);
  * c4_ss4 / c4_ss2 / c4_pxa / c5_ss4 — the two pixel-footprint
    silhouette mechanisms A/B'd on the committed recipes (item 1:
    supersampled footprint-averaged forward; analytic pixel-area
    coverage stage);
  * c4_headline / c5_headline — winner of the A/B + --refine 2 (item 4's
    composition), the round-4 quality headline.

Usage:
  env JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache_tpu \
      PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/exp_round4_batch.py [names...]   # default: all
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache_tpu")

OUT = "runs/r4_hw"


def _save(name, payload):
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, f"{name}.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(f"{name}: {json.dumps(payload)}", flush=True)


# --------------------------------------------------------------------- #
# Infra measurements
# --------------------------------------------------------------------- #

def bench_large_baseline():
    import bench

    bench.write_large_baseline()


def _config1(seed=0, **kw):
    from burn_raymarching_tpu.config import TrainConfig

    return TrainConfig(cameras_json="/root/reference/data/cameras.json",
                       checkpoint_dir=None, seed=seed,
                       steps_dir=os.path.join(OUT, "steps_tmp"),
                       scene_json=os.path.join(OUT, "scene_tmp.json"), **kw)


def _eval_cfg1(tr, cfg, padded, mask, cams, tgts):
    from burn_raymarching_tpu.train.evaluate import evaluate_views

    return evaluate_views(padded, cams, tgts, cfg.width, cfg.height,
                          mask=mask, smooth_k=cfg.max_smooth_k,
                          march_fn=tr.march_fn,
                          march_normal_fn=tr.march_normal_fn)["mean"]


def dist_overhead(reps=4):
    """Config-1 exact recipe: Trainer vs DistributedTrainer((1,1)) after
    the optimizer moved inside shard_map. Round 3: 28.7 vs 39.0 s warm
    (+36%); target <10%. Warm walls are ~10 s, so single samples carry
    ~+-1 s (~10%) of host jitter — take the min over reps-1 warm runs."""
    import numpy as np

    from burn_raymarching_tpu.data.image_io import load_image_as_array
    from burn_raymarching_tpu.data.scene_io import load_cameras
    from burn_raymarching_tpu.parallel.distributed import DistributedTrainer
    from burn_raymarching_tpu.train.loop import Trainer, build_dataset

    # The warm-wall estimator needs at least one post-compile rep
    # (walls[1:] below): reps=1 would min() an empty list (ADVICE r4).
    reps = max(int(reps), 2)
    cfg = _config1()
    cams = load_cameras(cfg.cameras_json)
    tgts = [load_image_as_array(c["file"]) for c in cams]
    ds = build_dataset(cfg)
    out = {}
    for name, mk in [("single", lambda: Trainer(cfg, ds, log=lambda s: None)),
                     ("sharded_1x1",
                      lambda: DistributedTrainer(cfg, ds, data=1, model=1,
                                                 log=lambda s: None))]:
        walls = []
        psnr = n = None
        for rep in range(reps):       # rep 0 pays compile, rest are warm
            tr = mk()
            t0 = time.perf_counter()
            padded, mask = tr.run()
            walls.append(round(time.perf_counter() - t0, 1))
            psnr = round(_eval_cfg1(tr, cfg, padded, mask, cams, tgts), 2)
            n = int(np.asarray(mask).sum())
        out[name] = {"psnr": psnr, "final_n": n,
                     "wall_cold_s": walls[0], "walls_warm_s": walls[1:],
                     "wall_warm_s": min(walls[1:])}
    out["overhead_warm"] = round(
        out["sharded_1x1"]["wall_warm_s"] / out["single"]["wall_warm_s"] - 1,
        4)
    out["round3"] = {"single_warm_s": 28.7, "sharded_warm_s": 39.0,
                     "overhead": 0.3589}
    _save("dist_overhead", out)


def turbo_guard_seeds(n=10):
    """Turbo-mode seed distribution WITH the in-run stage guard
    (config.stage_guard). Round 3 unguarded: 8/10 in 32.82-33.05, seed 1
    at 31.92, seeds 8-9 collapsed to 29.61/24.15 (runs/r3_hw). Target:
    10/10 >= 32.8 at ~1x run cost."""
    import numpy as np

    from burn_raymarching_tpu.data.image_io import load_image_as_array
    from burn_raymarching_tpu.data.scene_io import load_cameras
    from burn_raymarching_tpu.train.loop import Trainer, build_dataset

    cfg0 = _config1()
    cams = load_cameras(cfg0.cameras_json)
    tgts = [load_image_as_array(c["file"]) for c in cams]
    ds = build_dataset(cfg0)
    psnrs, final_n, retries, walls = [], [], [], []
    for seed in range(n):
        cfg = _config1(seed=seed, warm_start=True, use_fused_shade=True,
                       stage_guard=True, stage_guard_retries=2)
        logs = []
        tr = Trainer(cfg, ds, log=logs.append)
        t0 = time.perf_counter()
        padded, mask = tr.run()
        walls.append(round(time.perf_counter() - t0, 1))
        p = _eval_cfg1(tr, cfg, padded, mask, cams, tgts)
        psnrs.append(round(p, 2))
        final_n.append(int(np.asarray(mask).sum()))
        retries.append(sum("!! stage guard" in l for l in logs))
        print(f"turbo+guard seed {seed}: {p:.2f} dB N={final_n[-1]} "
              f"retries={retries[-1]} wall={walls[-1]}s", flush=True)
        for l in logs:
            if "stage guard" in l:
                print(f"    {l}", flush=True)
    arr = np.asarray(psnrs)
    _save("turbo_guard_seeds", {
        "psnr": psnrs, "final_n": final_n, "retries": retries,
        "wall_s": walls,
        "mean": round(float(arr.mean()), 2),
        "std": round(float(arr.std()), 2),
        "min": float(arr.min()), "max": float(arr.max()),
        "n_ge_32_8": int((arr >= 32.8).sum()),
        "unguarded_r3": {"psnr": [32.82, 31.92, 32.83, 32.95, 33.05, 32.9,
                                  32.86, 32.95, 29.61, 24.15],
                         "mean": 31.6, "std": 2.68}})


def model_gap_kernel(steps=100, reps=3):
    """Single-chip proxy for the sharded union-table march (VERDICT r3
    item 6): the fused kernel at the shard-local shape [32 tiles, K=1024]
    vs the union shape one pod model-column marches after the all_to_all
    [4 tiles, K=8192] — equal FLOPs. If the union shape runs at the same
    rate, the sharded path recovers fused-kernel speed and the measured
    +10.8% XLA-twin gap closes up to (tiny) collective cost — the
    collectives themselves move ~2.6 MB of tables + 256 KB of results per
    step, ICI-negligible, but need a real pod to time."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from burn_raymarching_tpu.ops.pallas.culled_march_kernel import (
        culled_march_normals_pallas,
    )

    rng = np.random.default_rng(0)
    out = {"steps": steps}
    for name, b, k in (("local_b32_k1024", 32, 1024),
                       ("union_b4_k8192", 4, 8192)):
        rd = jnp.asarray(rng.normal(0, 1, (b, 512, 3)), jnp.float32)
        rd = rd / jnp.sqrt(jnp.sum(rd * rd, axis=2, keepdims=True))
        ro = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, -2.5], jnp.float32), rd.shape)
        cs = jnp.asarray(rng.uniform(-0.8, 0.8, (b, k, 3)), jnp.float32)
        rs = jnp.asarray(0.02 + 0.05 * rng.random((b, k)), jnp.float32)
        qs = jnp.sum(cs * cs, axis=2)

        @jax.jit
        def run(t0, cs=cs, rs=rs, qs=qs, ro=ro, rd=rd):
            def body(t, _):
                t, n = culled_march_normals_pallas(
                    ro, rd, cs, rs, qs, jnp.float32(128.0), num_steps=16,
                    t_init=t * 0.8)
                return t, jnp.sum(n)
            t, s = jax.lax.scan(body, t0, jnp.arange(steps))
            return s

        t0 = jnp.zeros((b, 512, 1), jnp.float32)
        np.asarray(run(t0))                            # compile
        best = float("inf")
        for _ in range(reps):
            tw = time.perf_counter()
            np.asarray(run(t0))
            best = min(best, (time.perf_counter() - tw) / steps)
        out[name] = {"ms_per_step": round(best * 1e3, 3)}
    out["union_over_local"] = round(
        out["union_b4_k8192"]["ms_per_step"]
        / out["local_b32_k1024"]["ms_per_step"], 3)
    out["r3_xla_over_fused"] = 1.108
    _save("model_gap_kernel", out)


# --------------------------------------------------------------------- #
# Silhouette-band mechanism A/Bs (run_c5-driven)
# --------------------------------------------------------------------- #

C4_HD = ["--views", "30", "--size", "512", "--gt-n", "400",
         "--init-n", "5120", "--cull-budget", "2048",
         "--data", "runs/c4_r2/data", "--skip-ceiling",
         "--stages", "5", "--merge-cell", "0.04", "--steps", "1000",
         "--polish", "2", "--coverage", "gaussian", "--mask-sharp", "40",
         "--coverage-stages", "sigmoid,gaussian"]
C5_FR10 = ["--data", "runs/c5/data", "--skip-ceiling",
           "--stages", "5", "--merge-cell", "0.04", "--steps", "1000",
           "--polish", "2", "--coverage", "gaussian", "--mask-sharp", "40",
           "--coverage-stages", "sigmoid,gaussian",
           "--fringe-weight", "10"]

EXPERIMENTS = {
    # Mechanism (c): footprint-averaged forward, annealed off. Baselines:
    # c4_hybrid_deep 27.62, c5_fringe10 27.47.
    "c4_ss4": C4_HD + ["--out", "runs/c4_ss4",
                       "--ss-stages", "1,4,4,4,1"],
    "c4_ss2": C4_HD + ["--out", "runs/c4_ss2",
                       "--ss-stages", "1,2,2,2,1"],
    # Mechanism (b): analytic pixel-area coverage for the middle stages
    # (sigmoid family, sharpness 600 so the pixel term binds:
    # w = max(1/600, 1*pixel_angle*t) ~ one pixel at any depth), then
    # back to the GT-matched Gaussian.
    "c4_pxa": C4_HD[:-2] + [
        "--out", "runs/c4_pxa",
        "--coverage-stages", "sigmoid,sigmoid,sigmoid,gaussian,gaussian",
        "--mask-sharp-stages", "40,600,600,40,40",
        "--mask-px-stages", "0,1,1,0,0"],
    "c5_ss4": C5_FR10 + ["--out", "runs/c5_ss4",
                         "--ss-stages", "1,4,4,4,1"],
}


def _result(run):
    path = os.path.join(run, "results.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def c4_headline():
    """Winner of the c4 mechanism A/B (vs the 27.62 baseline) + refine."""
    base = 27.62
    arms = {"runs/c4_ss4": EXPERIMENTS["c4_ss4"],
            "runs/c4_ss2": EXPERIMENTS["c4_ss2"],
            "runs/c4_pxa": EXPERIMENTS["c4_pxa"]}
    best_run, best_args, best_psnr = None, C4_HD, base
    for run, args in arms.items():
        r = _result(run)
        if r and r.get("trained", 0) > best_psnr:
            best_run, best_args, best_psnr = run, args, r["trained"]
    print(f"c4 headline: best arm {best_run or 'baseline'} "
          f"({best_psnr:.2f}) + refine", flush=True)
    import run_c5

    args = list(best_args)
    if "--out" in args:              # replace the arm's --out with ours
        i = args.index("--out")
        args = args[:i] + args[i + 2:]
    run_c5.main(args + ["--out", "runs/c4_headline", "--refine", "2",
                        "--alternate", "2"])


def c5_headline():
    base = 27.47
    r = _result("runs/c5_ss4")
    use_ss = bool(r and r.get("trained", 0) > base)
    args = list(EXPERIMENTS["c5_ss4"]) if use_ss else list(C5_FR10)
    if "--out" in args:
        i = args.index("--out")
        args = args[:i] + args[i + 2:]
    print(f"c5 headline: {'ss4' if use_ss else 'baseline'} + refine",
          flush=True)
    import run_c5

    run_c5.main(args + ["--out", "runs/c5_headline", "--refine", "2",
                        "--alternate", "2"])


def decomp_runs():
    """Error decomposition on the mechanism arm + headline scenes — the
    VERDICT item-1 'band share' evidence either way."""
    import diag_error_decomp

    for run in ("runs/c4_ss4", "runs/c4_pxa", "runs/c4_headline",
                "runs/c4_headline2"):
        if os.path.exists(os.path.join(run, "scene_c5.json")):
            print(f"--- decomp {run}", flush=True)
            diag_error_decomp.main(["--run", run,
                                    "--data", "runs/c4_r2/data"])


def refine_bias_ab():
    """Uniform vs residual-biased refine proposals, same budget, on the
    committed headline scene (A/B for --refine-bias residual)."""
    import exp_geom_jiggle

    run = ("runs/c4_headline" if os.path.exists(
        os.path.join("runs/c4_headline", "scene_c5.json"))
        else "runs/c4_hybrid_deep")
    for bias in ("uniform", "residual"):
        print(f"--- refine bias A/B: {bias} on {run}", flush=True)
        exp_geom_jiggle.main(["--run", run, "--data", "runs/c4_r2/data",
                              "--bias", bias, "--props", "512",
                              "--out-json", f"geom_jiggle_{bias}.json"])


def _best_bias(run="runs/c4_headline"):
    """Winner of the refine_bias_ab measurement (uniform when absent)."""
    best, score = "uniform", -1.0
    for bias in ("uniform", "residual"):
        path = os.path.join(run, f"geom_jiggle_{bias}.json")
        if os.path.exists(path):
            with open(path) as f:
                j = json.load(f)
            gain = j["jiggled_psnr"] - j["baseline_psnr"]
            if gain > score:
                best, score = bias, gain
    return best


def c4_headline2():
    """The c4 headline via the full greedy composition: the mechanism
    A/Bs all measured negative, so this stacks gated rounds on the
    COMPLETED c4_headline scene (--from-scene: no re-training) with the
    A/B-winning refine bias."""
    import run_c5

    args = list(C4_HD)
    run_c5.main(args + [
        "--out", "runs/c4_headline2",
        "--from-scene", "runs/c4_headline/scene_c5.json",
        "--polish", "0", "--refine", "1", "--alternate", "3",
        "--refine-proposals", "1024", "--refine-bias", _best_bias()])


def c5_headline2():
    import run_c5

    args = list(C5_FR10)
    run_c5.main(args + [
        "--out", "runs/c5_headline2",
        "--from-scene", "runs/c5_headline/scene_c5.json",
        "--polish", "0", "--refine", "1", "--alternate", "3",
        "--refine-proposals", "1024", "--refine-bias", _best_bias()])


def bench_guards():
    """End-to-end run of bench.py with BOTH regression guards armed (the
    driver's round-end invocation must pass)."""
    import subprocess

    r = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                       text=True, cwd=os.path.dirname(
                           os.path.dirname(os.path.abspath(__file__))))
    print(r.stdout)
    print(r.stderr[-2000:] if r.stderr else "")
    print(f"bench.py exit code {r.returncode}", flush=True)


def main(argv=None):
    names = (argv if argv is not None else sys.argv[1:]) or (
        ["bench_large_baseline", "dist_overhead", "turbo_guard_seeds"]
        + list(EXPERIMENTS) + ["c4_headline", "c5_headline"])
    import run_c5

    for name in names:
        print(f"\n##### round-4 experiment {name}", flush=True)
        t0 = time.perf_counter()
        try:
            if name in EXPERIMENTS:
                args = EXPERIMENTS[name]
                print(f"  args: {' '.join(args)}", flush=True)
                run_c5.main(args)
            else:
                globals()[name]()
        except Exception:
            traceback.print_exc()
            print(f"##### round-4 experiment {name} FAILED", flush=True)
        print(f"##### round-4 experiment {name} done in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
