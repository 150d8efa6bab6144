"""Round-3 quality-lever experiments in ONE python process (attach latency
is paid once; see exp_round2_batch.py).

Levers under test (VERDICT r2 "next round" items 1, 2, 5, 7):
  * residual-driven scale-aware split (split_mode=residual) — can density
    control GROW configs 4-5 and claw back part of the ~3 dB ceiling gap;
  * Gaussian trainable coverage (coverage_mode=gaussian, mask s = the GT's
    40) — removes the sigmoid-vs-Gaussian family mismatch baked into the
    committed ceilings (tiny-scale ceiling goes 29.9 → 49.8 dB);
  * post-merge lr_scale_centers re-tune (lr_scale_centers_stages);
  * committed-runner re-measure of the c5 ceiling (results hygiene);
  * hard-silhouette dataset A/B — mask_pixel_mult in its intended domain.

Usage:
  env JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache_tpu \
      PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/exp_round3_batch.py [names...]   # default: all
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache_tpu")

C4 = ["--views", "30", "--size", "512", "--gt-n", "400", "--init-n", "5120",
      "--cull-budget", "2048"]
C4_RECIPE = C4 + ["--stages", "3", "--merge-cell", "0.04", "--steps", "1000",
                  "--data", "runs/c4_r2/data", "--skip-ceiling"]
C5_RECIPE = ["--stages", "3", "--merge-cell", "0.04", "--steps", "1000",
             "--data", "runs/c5/data", "--skip-ceiling"]

EXPERIMENTS = {
    # Results hygiene: fill runs/c5_r2c's null ceiling with the committed
    # evaluator (VERDICT weak-5).
    "c5_ceiling": ["--out", "runs/c5_r2c", "--data", "runs/c5/data",
                   "--ceiling-only"],
    # Scale-aware split on the committed recipes (baselines 26.10 / 25.93).
    "c4_split": C4_RECIPE + ["--out", "runs/c4_split",
                             "--split-mode", "residual"],
    "c5_split": C5_RECIPE + ["--out", "runs/c5_split",
                             "--split-mode", "residual"],
    # Gaussian coverage at the GT's own mask sharpness (s=40); ceiling
    # re-measured under the new forward inside the same run.
    "c4_gauss": C4 + ["--out", "runs/c4_gauss", "--data", "runs/c4_r2/data",
                      "--stages", "3", "--merge-cell", "0.04",
                      "--steps", "1000",
                      "--coverage", "gaussian", "--mask-sharp", "40"],
    "c5_gauss": ["--out", "runs/c5_gauss", "--data", "runs/c5/data",
                 "--stages", "3", "--merge-cell", "0.04", "--steps", "1000",
                 "--coverage", "gaussian", "--mask-sharp", "40"],
    # Post-merge geometry-lr re-tune: stage 0 keeps the stacked-init rate,
    # post-merge stages run 10x (the committed rate was tuned for the
    # 25-deep stacks; the merged cloud is ~20x sparser).
    "c4_lrstage": C4_RECIPE + ["--out", "runs/c4_lr",
                               "--lr-centers-stages", "0.001,0.01,0.01"],
    # Combo: both round-3 levers together.
    "c4_split_gauss": C4_RECIPE + ["--out", "runs/c4_split_gauss",
                                   "--split-mode", "residual",
                                   "--coverage", "gaussian",
                                   "--mask-sharp", "40"],
    "c5_split_gauss": C5_RECIPE + ["--out", "runs/c5_split_gauss",
                                   "--split-mode", "residual",
                                   "--coverage", "gaussian",
                                   "--mask-sharp", "40"],
}

# Deep schedules under the Gaussian forward: round 2's "deeper saturates"
# negative was measured against the 28.5/29.2 sigmoid ceilings; the
# Gaussian ceilings (48.1/47.6) leave ~20 dB of headroom, so depth is
# worth re-testing. (At c5 the Gaussian init starts 2.7 dB lower — the
# stacked init's inflated blobs sit INSIDE the Gaussian mask — and 3x1000
# was not enough to pass the sigmoid recipe: 25.69 vs 25.93.)
EXPERIMENTS["c4_gauss_deep"] = C4 + [
    "--out", "runs/c4_gauss_deep", "--data", "runs/c4_r2/data",
    "--skip-ceiling", "--stages", "5", "--merge-cell", "0.04",
    "--steps", "1000", "--polish", "2",
    "--coverage", "gaussian", "--mask-sharp", "40"]
EXPERIMENTS["c5_gauss_deep"] = [
    "--out", "runs/c5_gauss_deep", "--data", "runs/c5/data",
    "--skip-ceiling", "--stages", "5", "--merge-cell", "0.04",
    "--steps", "1000", "--polish", "2",
    "--coverage", "gaussian", "--mask-sharp", "40"]

# Hybrid coverage schedule: sigmoid for the stacked stage 0 (its interior
# renders coverage-1 under the saturating sigmoid; the Gaussian dims it
# 2.7 dB), GT-matched Gaussian after the merge. Eval/export = gaussian.
EXPERIMENTS["c5_hybrid"] = [
    "--out", "runs/c5_hybrid", "--data", "runs/c5/data",
    "--skip-ceiling", "--stages", "3", "--merge-cell", "0.04",
    "--steps", "1000", "--coverage", "gaussian", "--mask-sharp", "40",
    "--coverage-stages", "sigmoid,gaussian"]
EXPERIMENTS["c5_hybrid_deep"] = [
    "--out", "runs/c5_hybrid_deep", "--data", "runs/c5/data",
    "--skip-ceiling", "--stages", "5", "--merge-cell", "0.04",
    "--steps", "1000", "--polish", "2",
    "--coverage", "gaussian", "--mask-sharp", "40",
    "--coverage-stages", "sigmoid,gaussian"]
EXPERIMENTS["c4_hybrid"] = C4_RECIPE + [
    "--out", "runs/c4_hybrid",
    "--coverage", "gaussian", "--mask-sharp", "40",
    "--coverage-stages", "sigmoid,gaussian"]
EXPERIMENTS["c4_hybrid_deep"] = C4 + [
    "--out", "runs/c4_hybrid_deep", "--data", "runs/c4_r2/data",
    "--skip-ceiling", "--stages", "5", "--merge-cell", "0.04",
    "--steps", "1000", "--polish", "2",
    "--coverage", "gaussian", "--mask-sharp", "40",
    "--coverage-stages", "sigmoid,gaussian"]
# Coarse-to-fine sharpness annealing on top of the hybrid schedule:
# pathology-3 basins have width ~1/sqrt(s) under the Gaussian — start the
# gaussian phase SOFT (s=10, ~3x wider basins than 40) so post-merge
# geometry can move, then anneal to the GT-matched 40 for the ceiling.
for cfg_name, base in (("c4_anneal", C4 + ["--data", "runs/c4_r2/data"]),
                       ("c5_anneal", ["--data", "runs/c5/data"])):
    EXPERIMENTS[cfg_name] = base + [
        "--out", f"runs/{cfg_name}", "--skip-ceiling",
        "--stages", "5", "--merge-cell", "0.04", "--steps", "1000",
        "--polish", "2", "--coverage", "gaussian", "--mask-sharp", "40",
        "--coverage-stages", "sigmoid,gaussian",
        "--mask-sharp-stages", "60,10,20,40,40"]

# Seed robustness of the round-3 headline recipe (single-seed numbers
# 27.62 / 27.15 need a spread check before they're quotable).
for s in (1, 2):
    EXPERIMENTS[f"c4_hd_s{s}"] = C4 + [
        "--data", "runs/c4_r2/data", "--out", f"runs/c4_hd_s{s}",
        "--skip-ceiling", "--stages", "5", "--merge-cell", "0.04",
        "--steps", "1000", "--polish", "2",
        "--coverage", "gaussian", "--mask-sharp", "40",
        "--coverage-stages", "sigmoid,gaussian", "--seed", str(s)]
EXPERIMENTS["c5_hd_s1"] = [
    "--data", "runs/c5/data", "--out", "runs/c5_hd_s1",
    "--skip-ceiling", "--stages", "5", "--merge-cell", "0.04",
    "--steps", "1000", "--polish", "2",
    "--coverage", "gaussian", "--mask-sharp", "40",
    "--coverage-stages", "sigmoid,gaussian", "--seed", "1"]

# Fringe-weighted loss A/B (LossConfig.fringe_weight): the error
# decomposition puts 69-84% of residual error in the dim silhouette
# fringe — upweight exactly that band on the headline recipe.
for fw in (4, 10):
    EXPERIMENTS[f"c4_fringe{fw}"] = C4 + [
        "--data", "runs/c4_r2/data", "--out", f"runs/c4_fringe{fw}",
        "--skip-ceiling", "--stages", "5", "--merge-cell", "0.04",
        "--steps", "1000", "--polish", "2",
        "--coverage", "gaussian", "--mask-sharp", "40",
        "--coverage-stages", "sigmoid,gaussian",
        "--fringe-weight", str(fw)]
EXPERIMENTS["c5_fringe4"] = [
    "--data", "runs/c5/data", "--out", "runs/c5_fringe4",
    "--skip-ceiling", "--stages", "5", "--merge-cell", "0.04",
    "--steps", "1000", "--polish", "2",
    "--coverage", "gaussian", "--mask-sharp", "40",
    "--coverage-stages", "sigmoid,gaussian", "--fringe-weight", "4"]
# c5_fringe4 WON (+0.26 over the hybrid-deep baseline): seed check + dose.
for name, extra in (("c5_fringe4_s1", ["--fringe-weight", "4",
                                       "--seed", "1"]),
                    ("c5_fringe10", ["--fringe-weight", "10"])):
    EXPERIMENTS[name] = [
        "--data", "runs/c5/data", "--out", f"runs/{name}",
        "--skip-ceiling", "--stages", "5", "--merge-cell", "0.04",
        "--steps", "1000", "--polish", "2",
        "--coverage", "gaussian", "--mask-sharp", "40",
        "--coverage-stages", "sigmoid,gaussian"] + extra

# The c4 recipe through the SHARDED driver on the real chip ((1,1) mesh):
# PSNR parity vs runs/c4_r2 (26.10) + wall overhead at real step sizes.
EXPERIMENTS["c4_dist"] = C4_RECIPE + ["--out", "runs/c4_dist",
                                      "--distributed"]

# Hard-silhouette A/B (generate --gt-hard-mask): binary-mask targets, the
# chromakeyed-capture statistic mask_pixel_mult was built for. Fixed mask
# (the committed default) vs sharp world cap + 1-px adaptive floor.
HARD = ["--views", "30", "--size", "512", "--gt-n", "400",
        "--init-n", "5120", "--cull-budget", "2048",
        "--data", "runs/c4_hard/data", "--skip-ceiling",
        "--stages", "3", "--merge-cell", "0.04", "--steps", "1000"]
EXPERIMENTS["c4h_base"] = HARD + ["--out", "runs/c4h_base"]
EXPERIMENTS["c4h_px"] = HARD + ["--out", "runs/c4h_px",
                                "--mask-px", "1.0", "--mask-sharp", "240"]
# Control separating the two factors in c4h_px: sharp world cap, NO floor.
EXPERIMENTS["c4h_sharp"] = HARD + ["--out", "runs/c4h_sharp",
                                   "--mask-sharp", "240"]


def ensure_hard_dataset():
    data = "runs/c4_hard/data"
    if os.path.exists(os.path.join(data, "cameras.json")):
        return
    from burn_raymarching_tpu.tools import generate

    print("--- generating hard-silhouette 30-view 512px dataset ---",
          flush=True)
    generate.main(["--out", data, "--size", "512", "--scene", "knot",
                   "--knot-n", "400", "--views", "30",
                   "--gt-k", "128", "--gt-sharp", "40", "--gt-hard-mask"])


def main(argv=None):
    names = (argv if argv is not None else sys.argv[1:]) or \
        list(EXPERIMENTS)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import run_c5

    for name in names:
        args = EXPERIMENTS[name]
        if name.startswith("c4h"):
            ensure_hard_dataset()
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
