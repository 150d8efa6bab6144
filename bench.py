"""Benchmark: rays/s/chip for the full forward+backward training step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the end-to-end training step (on-device batch sampling + 40-step
march + reattach + normals + shade + composite + 5-term loss + backward +
Adam) on the reference workload shape: batch 16,384 rays (reference
src/bin/train.rs:30), 100 live primitives in a 128-slot bucket, a 10-view
256x256 dataset. Steps are chained with lax.scan inside one jit so the
number reflects chip throughput, not host/tunnel dispatch latency.

Three implementations are timed:
  * xla   — straightforward XLA lowering of the reference pipeline;
  * pallas — the fused march+normals VMEM kernel with early exit;
  * warm  — pallas plus a per-pixel t cache that warm-starts the march
            (cfg.warm_steps instead of 40 cold steps).
vs_baseline is best/xla (the reference publishes no numbers, BASELINE.md),
i.e. the speedup of the TPU-native fast path over a naive port.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache_bench")

try:
    import jax  # noqa: F401
except ModuleNotFoundError:
    # The interpreter on PATH may not be the project venv (the jax/flax
    # stack lives in /opt/venv). Re-exec under it so `python bench.py`
    # works from any shell. NOTE: the venv python is a symlink to the
    # base interpreter, so compare via a loop-guard env flag, not
    # realpath.
    _venv_py = "/opt/venv/bin/python"
    if os.path.exists(_venv_py) and not os.environ.get("_BENCH_REEXEC"):
        os.environ["_BENCH_REEXEC"] = "1"
        os.execv(_venv_py, [_venv_py, os.path.abspath(__file__)]
                 + sys.argv[1:])
    raise

import jax
import jax.numpy as jnp
import numpy as np

SCAN_STEPS = 200


def make_scan_step(cfg, march_normal_fn, warm=False):
    from burn_raymarching_tpu.data.dataset import gather_batch, sample_batch_indices
    from burn_raymarching_tpu.models.scene import activate, scene_forward
    from burn_raymarching_tpu.train.loss import compute_loss
    from burn_raymarching_tpu.train.optimizer import make_optimizer

    tx = make_optimizer(cfg)

    @jax.jit
    def run(params, opt_state, key, mask, packed,
            fg_indices, n_fg, t_cache):
        def one_step(carry, i):
            params, opt_state, t_cache = carry
            k = jax.random.fold_in(key, i)
            idx = sample_batch_indices(k, packed.shape[0], fg_indices, n_fg,
                                       cfg.batch_size, jnp.float32(0.6))
            ro, rd, tgt = gather_batch(packed, idx)

            mn_fn = march_normal_fn
            if warm:
                centers_p, _, radii_p, _, _ = activate(
                    jax.lax.stop_gradient(params))
                t0 = jnp.take(t_cache, idx)[:, None] * cfg.warm_backoff
                t, normal = march_normal_fn(
                    ro, rd, centers_p, radii_p, jnp.float32(18.5), mask=mask,
                    num_steps=cfg.warm_steps, t_init=t0)
                t_cache = t_cache.at[idx].set(t[:, 0])
                mn_fn = lambda *a, **kw: (t, normal)  # noqa: E731

            def loss_fn(p):
                if warm:
                    # Turbo: fused custom-VJP shade/composite kernel.
                    from burn_raymarching_tpu.ops.pallas.shade_kernel import (
                        shade_fused,
                    )

                    c, col, r, ld, amb = activate(p)
                    out = shade_fused(ro, rd, t, normal, c, r, col, ld, amb,
                                      jnp.float32(18.5), mask=mask)
                else:
                    out = scene_forward(p, ro, rd, jnp.float32(18.5),
                                        mask=mask, march_normal_fn=mn_fn)
                return compute_loss(p, out, tgt, jnp.float32(0.5), mask=mask,
                                    cfg=cfg.loss)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p - 0.01 * u, params, updates)
            return (params, opt_state, t_cache), loss

        (params, opt_state, t_cache), losses = jax.lax.scan(
            one_step, (params, opt_state, t_cache), jnp.arange(SCAN_STEPS),
            unroll=cfg.scan_unroll)
        return params, opt_state, losses

    return run, tx


def bench(run, tx, params, mask, ds, cfg, reps=3, t_cache=None):
    opt_state = tx.init(params)
    if t_cache is None:
        t_cache = jnp.zeros((0,), jnp.float32)
    p, o, losses = run(params, opt_state, jax.random.PRNGKey(0), mask,
                       ds["packed"], ds["fg_idx"], ds["n_fg"], t_cache)
    np.asarray(losses)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        p, o, losses = run(params, opt_state, jax.random.PRNGKey(r), mask,
                           ds["packed"], ds["fg_idx"], ds["n_fg"], t_cache)
        # device→host fetch as the sync point: block_until_ready does not
        # reliably block through the tunneled TPU runtime in this env.
        lv = np.asarray(losses)
        best = min(best, (time.perf_counter() - t0) / SCAN_STEPS)
    assert np.isfinite(lv).all()
    return cfg.batch_size / best


def main():
    from burn_raymarching_tpu.config import TrainConfig
    from burn_raymarching_tpu.data.camera import create_camera_rays
    from burn_raymarching_tpu.models.scene import init_scene_params, pad_params

    on_tpu = jax.default_backend() == "tpu"
    # Each scan iteration carries a fixed runtime overhead here (measured
    # 0.14-0.23 ms); unrolling steps/iteration divides it. Measured A/B on
    # the chip: unroll 1/2/4/8 -> 10.67/11.05/11.19/11.20 Mrays/s; 4 is
    # the knee and the default (override via BENCH_UNROLL).
    cfg = TrainConfig(batch_size=16384 if on_tpu else 2048,
                      scan_unroll=int(os.environ.get("BENCH_UNROLL", "4")))

    rng = np.random.default_rng(0)
    params = init_scene_params(100)
    params.centers = jnp.asarray(rng.normal(0, 0.3, (100, 3)), jnp.float32)
    params.radii = jnp.asarray(rng.normal(-2.0, 0.3, (100, 1)), jnp.float32)
    padded, mask = pad_params(params, 128)

    ro, rd = create_camera_rays(256, 256, [0.0, 0.5, -2.5], [0, 0, 0], 50.0)
    reps = 10
    rays_o = jnp.tile(ro, (reps, 1))
    rays_d = jnp.tile(rd, (reps, 1))
    targets = jnp.clip(jnp.abs(rays_d), 0, 1)
    ds = {
        "rays_o": rays_o,
        "rays_d": rays_d,
        "packed": jnp.concatenate([rays_o, rays_d, targets], axis=1),
        "fg_idx": jnp.arange(reps * 65536, dtype=jnp.int32),
        "n_fg": jnp.asarray(30000, jnp.int32),
    }

    run_x, tx = make_scan_step(cfg, None)
    rays_xla = bench(run_x, tx, padded, mask, ds, cfg)

    if on_tpu:
        from burn_raymarching_tpu.ops.pallas import march_shade_pallas

        run_p, tx = make_scan_step(cfg, march_shade_pallas)
        rays_pl = bench(run_p, tx, padded, mask, ds, cfg)

        # Turbo: warm-started march from a prefilled per-pixel t cache.
        run_w, tx = make_scan_step(cfg, march_shade_pallas, warm=True)
        tc = []
        for s in range(0, ds["rays_o"].shape[0], cfg.batch_size):
            t, _ = march_shade_pallas(
                ds["rays_o"][s:s + cfg.batch_size],
                ds["rays_d"][s:s + cfg.batch_size],
                padded.centers, jax.nn.softplus(padded.radii) + 0.01,
                jnp.float32(18.5), mask=mask)
            tc.append(t[:, 0])
        rays_warm = bench(run_w, tx, padded, mask, ds, cfg,
                          t_cache=jnp.concatenate(tc))
    else:
        rays_pl = rays_warm = rays_xla

    best = max(rays_xla, rays_pl, rays_warm)
    print(json.dumps({
        "metric": "train_step_rays_per_s_per_chip",
        "value": round(best, 1),
        "unit": "rays/s",
        "vs_baseline": round(best / rays_xla, 3),
    }))
    if on_tpu:
        check_regression(best)
        check_large_regression()


def check_regression(value: float, tolerance: float = 0.90):
    """Regression guard (VERDICT r2 item 7): compare against the newest
    committed BENCH_r*.json and fail loudly below tolerance x previous.
    The JSON line is already printed, so the driver's record is intact
    either way; the nonzero exit is the round-level tripwire."""
    import glob
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    records = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if not records:
        return
    with open(records[-1]) as f:
        prev = json.load(f).get("parsed", {}).get("value")
    if not prev:
        return
    if value < tolerance * prev:
        print(f"BENCH REGRESSION: {value:,.0f} rays/s < {tolerance:.0%} of "
              f"committed {prev:,.0f} ({os.path.basename(records[-1])})",
              file=sys.stderr)
        sys.exit(2)
    print(f"bench guard ok: {value:,.0f} vs committed {prev:,.0f} "
          f"({os.path.basename(records[-1])})", file=sys.stderr)


def large_flagship(steps: int = 50, reps: int = 2):
    """(ms/step, rays/s) of the flagship large-scene configuration:
    M=51,200 culled train step — hierarchical selection, fused culled
    march kernel warm-started 16 steps, fused cluster repulsion with the
    monopole far field (docs/PARITY.md large-scene table: 6.94 ms /
    2.36 Mrays/s on one chip). Reuses scripts/bench_large.py's harness so
    this is the same measurement the docs quote."""
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.join(here, "scripts"))
    import bench_large as bl

    from burn_raymarching_tpu.config import LossConfig, TrainConfig

    cfg = TrainConfig(
        loss=LossConfig(repulsion_far_field="monopole"),
        batch_size=16384, use_culling=True, cull_budget=256,
        cull_tile=512, cull_hierarchical=True, cull_cluster_group=64,
        cull_cluster_budget=32, cluster_repulsion=True,
        weight_decay_mode="decoupled", warm_start=True, warm_steps=16,
        steps_per_call=steps, checkpoint_dir=None)
    ds = bl.make_dataset(10 * 256 * 256)
    padded, mask = bl.make_params(51200)
    best, rays, _ = bl.bench_variant(cfg, ds, padded, mask, "warm",
                                     steps, reps)
    return best * 1e3, rays


def check_large_regression(tolerance: float = 0.90):
    """Second guarded metric (VERDICT r3 item 5): the large-scene
    culled+fused warm step must stay within tolerance of the committed
    BENCH_LARGE.json — the flagship TPU-native path previously had no
    tripwire and could regress silently."""
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "BENCH_LARGE.json")
    if not os.path.exists(path):
        return
    with open(path) as f:
        prev = json.load(f)["mrays_per_s"]
    ms, rays = large_flagship()
    mrays = rays / 1e6
    if mrays < tolerance * prev:
        print(f"LARGE-SCENE BENCH REGRESSION: {mrays:.2f} Mrays/s "
              f"({ms:.2f} ms/step) < {tolerance:.0%} of committed "
              f"{prev:.2f} (BENCH_LARGE.json)", file=sys.stderr)
        sys.exit(2)
    print(f"large-scene guard ok: {mrays:.2f} Mrays/s ({ms:.2f} ms/step) "
          f"vs committed {prev:.2f}", file=sys.stderr)


def write_large_baseline():
    """Measure the flagship large-scene step and (re)commit the guard
    baseline. Run on real TPU hardware only."""
    here = os.path.dirname(os.path.abspath(__file__))
    ms, rays = large_flagship()
    payload = {"m": 51200, "cull_budget": 256, "hier": True,
               "warm_steps": 16, "rep_far_field": "monopole",
               "ms_per_step": round(ms, 3),
               "mrays_per_s": round(rays / 1e6, 3)}
    with open(os.path.join(here, "BENCH_LARGE.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    import sys

    if "--write-large-baseline" in sys.argv:
        write_large_baseline()
    else:
        main()
