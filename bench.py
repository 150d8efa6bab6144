"""Benchmark: rays/s/chip for a full forward+backward training step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is end-to-end training-step throughput (sampling + 40-step march +
reattach + normals + shade + composite + loss + backward + Adam) on the
reference workload shape: batch 16,384 rays (reference train.rs:30), M=128
primitive slots (a late-stage scene), 256x256x10-view dataset.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the ratio
is against the unfused pure-XLA march path measured in the same run — i.e.
the speedup our Pallas fast path delivers over a straightforward XLA port.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache_bench")

import jax
import jax.numpy as jnp
import numpy as np


def make_step(cfg, dataset, march_fn):
    from burn_raymarching_tpu.data.dataset import sample_batch_indices
    from burn_raymarching_tpu.models.scene import scene_forward
    from burn_raymarching_tpu.train.loss import compute_loss
    from burn_raymarching_tpu.train.optimizer import make_optimizer

    tx = make_optimizer(cfg)

    @jax.jit
    def step(params, opt_state, key, mask, rays_o, rays_d, targets,
             fg_indices, n_fg, progress, smooth_k, uniform_ratio, lr):
        idx = sample_batch_indices(key, rays_o.shape[0], fg_indices, n_fg,
                                   cfg.batch_size, uniform_ratio)
        ro = jnp.take(rays_o, idx, axis=0)
        rd = jnp.take(rays_d, idx, axis=0)
        tgt = jnp.take(targets, idx, axis=0)

        def loss_fn(p):
            out = scene_forward(p, ro, rd, smooth_k, mask=mask,
                                march_fn=march_fn)
            return compute_loss(p, out, tgt, progress, mask=mask,
                                cfg=cfg.loss)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
        return params, opt_state, loss

    return step, tx


def bench_step(step, tx, params, mask, ds, cfg, iters=30, warmup=3):
    opt_state = tx.init(params)
    args = lambda i: (  # noqa: E731
        params, opt_state, jax.random.PRNGKey(i), mask,
        ds["rays_o"], ds["rays_d"], ds["targets"], ds["fg_idx"], ds["n_fg"],
        jnp.float32(0.5), jnp.float32(18.5), jnp.float32(0.6),
        jnp.float32(0.01),
    )
    for i in range(warmup):
        p, o, l = step(*args(i))
    jax.block_until_ready((p, l))
    t0 = time.perf_counter()
    for i in range(iters):
        p, o, l = step(*args(i))
    jax.block_until_ready((p, l))
    dt = (time.perf_counter() - t0) / iters
    return cfg.batch_size / dt, dt


def main():
    from burn_raymarching_tpu.config import TrainConfig
    from burn_raymarching_tpu.data.camera import create_camera_rays
    from burn_raymarching_tpu.models.scene import init_scene_params, pad_params
    from burn_raymarching_tpu.ops.march import march_xla

    on_tpu = jax.default_backend() == "tpu"
    cfg = TrainConfig(batch_size=16384 if on_tpu else 2048)

    # Synthetic late-stage scene: 100 live primitives in a 128 bucket.
    rng = np.random.default_rng(0)
    params = init_scene_params(100)
    params.centers = jnp.asarray(rng.normal(0, 0.3, (100, 3)), jnp.float32)
    params.radii = jnp.asarray(rng.normal(-2.0, 0.3, (100, 1)), jnp.float32)
    padded, mask = pad_params(params, 128)

    # 10-view dataset worth of rays (reference scale).
    ro, rd = create_camera_rays(256, 256, [0.0, 0.5, -2.5], [0, 0, 0], 50.0)
    reps = 10
    ds = {
        "rays_o": jnp.tile(ro, (reps, 1)),
        "rays_d": jnp.tile(rd, (reps, 1)),
        "targets": jnp.clip(jnp.abs(jnp.tile(rd, (reps, 1))), 0, 1),
        "fg_idx": jnp.arange(reps * 65536, dtype=jnp.int32),
        "n_fg": jnp.asarray(30000, jnp.int32),
    }

    results = {}
    step_x, tx = make_step(cfg, ds, march_xla)
    results["xla"], dt_x = bench_step(step_x, tx, padded, mask, ds, cfg)

    if on_tpu:
        from burn_raymarching_tpu.ops.pallas import march_pallas

        step_p, tx = make_step(cfg, ds, march_pallas)
        results["pallas"], dt_p = bench_step(step_p, tx, padded, mask, ds, cfg)
    else:
        results["pallas"] = results["xla"]

    best = max(results.values())
    print(json.dumps({
        "metric": "train_step_rays_per_s_per_chip",
        "value": round(best, 1),
        "unit": "rays/s",
        "vs_baseline": round(best / results["xla"], 3),
    }))


if __name__ == "__main__":
    main()
