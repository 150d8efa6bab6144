"""Multi-host runtime: process init, host-0 I/O, distributed training loop.

The reference is strictly single-device (SURVEY §2 — no collectives of any
kind); this is the TPU-native scaling layer mandated by the rebuild's
north-star (≥85% rays/s scaling 1 chip → N≥2 hosts).

Topology model:
  * every host runs the same program; ``init_distributed()`` wires
    jax.distributed (GCE TPU metadata or explicit coordinator);
  * the global mesh is (data, model) over ALL devices; gradients all-reduce
    over ICI within a slice and DCN across hosts via the same psum/pmean —
    XLA routes the collective;
  * per-primitive parameter gradients are tiny (M×7 floats), so the
    all-reduce is latency-bound — DP scaling efficiency is limited only by
    per-step launch overhead;
  * dataset rays/targets are replicated per host (hundreds of MB at most);
    each device samples its own sub-batch by folding its axis index into
    the PRNG key — no data exchange on the sample path;
  * host 0 alone writes previews / scene.json / checkpoints (``is_host0``).

Use DistributedTrainer for the full multi-stage schedule on a mesh; it
reuses the same anneals / density control / export as the single-chip
Trainer.

KNOWN LIMITATION of the virtual CPU mesh (xla_force_host_platform_
device_count): XLA:CPU's collective rendezvous nondeterministically crashes
(rendezvous.h "Check failed: id < num_threads" → SIGSEGV) once a run issues
a few thousand subgroup all-reduces — typically 30-150 training steps of
this pipeline, dense or culled, synced or not (reproduced on jax 0.8.x).
Keep CPU-simulation runs to smoke length (tests and dryrun_multichip do);
real TPU meshes run collectives over ICI and do not use this code path.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from burn_raymarching_tpu.config import TrainConfig
from burn_raymarching_tpu.data.dataset import RayDataset
from burn_raymarching_tpu.models.scene import SceneParams, init_scene_params, pad_params
from burn_raymarching_tpu.parallel.mesh import make_mesh
from burn_raymarching_tpu.parallel.train_step import (
    make_sharded_train_step,
    shard_params,
)
from burn_raymarching_tpu.train.density import prune_and_split
from burn_raymarching_tpu.train.optimizer import (
    anneal_for_step,
    lr_for_step,
    make_optimizer,
)
from burn_raymarching_tpu.utils.padding import bucket_size


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed. On Cloud TPU pods the arguments are
    auto-discovered from the metadata server; pass them explicitly
    elsewhere. Safe to call when already initialized."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def is_host0() -> bool:
    return jax.process_index() == 0


class DistributedTrainer:
    """Multi-stage training over a (data, model) mesh.

    Mirrors Trainer's schedule (stages, anneals, density control, export)
    with the shard_map step from parallel/train_step.py. The primitive
    bucket is padded to a multiple of the model-axis size.
    """

    def __init__(self, cfg: TrainConfig, dataset: RayDataset,
                 data: Optional[int] = None, model: int = 1,
                 log: Callable[[str], None] = print):
        self.cfg = cfg
        self.dataset = dataset
        self.mesh = make_mesh(data=data, model=model)
        self.model = model
        self.log = log if is_host0() else (lambda s: None)
        self.tx = make_optimizer(cfg)
        self._step = make_sharded_train_step(cfg, self.mesh, self.tx)

    def _bucket(self, n: int) -> int:
        b = bucket_size(n)
        # model-axis sharding needs even primitive shards; cluster repulsion
        # additionally needs whole G-groups per shard.
        quantum = self.model * (self.cfg.cull_cluster_group
                                if self.cfg.cluster_repulsion else 1)
        while b % quantum:
            b *= 2
        return b

    def _morton_sort(self, params: SceneParams) -> SceneParams:
        """Z-order the live primitive rows (a scene is a set — pure
        reordering) so the sharded step's implicit cluster structure
        (consecutive G-row groups, whole clusters per shard) is spatially
        coherent."""
        from burn_raymarching_tpu.ops.culling import morton_order

        order = morton_order(np.asarray(params.centers))
        return SceneParams(
            centers=params.centers[order],
            colors=params.colors[order],
            radii=params.radii[order],
            light_dir=params.light_dir,
            ambient=params.ambient,
        )

    def run(self) -> tuple[SceneParams, jax.Array]:
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed)
        rng = np.random.default_rng(cfg.seed)
        params = init_scene_params(cfg.init_n, cfg.init_offset,
                                   cfg.init_ambient_logit)
        ds = self.dataset
        self.log("🚀 Start Multi-Stage Optimization "
                 f"(mesh {dict(self.mesh.shape)})...")
        padded, mask = pad_params(params, self._bucket(params.n))
        for stage in range(cfg.stages):
            self.log(f"=== Stage {stage + 1}/{cfg.stages} (N = {params.n}) ===")
            if cfg.cluster_repulsion:
                params = self._morton_sort(params)
            stage_init_centers = np.asarray(params.centers)
            padded, mask = pad_params(params, self._bucket(params.n))
            p_sh = shard_params(padded, self.mesh, self.model > 1)
            opt_state = self.tx.init(p_sh)
            for step in range(1, cfg.steps_per_stage + 1):
                key, sub = jax.random.split(key)
                progress, smooth_k, uniform_ratio = anneal_for_step(
                    cfg, stage, step)
                lr = lr_for_step(cfg, stage, step)
                p_sh, opt_state, loss = self._step(
                    p_sh, opt_state, sub, mask,
                    ds.rays_o, ds.rays_d, ds.targets, ds.fg_indices, ds.n_fg,
                    jnp.float32(progress), jnp.float32(smooth_k),
                    jnp.float32(uniform_ratio), jnp.float32(lr),
                )
                if step % 100 == 0:
                    self.log(f"  Step {step} | Loss: {float(loss):.5f} | "
                             f"k: {smooth_k:.1f}")
            padded = jax.device_get(p_sh)
            if stage == cfg.stages - 1:
                break
            n = params.n
            centers, colors, radii, stats = prune_and_split(
                np.asarray(padded.centers)[:n],
                np.asarray(padded.colors)[:n],
                np.asarray(padded.radii)[:n],
                stage_init_centers, stage, cfg.stages, rng, cfg.density,
            )
            params = SceneParams(
                centers=jnp.asarray(centers), colors=jnp.asarray(colors),
                radii=jnp.asarray(radii),
                light_dir=jnp.asarray(np.asarray(padded.light_dir)),
                ambient=jnp.asarray(np.asarray(padded.ambient)),
            )
            self.log(f"  => Pruning & Splitting complete. Next N = {params.n}")
        return padded, mask
