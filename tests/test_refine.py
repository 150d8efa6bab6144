"""Derivative-free geometry refinement (train/refine.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_raymarching_tpu.config import TrainConfig
from burn_raymarching_tpu.models.scene import (
    init_scene_params,
    pad_params,
)
from burn_raymarching_tpu.train.loop import build_dataset
from burn_raymarching_tpu.train.refine import (
    geometry_refine,
    sample_fg_tile_batches,
)


@pytest.fixture(scope="module")
def setup():
    cfg = TrainConfig(
        batch_size=1024, use_pallas=False, checkpoint_dir=None,
        use_culling=True, cull_budget=16, cull_tile=256,
        dataset_order="morton",
        cameras_json="/root/reference/data/cameras.json",
    )
    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        ds = build_dataset(cfg)
    finally:
        os.chdir(cwd)
    return cfg, ds


def test_batches_disjoint_fg(setup):
    cfg, ds = setup
    a, b = sample_fg_tile_batches(ds, tiles=4, tile=cfg.cull_tile)
    assert a[0].shape == (1024, 3) and b[0].shape == (1024, 3)
    # Disjoint: no shared rays (compare origins+dirs rows).
    ra = np.asarray(a[0]) + 7.0 * np.asarray(a[1])
    rb = np.asarray(b[0]) + 7.0 * np.asarray(b[1])
    sa = {tuple(np.round(r, 5)) for r in ra[:: 64]}
    sb = {tuple(np.round(r, 5)) for r in rb[:: 64]}
    assert not (sa & sb)
    # fg tiles: each batch contains foreground pixels.
    assert float(np.asarray(a[2]).sum()) > 0
    assert float(np.asarray(b[2]).sum()) > 0


def test_refine_descends_and_touches_only_live_geometry(setup):
    cfg, ds = setup
    params = init_scene_params(7)
    padded, mask = pad_params(params, 8)
    batches = sample_fg_tile_batches(ds, tiles=4, tile=cfg.cull_tile)
    refined, stats = geometry_refine(
        padded, mask, batches, cfg, proposals=64, phases=1,
        key=jax.random.PRNGKey(0), log=lambda s: None)
    assert stats.loss_after <= stats.loss_before
    assert stats.accepted >= 1          # tiny scene: some proposal wins
    assert stats.proposals == 64
    # Only live centers/radii move; colors/light/padded slots untouched.
    np.testing.assert_array_equal(np.asarray(refined.colors),
                                  np.asarray(padded.colors))
    np.testing.assert_array_equal(np.asarray(refined.light_dir),
                                  np.asarray(padded.light_dir))
    assert np.array_equal(np.asarray(refined.centers)[7:],
                          np.asarray(padded.centers)[7:])
    assert np.abs(np.asarray(refined.centers)[:7]
                  - np.asarray(padded.centers)[:7]).max() > 0
    for leaf in jax.tree.leaves(refined):
        assert np.isfinite(np.asarray(leaf)).all()


def test_refine_noop_when_nothing_accepted(setup):
    """With zero noise every proposal equals the current params (strict <
    comparisons reject them) — params come back bit-identical."""
    cfg, ds = setup
    params = init_scene_params(7)
    padded, mask = pad_params(params, 8)
    batches = sample_fg_tile_batches(ds, tiles=2, tile=cfg.cull_tile)
    refined, stats = geometry_refine(
        padded, mask, batches, cfg, proposals=64, phases=1,
        sigma_c=0.0, sigma_r=0.0,
        key=jax.random.PRNGKey(0), log=lambda s: None)
    assert stats.accepted == 0
    np.testing.assert_array_equal(np.asarray(refined.centers),
                                  np.asarray(padded.centers))
    np.testing.assert_array_equal(np.asarray(refined.radii),
                                  np.asarray(padded.radii))
