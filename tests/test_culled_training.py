"""Tile-culled training path (config-4 style) on CPU."""

import numpy as np
import pytest

from burn_raymarching_tpu.config import TrainConfig
from burn_raymarching_tpu.train.loop import Trainer, build_dataset


@pytest.fixture(scope="module")
def cfg_ds(reference_dir):
    import os

    cfg = TrainConfig(
        batch_size=1024, stages=1, steps_per_stage=10, steps_per_call=10,
        use_pallas=False, use_culling=True, cull_budget=16, cull_tile=256,
        dataset_order="morton", checkpoint_dir=None,
        cameras_json=os.path.join(reference_dir, "data/cameras.json"),
    )
    cwd = os.getcwd()
    os.chdir(reference_dir)
    try:
        ds = build_dataset(cfg)
    finally:
        os.chdir(cwd)
    return cfg, ds


def test_morton_dataset_same_pixel_set(cfg_ds, reference_dir):
    import os

    cfg, ds = cfg_ds
    raster_cfg = TrainConfig(
        cameras_json=os.path.join(reference_dir, "data/cameras.json"))
    cwd = os.getcwd()
    os.chdir(reference_dir)
    try:
        ds_raster = build_dataset(raster_cfg)
    finally:
        os.chdir(cwd)
    assert ds.num_total_pixels == ds_raster.num_total_pixels
    assert ds.num_fg == ds_raster.num_fg  # permutation preserves the fg set
    a = np.sort(np.asarray(ds.targets).sum(1))
    b = np.sort(np.asarray(ds_raster.targets).sum(1))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_culled_training_runs_and_is_finite(cfg_ds, tmp_path, monkeypatch):
    cfg, ds = cfg_ds
    monkeypatch.chdir(tmp_path)
    tr = Trainer(cfg, ds, log=lambda s: None)
    padded, mask = tr.run()
    for leaf in [padded.centers, padded.colors, padded.radii,
                 padded.light_dir, padded.ambient]:
        assert np.isfinite(np.asarray(leaf)).all()
    assert len(tr.loss_history) >= 1
    assert np.isfinite(tr.loss_history).all() if hasattr(
        np, "isfinite") else True


def test_hier_culled_training_runs_and_is_finite(cfg_ds, tmp_path,
                                                 monkeypatch):
    import dataclasses

    cfg, ds = cfg_ds
    cfg = dataclasses.replace(cfg, cull_hierarchical=True,
                              cull_cluster_group=4, cull_cluster_budget=4)
    monkeypatch.chdir(tmp_path)
    tr = Trainer(cfg, ds, log=lambda s: None)
    padded, mask = tr.run()
    for leaf in [padded.centers, padded.colors, padded.radii,
                 padded.light_dir, padded.ambient]:
        assert np.isfinite(np.asarray(leaf)).all()
