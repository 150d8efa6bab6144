"""DistributedTrainer on the virtual 8-device CPU mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from burn_raymarching_tpu.config import TrainConfig
from burn_raymarching_tpu.data.camera import create_camera_rays
from burn_raymarching_tpu.data.dataset import RayDataset
from burn_raymarching_tpu.parallel.distributed import DistributedTrainer, is_host0


@pytest.fixture(scope="module")
def tiny_dataset():
    ro, rd = create_camera_rays(32, 32, [0.0, 0.5, -2.5], [0, 0, 0], 50.0)
    tgt = jnp.clip(jnp.abs(rd), 0, 1)
    return RayDataset(np.asarray(ro), np.asarray(rd), np.asarray(tgt))


def test_is_host0_single_process():
    assert is_host0()


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2)])
def test_distributed_trainer_two_stages(tiny_dataset, data, model):
    cfg = TrainConfig(batch_size=64, stages=2, steps_per_stage=4,
                      use_pallas=False, checkpoint_dir=None)
    tr = DistributedTrainer(cfg, tiny_dataset, data=data, model=model,
                            log=lambda s: None)
    padded, mask = tr.run()
    for leaf in [padded.centers, padded.colors, padded.radii,
                 padded.light_dir, padded.ambient]:
        assert np.isfinite(np.asarray(leaf)).all()
    # Model-axis bucket stays divisible by the model size.
    assert padded.centers.shape[0] % model == 0
