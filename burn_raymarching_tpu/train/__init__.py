from burn_raymarching_tpu.train.loss import compute_loss  # noqa: F401
from burn_raymarching_tpu.train.density import prune_and_split  # noqa: F401
