from burn_raymarching_tpu.utils.padding import bucket_size  # noqa: F401
