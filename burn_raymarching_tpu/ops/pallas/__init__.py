from burn_raymarching_tpu.ops.pallas.march_kernel import march_pallas  # noqa: F401
