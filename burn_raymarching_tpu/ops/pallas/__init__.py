from burn_raymarching_tpu.ops.pallas.march_shade_kernel import march_shade_pallas  # noqa: F401
