"""March-kernel micro-variant sweep (one chip). EXPERIMENT HARNESS.

The dense march kernel is exp+sqrt+row-reduce bound (CLAUDE.md). Candidate
micro-optimizations, each checked for allclose vs the XLA march before
timing:

  base   — shipped kernel (expanded-form MXU dot, logsumexp with row max);
  clamp  — replace the row-max pass with val=min(val, 80): exp(80) cannot
           overflow f32 even summed over 32k slots, and no scene radius
           reaches r >= 80/k; saves a [T,M] lane-reduce + broadcast-sub
           per march step;
  exp2   — exp/log via exp2/log2 (VPU-native base-2 transcendentals);
  coord  — coordinate-split (p-c)^2 on the VPU instead of the expanded-form
           K=3 MXU dot;
  tiles  — tile_n 512/1024/2048/4096.

Usage:
  env JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache_tpu \
      PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/exp_march_variants.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache_bench")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 100
_T_MAX = 1e4
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _soft_min_rows(p, centers, kr, c_sq, k, *, clamp, exp2, coord):
    if coord:
        dx = p[:, 0:1] - centers[0:1, :]
        dy = p[:, 1:2] - centers[1:2, :]
        dz = p[:, 2:3] - centers[2:3, :]
        q = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-6)
    else:
        p_sq = jnp.sum(p * p, axis=1, keepdims=True)
        p_dot_c = jnp.dot(p, centers, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        q = jnp.maximum(p_sq + c_sq - 2.0 * p_dot_c, 1e-6)
    val = jnp.sqrt(q) * (-k) + kr
    if clamp:
        val = jnp.minimum(val, 80.0)
        if exp2:
            s = jnp.sum(jnp.exp2(val * _LOG2E), axis=1, keepdims=True)
            return jnp.log2(jnp.maximum(s, 1e-8)) * _LN2 / (-k)
        s = jnp.sum(jnp.exp(val), axis=1, keepdims=True)
        return jnp.log(jnp.maximum(s, 1e-8)) / (-k)
    mx = jnp.max(val, axis=1, keepdims=True)
    if exp2:
        s = jnp.sum(jnp.exp2((val - mx) * _LOG2E), axis=1, keepdims=True)
        return (jnp.log2(jnp.maximum(s, 1e-8)) * _LN2 + mx) / (-k)
    s = jnp.sum(jnp.exp(val - mx), axis=1, keepdims=True)
    return (jnp.log(jnp.maximum(s, 1e-8)) + mx) / (-k)


def _kernel(ro_ref, rd_ref, t0_ref, prim_ref, csq_ref, k_ref, t_ref, n_ref,
            *, num_steps, normal_eps, clamp, exp2, coord):
    ro = ro_ref[:]
    rd = rd_ref[:]
    centers = prim_ref[0:3, :]
    radius = prim_ref[3:4, :]
    c_sq = csq_ref[:]
    k = k_ref[0, 0]
    kr = radius * k

    sdf = functools.partial(_soft_min_rows, centers=centers, kr=kr,
                            c_sq=c_sq, k=k, clamp=clamp, exp2=exp2,
                            coord=coord)

    def body(_, t):
        return jnp.minimum(t + sdf(ro + rd * t), _T_MAX)

    t = jax.lax.fori_loop(0, num_steps, body, t0_ref[:])
    t_ref[:] = t

    p_approx = ro + rd * t
    dist_last = sdf(p_approx)
    p_final = ro + rd * (t + dist_last)

    def tap(axis, sign):
        cols = [p_final[:, i:i + 1] for i in range(3)]
        cols[axis] = cols[axis] + sign * normal_eps
        return sdf(jnp.concatenate(cols, axis=1))

    dx = tap(0, 1.0) - tap(0, -1.0)
    dy = tap(1, 1.0) - tap(1, -1.0)
    dz = tap(2, 1.0) - tap(2, -1.0)
    normal = jnp.concatenate([dx, dy, dz], axis=1)
    length = jnp.sqrt(jnp.sum(normal * normal, axis=1, keepdims=True) + 1e-6)
    n_ref[:] = normal / length


@functools.partial(jax.jit, static_argnames=("num_steps", "tile_n", "clamp",
                                             "exp2", "coord"))
def variant_march(ro, rd, t0, prim, c_sq, k_arr, num_steps, tile_n, clamp,
                  exp2, coord):
    n = ro.shape[0]
    m = prim.shape[1]
    kernel = functools.partial(_kernel, num_steps=num_steps,
                               normal_eps=1e-4, clamp=clamp, exp2=exp2,
                               coord=coord)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(n // tile_n,),
            in_specs=[
                pl.BlockSpec((tile_n, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(ro, rd, t0, prim, c_sq, k_arr)


def main():
    from burn_raymarching_tpu.data.camera import create_camera_rays
    from burn_raymarching_tpu.models.scene import activate, init_scene_params, pad_params
    from burn_raymarching_tpu.ops.march import march_xla
    from burn_raymarching_tpu.ops.sdf import scene_normal

    rng = np.random.default_rng(0)
    params = init_scene_params(100)
    params.centers = jnp.asarray(rng.normal(0, 0.3, (100, 3)), jnp.float32)
    params.radii = jnp.asarray(rng.normal(-2.0, 0.3, (100, 1)), jnp.float32)
    padded, mask = pad_params(params, 128)
    centers, _, radii, _, _ = activate(padded)
    k = jnp.float32(18.5)

    ro, rd = create_camera_rays(128, 128, [0.0, 0.5, -2.5], [0, 0, 0], 50.0)
    n = ro.shape[0]

    # XLA oracle.
    t_ref = march_xla(ro, rd, centers, radii, k, mask=mask, num_steps=40)
    # Reattach step, then normals at p_final (same as the shipped kernel).
    t_col = t_ref.reshape(-1, 1)
    from burn_raymarching_tpu.ops.sdf import scene_sdf
    d_last = scene_sdf(ro + rd * t_col, centers, radii, k, mask=mask)
    p_final = ro + rd * (t_col + d_last.reshape(-1, 1))
    nrm_ref = scene_normal(p_final, centers, radii, k, mask=mask)

    m = 128
    m_pad = 128
    valid = mask
    c = centers
    r = radii.reshape(-1)
    prim = jnp.concatenate([c.T, r[None, :]], axis=0)
    c_sq = jnp.sum(c * c, axis=1)[None, :]
    c_sq = jnp.where(valid[None, :], c_sq, 1e30)
    k_arr = k.reshape(1, 1)

    # For coord variant: bake the mask into kr via prim radius row?
    # Simpler: coord uses c_sq only in non-coord mode; bake mask by pushing
    # masked centers far away.
    c_far = jnp.where(valid[:, None], c, 1e15)
    prim_far = jnp.concatenate([c_far.T, r[None, :]], axis=0)

    t0 = jnp.zeros((n, 1), jnp.float32)

    def check(name, t, nrm, tile):
        t = np.asarray(t[:, 0])
        terr = np.max(np.abs(t - np.asarray(t_ref).reshape(-1)))
        nerr = np.max(np.abs(np.asarray(nrm) - np.asarray(nrm_ref)))
        print(f"  {name:<26} tile={tile:<5} max|dt|={terr:.2e} "
              f"max|dn|={nerr:.2e}")

    variants = [
        ("base", dict(clamp=False, exp2=False, coord=False)),
        ("exp2", dict(clamp=False, exp2=True, coord=False)),
        ("coord", dict(clamp=False, exp2=False, coord=True)),
        ("exp2+coord", dict(clamp=False, exp2=True, coord=True)),
    ]
    # NOTE: a "clamp" variant (drop the row-max pass) was tried and is
    # WRONG: the max-subtraction also guards UNDERFLOW — for a ray far from
    # every primitive exp(val) flushes to 0, s==0, and the march crawls at
    # log(1e-8)/-k per step instead of flying by the true distance.
    t_base, nrm_base = variant_march(ro, rd, t0, prim, c_sq, k_arr, 40,
                                     1024, **variants[0][1])
    print("deviation vs base kernel (16k rays, M=128, 40 steps):")
    for name, kw in variants[1:]:
        pr = prim_far if kw["coord"] else prim
        t, nrm = variant_march(ro, rd, t0, pr, c_sq, k_arr, 40, 1024, **kw)
        dt = np.abs(np.asarray(t) - np.asarray(t_base))[:, 0]
        dn = np.abs(np.asarray(nrm) - np.asarray(nrm_base)).max(1)
        print(f"  {name:<26} |dt| p50={np.percentile(dt,50):.1e} "
              f"p99={np.percentile(dt,99):.1e} max={dt.max():.1e}  "
              f"|dn| p99={np.percentile(dn,99):.1e} max={dn.max():.1e}")

    # Timing: 100 chained kernel invocations (warm 16-step march like bench).
    def scan_time(tile, kw, num_steps, pr):
        @jax.jit
        def run(t0):
            def step(carry, i):
                t, nrm = variant_march(ro, rd, carry * 0.0, pr, c_sq, k_arr,
                                       num_steps, tile, **kw)
                return t, ()

            out, _ = jax.lax.scan(step, t0, jnp.arange(STEPS))
            return out

        out = run(t0)
        np.asarray(out)
        best = float("inf")
        for _ in range(3):
            a = time.perf_counter()
            out = run(t0)
            np.asarray(out)
            best = min(best, (time.perf_counter() - a) / STEPS)
        return best * 1e3

    print("\ntimings (ms per 16-step warm march+normals, 16k rays, M=128):")
    for name, kw in variants:
        pr = prim_far if kw["coord"] else prim
        for tile in (1024, 2048, 4096):
            ms = scan_time(tile, kw, 16, pr)
            print(f"  {name:<26} tile={tile:<5} {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
