"""Fused shade/composite custom-VJP kernel vs the XLA tail (interpret mode).

The XLA oracle is render_diff with the march+normals injected — exactly the
fused-march production configuration — so both paths consume identical
t/normal and the comparison isolates the shade/composite math and its
hand-derived backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_raymarching_tpu.data.camera import create_camera_rays
from burn_raymarching_tpu.models.scene import SceneParams, activate
from burn_raymarching_tpu.ops.march import march_xla
from burn_raymarching_tpu.ops.pallas.shade_kernel import shade_fused
from burn_raymarching_tpu.ops.sdf import scene_normal, scene_sdf
from burn_raymarching_tpu.render.diff import render_diff


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(9)
    m = 6
    params = SceneParams(
        centers=jnp.asarray(rng.normal(0, 0.3, (m, 3)), jnp.float32),
        colors=jnp.asarray(rng.normal(0, 1.5, (m, 3)), jnp.float32),
        radii=jnp.asarray(rng.normal(-1, 0.5, (m, 1)), jnp.float32),
        light_dir=jnp.asarray([0.3, 1.0, -0.4], jnp.float32),
        ambient=jnp.asarray([-1.0], jnp.float32),
    )
    ro, rd = create_camera_rays(16, 8, [0.0, 0.5, -2.5], [0, 0, 0], 50.0)
    k = jnp.float32(24.0)
    c, col, r, ld, amb = activate(params)
    t = march_xla(ro, rd, c, r, k)
    dl = scene_sdf(ro + rd * t, c, r, k)
    pf = ro + rd * (t + dl)
    normal = scene_normal(jax.lax.stop_gradient(pf), c, r, k)
    normal = jax.lax.stop_gradient(normal)
    cot = jnp.asarray(rng.normal(0, 1, (ro.shape[0], 3)), jnp.float32)
    return params, ro, rd, t, normal, k, cot


def _xla_tail(params, ro, rd, t, normal, k):
    c, col, r, ld, amb = activate(params)
    return render_diff(ro, rd, c, col, r, ld, amb, k,
                       march_normal_fn=lambda *a, **kw: (t, normal))


def _fused_tail(params, ro, rd, t, normal, k, mask=None):
    c, col, r, ld, amb = activate(params)
    return shade_fused(ro, rd, t, normal, c, r, col, ld, amb, k,
                       mask=mask, tile_n=64, interpret=True)


def test_forward_matches_xla(setup):
    params, ro, rd, t, normal, k, _ = setup
    want = np.asarray(_xla_tail(params, ro, rd, t, normal, k))
    got = np.asarray(_fused_tail(params, ro, rd, t, normal, k))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_forward_masked_matches_xla(setup):
    params, ro, rd, t, normal, k, _ = setup
    m = params.n
    pad = 4
    padded = SceneParams(
        centers=jnp.pad(params.centers, ((0, pad), (0, 0))),
        colors=jnp.pad(params.colors, ((0, pad), (0, 0))),
        radii=jnp.pad(params.radii, ((0, pad), (0, 0))),
        light_dir=params.light_dir,
        ambient=params.ambient,
    )
    mask = jnp.arange(m + pad) < m
    want = np.asarray(_xla_tail(params, ro, rd, t, normal, k))

    def fused_masked(p):
        c, col, r, ld, amb = activate(p)
        return shade_fused(ro, rd, t, normal, c, r, col, ld, amb, k,
                           mask=mask, tile_n=64, interpret=True)

    got = np.asarray(fused_masked(padded))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gradients_match_xla(setup):
    params, ro, rd, t, normal, k, cot = setup

    def loss_x(p):
        return jnp.sum(_xla_tail(p, ro, rd, t, normal, k) * cot)

    def loss_f(p):
        return jnp.sum(_fused_tail(p, ro, rd, t, normal, k) * cot)

    g_x = jax.grad(loss_x)(params)
    g_f = jax.grad(loss_f)(params)
    for name in ("centers", "colors", "radii", "light_dir", "ambient"):
        a = np.asarray(getattr(g_f, name))
        b = np.asarray(getattr(g_x, name))
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=1e-6,
            err_msg=f"gradient mismatch for {name}")


def test_gradients_masked_padded_slots_zero(setup):
    params, ro, rd, t, normal, k, cot = setup
    m = params.n
    pad = 4
    padded = SceneParams(
        centers=jnp.pad(params.centers, ((0, pad), (0, 0))),
        colors=jnp.pad(params.colors, ((0, pad), (0, 0))),
        radii=jnp.pad(params.radii, ((0, pad), (0, 0))),
        light_dir=params.light_dir,
        ambient=params.ambient,
    )
    mask = jnp.arange(m + pad) < m

    def loss_f(p):
        c, col, r, ld, amb = activate(p)
        out = shade_fused(ro, rd, t, normal, c, r, col, ld, amb, k,
                          mask=mask, tile_n=64, interpret=True)
        return jnp.sum(out * cot)

    g = jax.grad(loss_f)(padded)
    np.testing.assert_array_equal(np.asarray(g.centers)[m:], 0.0)
    np.testing.assert_array_equal(np.asarray(g.colors)[m:], 0.0)

    def loss_ref(p):
        return jnp.sum(_xla_tail(p, ro, rd, t, normal, k) * cot)

    g_ref = jax.grad(loss_ref)(params)
    np.testing.assert_allclose(np.asarray(g.centers)[:m],
                               np.asarray(g_ref.centers), rtol=2e-4,
                               atol=1e-6)


def test_no_gradient_through_t_or_normal(setup):
    params, ro, rd, t, normal, k, cot = setup

    def loss_t(t_in):
        return jnp.sum(_fused_tail(params, ro, rd, t_in, normal, k) * cot)

    g_t = np.asarray(jax.grad(loss_t)(t))
    np.testing.assert_array_equal(g_t, 0.0)
