"""Loss terms vs NumPy oracles (reference src/training.rs:8-85)."""

import jax.numpy as jnp
import numpy as np
import pytest

from burn_raymarching_tpu.config import LossConfig
from burn_raymarching_tpu.models.scene import SceneParams
from burn_raymarching_tpu.train.loss import compute_loss


def _np_softplus(x):
    return np.logaddexp(x, 0.0)


def _oracle_loss(params, out, tgt, progress, cfg=LossConfig()):
    abs_diff = np.abs(out - tgt)
    tsum = tgt.sum(1, keepdims=True)
    bg_w = 1.0 + progress * 4.0
    wmap = np.where(tsum > 0.01, 10.0, bg_w)
    loss = (abs_diff * wmap).mean()

    radii = _np_softplus(params["radii"])
    loss += 0.002 * np.abs(radii).mean()
    loss += 0.04 * np.where(radii > 1.0, radii ** 2, 0.0).mean()

    c = params["centers"]
    loss += 0.05 * (c ** 2).mean()

    dist = np.sqrt((c ** 2).sum(1, keepdims=True) + 1e-6)
    reach = dist + radii
    loss += 5.0 * np.where(reach > 1.2, (reach - 1.2) ** 2, 0.0).mean()

    m = c.shape[0]
    d2 = ((c[:, None] - c[None, :]) ** 2).sum(-1)
    dmat = np.sqrt(np.maximum(d2, 1e-6))
    inv = 1.0 / (dmat + np.eye(m) * 100.0 + 1e-6)
    loss += 1e-5 * inv.mean()
    return loss


@pytest.fixture
def setup():
    rng = np.random.default_rng(7)
    m, b = 5, 32
    params_np = {
        "centers": rng.normal(0, 0.5, (m, 3)).astype(np.float32),
        "colors": rng.normal(0, 1, (m, 3)).astype(np.float32),
        "radii": rng.normal(0, 1, (m, 1)).astype(np.float32),
    }
    params = SceneParams(
        centers=jnp.asarray(params_np["centers"]),
        colors=jnp.asarray(params_np["colors"]),
        radii=jnp.asarray(params_np["radii"]),
        light_dir=jnp.asarray([0.0, 1.0, 0.0]),
        ambient=jnp.asarray([-1.4]),
    )
    out = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    tgt = rng.uniform(0, 0.3, (b, 3)).astype(np.float32)
    tgt[: b // 2] = 0.0  # some background pixels
    return params_np, params, out, tgt


def test_loss_matches_oracle(setup):
    params_np, params, out, tgt = setup
    for progress in (0.0, 0.5, 1.0):
        got = float(compute_loss(params, jnp.asarray(out), jnp.asarray(tgt),
                                 jnp.float32(progress)))
        want = _oracle_loss(params_np, out, tgt, progress)
        np.testing.assert_allclose(got, want, rtol=2e-4)


def test_loss_masked_equals_unpadded(setup):
    params_np, params, out, tgt = setup
    m = params.centers.shape[0]
    m_pad = 8
    pad = m_pad - m
    padded = SceneParams(
        centers=jnp.pad(params.centers, ((0, pad), (0, 0))),
        colors=jnp.pad(params.colors, ((0, pad), (0, 0))),
        radii=jnp.pad(params.radii, ((0, pad), (0, 0))),
        light_dir=params.light_dir,
        ambient=params.ambient,
    )
    mask = jnp.arange(m_pad) < m
    got = float(compute_loss(padded, jnp.asarray(out), jnp.asarray(tgt),
                             jnp.float32(0.3), mask=mask))
    want = float(compute_loss(params, jnp.asarray(out), jnp.asarray(tgt),
                              jnp.float32(0.3)))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_radius_penalty_uses_softplus_without_offset(setup):
    # The penalty path uses softplus(raw) (training.rs:44), NOT the forward's
    # softplus+0.01: at raw=0, softplus=0.693 → l1 term = 0.002*0.693.
    _, params, out, tgt = setup
    z = SceneParams(
        centers=jnp.zeros((1, 3)),
        colors=jnp.zeros((1, 3)),
        radii=jnp.zeros((1, 1)),
        light_dir=params.light_dir,
        ambient=params.ambient,
    )
    same = jnp.zeros((4, 3))
    got = float(compute_loss(z, same, same, jnp.float32(0.0)))
    sp0 = float(np.logaddexp(0.0, 0.0))
    # recon 0; radius_l1 = 0.002*sp0; large 0; center 0; proximity:
    # reach = 1e-3 + sp0 < 1.2 → 0; repulsion = 1e-5 * 1/(1e-3+100+1e-6).
    want = 0.002 * sp0 + 1e-5 * 1.0 / (np.sqrt(1e-6) + 100.0 + 1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cluster_repulsion_approximates_exact():
    """Two-level repulsion ≈ exact pairwise mean; tight when clusters are
    compact and separated, still close for a generic cloud."""
    import jax
    import jax.numpy as jnp

    from burn_raymarching_tpu.ops.culling import build_clusters
    from burn_raymarching_tpu.train.loss import cluster_repulsion

    def exact(centers, mask):
        m = centers.shape[0]
        d = np.sqrt(np.maximum(
            np.sum((centers[:, None] - centers[None, :]) ** 2, -1), 1e-6))
        inv = 1.0 / (d + np.eye(m) * 100.0 + 1e-6)
        w = mask.astype(np.float64)
        nv = w.sum()
        return float((inv * w[:, None] * w[None, :]).sum() / (nv * nv))

    rng = np.random.default_rng(3)
    # Separated compact blobs: approximation should be very tight.
    blobs = np.concatenate([
        rng.normal(0, 0.02, (16, 3)) + np.asarray(c)
        for c in [(0, 0, 0), (2, 0, 0), (0, 2, 0), (0, 0, 2)]
    ]).astype(np.float32)
    mask = np.ones(64, bool)
    cl = build_clusters(blobs, group=16)
    got = float(cluster_repulsion(jnp.asarray(blobs), cl,
                                  jnp.asarray(mask), jnp.float32(64)))
    np.testing.assert_allclose(got, exact(blobs, mask), rtol=2e-3)

    # Generic cloud with padded slots: still close (monopole far field).
    cloud = rng.normal(0, 0.8, (128, 3)).astype(np.float32)
    mask = np.arange(128) < 100
    cl = build_clusters(cloud, mask=mask, group=8)
    got = float(cluster_repulsion(jnp.asarray(cloud), cl,
                                  jnp.asarray(mask), jnp.float32(100)))
    np.testing.assert_allclose(got, exact(cloud, mask), rtol=1e-2)

    # Gradients are finite and broadly aligned with the exact term's.
    def f_apx(c):
        return cluster_repulsion(c, cl, jnp.asarray(mask), jnp.float32(100))


    def f_exact(c):
        m = c.shape[0]
        d2 = jnp.sum((c[:, None] - c[None, :]) ** 2, -1)
        d = jnp.sqrt(jnp.maximum(d2, 1e-6))
        inv = 1.0 / (d + jnp.eye(m) * 100.0 + 1e-6)
        w = jnp.asarray(mask, jnp.float32)
        return jnp.sum(inv * w[:, None] * w[None, :]) / (100.0 * 100.0)

    g_a = np.asarray(jax.grad(f_apx)(jnp.asarray(cloud)))[mask]
    g_e = np.asarray(jax.grad(f_exact)(jnp.asarray(cloud)))[mask]
    assert np.isfinite(g_a).all()
    cos = (g_a * g_e).sum() / (np.linalg.norm(g_a) * np.linalg.norm(g_e))
    assert cos > 0.95, cos


def test_fringe_weight_reference_parity_and_boost():
    """fringe_weight=1 is bit-identical to the reference loss; >1 upweights
    exactly the dim object fringe (fg_mask_threshold < sum < threshold)."""
    import jax.numpy as jnp
    import numpy as np

    from burn_raymarching_tpu.config import LossConfig
    from burn_raymarching_tpu.models.scene import init_scene_params
    from burn_raymarching_tpu.train.loss import compute_loss

    params = init_scene_params(3)
    out = jnp.zeros((4, 3), jnp.float32)
    # Rows: background (sum 0), fringe (sum 0.15), bright object (sum 1.5),
    # just-above-threshold-but-below-fringe (sum 0.02).
    tgt = jnp.asarray([[0.0, 0.0, 0.0], [0.05, 0.05, 0.05],
                       [0.5, 0.5, 0.5], [0.01, 0.005, 0.005]], jnp.float32)
    base = compute_loss(params, out, tgt, jnp.float32(0.0),
                        cfg=LossConfig())
    off = compute_loss(params, out, tgt, jnp.float32(0.0),
                       cfg=LossConfig(fringe_weight=1.0))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(off))

    on = compute_loss(params, out, tgt, jnp.float32(0.0),
                      cfg=LossConfig(fringe_weight=5.0,
                                     fringe_threshold=0.3))
    # Extra loss = (5-1) * fg_weight * mean contribution of the two fringe
    # rows' |diff| (rows 1 and 3; row 2 is above the fringe threshold).
    fringe_l1 = (np.abs(np.asarray(tgt[1])).sum()
                 + np.abs(np.asarray(tgt[3])).sum())
    want_delta = 4.0 * 10.0 * fringe_l1 / tgt.size
    np.testing.assert_allclose(float(on) - float(base), want_delta,
                               rtol=1e-5)
