"""Homography DLT/RANSAC, plane-induced depth, and parking geometry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vo_tpu.estimation.homography import (
    HomographyConfig, apply_homography, homography_dlt, homography_from_plane,
    homography_ransac, plane_depth_reference_convention, plane_induced_depth)
from vo_tpu.utils.parking import (find_midpoint, find_spot_corners, fit_line,
                                  plane_consensus_mask, world_to_image)

K = jnp.asarray([[300.0, 0.0, 320.0], [0.0, 300.0, 240.0], [0.0, 0.0, 1.0]])


def rand_h(rng):
    H = np.eye(3) + rng.normal(0, 0.1, (3, 3))
    H[2, :2] = rng.normal(0, 1e-4, 2)
    return H / H[2, 2]


def test_dlt_exact_recovery(rng):
    H = rand_h(rng)
    src = rng.uniform(0, 640, (32, 2))
    dst = np.asarray(apply_homography(jnp.asarray(H), jnp.asarray(src)))
    Hest = np.asarray(homography_dlt(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(Hest, H, atol=1e-3)  # f32 eigh path


def test_dlt_batched(rng):
    Hs = np.stack([rand_h(rng) for _ in range(5)])
    src = rng.uniform(0, 640, (5, 16, 2))
    dst = np.asarray(apply_homography(jnp.asarray(Hs)[:, None].squeeze(1), jnp.asarray(src)))
    Hest = np.asarray(homography_dlt(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(Hest, Hs, atol=1e-3)


def test_ransac_robust_to_outliers(rng):
    H = rand_h(rng)
    N = 200
    src = rng.uniform(50, 600, (N, 2)).astype(np.float32)
    dst = np.array(apply_homography(jnp.asarray(H, jnp.float32), jnp.asarray(src)))
    out = rng.random(N) < 0.35
    dst[out] += rng.uniform(20, 100, (out.sum(), 2))
    res = homography_ransac(jax.random.key(0), jnp.asarray(src), jnp.asarray(dst),
                            jnp.ones(N, bool), HomographyConfig())
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert (inl & out).sum() <= 3              # outliers rejected
    assert inl[~out].mean() > 0.9              # inliers kept
    err = np.linalg.norm(np.asarray(apply_homography(res.H, jnp.asarray(src[~out])))
                         - dst[~out], axis=1)
    assert np.median(err) < 1.0


def test_plane_induced_depth_matches_geometry(rng):
    # ground plane 1.5 m below a camera looking straight ahead (+y points down
    # in camera coords, so the ground is y = +1.5): n=[0,1,0], d=1.5
    n = jnp.asarray([0.0, 1.0, 0.0])
    d = 1.5
    kp = jnp.asarray(rng.uniform([200, 260], [440, 420], (64, 2)), jnp.float32)
    z = plane_induced_depth(kp, K, n, d)
    # verify: unproject at that depth -> point satisfies n . X = d
    rays = jnp.einsum("ij,nj->ni", jnp.linalg.inv(K),
                      jnp.concatenate([kp, jnp.ones((64, 1))], axis=-1))
    X = rays * z[:, None]
    np.testing.assert_allclose(np.asarray(X @ n), d, atol=1e-5)
    assert (np.asarray(z) > 0).all()


def test_plane_homography_consistency(rng):
    # H from (R, t, plane) maps view-1 plane pixels to view-2 pixels exactly
    from vo_tpu.geometry.so3 import so3_exp
    R = so3_exp(jnp.asarray([[0.02, -0.03, 0.01]]))[0]
    t = jnp.asarray([0.2, 0.0, 0.4])
    n = jnp.asarray([0.0, 1.0, 0.0])
    d = 1.5
    H = homography_from_plane(K, R, t, n, d)

    kp1 = jnp.asarray(rng.uniform([200, 280], [440, 420], (32, 2)), jnp.float32)
    z = plane_induced_depth(kp1, K, n, d)
    rays = jnp.einsum("ij,nj->ni", jnp.linalg.inv(K),
                      jnp.concatenate([kp1, jnp.ones((32, 1))], axis=-1))
    X1 = rays * z[:, None]
    X2 = X1 @ R.T + t          # camera-2 frame: X2 = R X1 + t
    uv2 = X2[:, :2] / X2[:, 2:3] * jnp.diag(K)[:2] + K[:2, 2]
    np.testing.assert_allclose(np.asarray(apply_homography(H, kp1)),
                               np.asarray(uv2), atol=1e-3)


def test_reference_depth_convention():
    # H^-1 p = [100*z, *, 1] (plane x-axis in cm) -> depth z
    Hinv = np.diag([100.0, 1.0, 1.0])  # so H = diag(0.01, 1, 1)
    H = np.linalg.inv(Hinv)
    kp = jnp.asarray([[7.0, 3.0], [12.5, 9.0]])
    z = plane_depth_reference_convention(jnp.asarray(H), kp)
    np.testing.assert_allclose(np.asarray(z), [7.0, 12.5], atol=1e-6)


def test_parking_spot_pipeline(rng):
    # synthetic road mask free from column 120 (top row) / 100 (bottom row)
    mask = np.zeros((480, 640), np.uint8)
    line_top = (0.05, 150.0)    # y = 0.05 x + 150
    line_bot = (-0.02, 400.0)
    for x in range(120, 640):
        mask[int(0.05 * x + 150), x] = 255
    for x in range(100, 640):
        mask[int(-0.02 * x + 400), x] = 255

    spot = find_spot_corners(jnp.asarray(mask), line_top, line_bot, spot_width_px=200)
    assert bool(spot.found)
    c = np.asarray(spot.corners)
    np.testing.assert_allclose(c[3], [120, 0.05 * 120 + 150], atol=1.0)   # tl
    np.testing.assert_allclose(c[0], [100, -0.02 * 100 + 400], atol=1.0)  # bl

    H = jnp.eye(3)
    mid, world = find_midpoint(spot.corners, H)
    # midpoint inside the quad bounding box
    assert c[:, 0].min() < float(mid[0]) < c[:, 0].max()
    assert c[:, 1].min() < float(mid[1]) < c[:, 1].max()
    np.testing.assert_allclose(np.asarray(world), np.asarray(mid), atol=1e-4)

    # projecting plane corners with identity H is identity
    np.testing.assert_allclose(np.asarray(world_to_image(H, spot.corners)),
                               c, atol=1e-5)


def test_fit_line_weighted(rng):
    x = np.linspace(0, 10, 50)
    y = 2.0 * x + 1.0
    pts = jnp.asarray(np.stack([x, y], -1), jnp.float32)
    m, c = fit_line(pts)
    assert float(m) == pytest.approx(2.0, abs=1e-4)
    assert float(c) == pytest.approx(1.0, abs=1e-3)


def test_plane_consensus_mask():
    kp = jnp.asarray([[10.0, 10.0], [50.0, 20.0]])
    inl = jnp.asarray([True, False])
    m = plane_consensus_mask((32, 64), kp, inl, radius=3)
    assert bool(m[10, 10]) and not bool(m[20, 50])
    assert not bool(m[10, 20])
