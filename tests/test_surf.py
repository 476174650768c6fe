"""SURF-style path: box-filter Hessian detector + upright Haar SURF-64 descriptors."""

import numpy as np
import jax.numpy as jnp
import pytest

from vo_tpu.features.detect import detect_keypoints
from vo_tpu.features.extractor import OrbLikeExtractor
from vo_tpu.features.surf import dense_haar_planes, hessian_response, surf_descriptors
from vo_tpu.matching import matches_to_pairs, ratio_match

from tests.test_features_matching import make_textured_image


class TestHessianDetector:
    def test_blob_center_is_peak(self):
        """DoH is a blob detector: an isolated gaussian blob peaks at its center."""
        H, W = 100, 120
        ys, xs = np.mgrid[:H, :W].astype(np.float32)
        img = 200.0 * np.exp(-(((ys - 44) ** 2 + (xs - 71) ** 2) / (2 * 3.0 ** 2)))
        resp = hessian_response(jnp.asarray(img[None]))
        kp, _, valid = detect_keypoints(resp, max_kp=8, border=10)
        pts = np.asarray(kp[0])[np.asarray(valid[0])]
        assert np.linalg.norm(pts - np.array([71, 44]), axis=1).min() < 3.0

    def test_flat_image_no_strong_response(self):
        """Interior of a flat image has zero DoH (borders see the zero-fill padding,
        which detect_keypoints' border margin suppresses)."""
        img = np.full((80, 80), 64.0, np.float32)
        resp = np.asarray(hessian_response(jnp.asarray(img[None])))
        assert np.abs(resp[0, 25:-25, 25:-25]).max() < 1e-3

    def test_batched_shapes(self, rng):
        imgs = np.stack([make_textured_image(rng) for _ in range(2)])
        resp = hessian_response(jnp.asarray(imgs))
        assert resp.shape == imgs.shape


class TestSurfDescriptor:
    @pytest.fixture(scope="class")
    def shifted_pair(self):
        rng = np.random.default_rng(8214)
        img1 = make_textured_image(rng, H=160, W=220)
        dx, dy = 6, 4
        img2 = np.roll(np.roll(img1, dy, axis=0), dx, axis=1)
        ex = OrbLikeExtractor(max_kp=256, response="hessian", descriptor="surf")
        feats = ex(jnp.asarray(np.stack([img1, img2])))
        return feats, (dx, dy)

    def test_shapes_and_norm(self, shifted_pair):
        feats, _ = shifted_pair
        assert feats.desc.shape == (2, 256, 64)
        d = np.asarray(feats.desc[0], np.float32)
        v = np.asarray(feats.valid[0])
        norms = np.linalg.norm(d[v], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=0.05)  # bf16 rounding
        assert np.all(d[~v] == 0)

    def test_translation_recovered_by_matching(self, shifted_pair):
        feats, (dx, dy) = shifted_pair
        res = ratio_match(feats.desc[0], feats.desc[1], feats.valid[0], feats.valid[1],
                          ratio=0.85)
        pairs = matches_to_pairs(res)
        assert pairs.shape[0] >= 25
        kp1 = np.asarray(feats.kp[0])[pairs[:, 0]]
        kp2 = np.asarray(feats.kp[1])[pairs[:, 1]]
        flow = kp2 - kp1
        med = np.median(flow, axis=0)
        assert np.allclose(med, [dx, dy], atol=1.0)
        inl = (np.abs(flow - med) < 2).all(axis=1).mean()
        assert inl > 0.7

    def test_haar_planes_translation_equivariance(self):
        rng = np.random.default_rng(3)
        img = make_textured_image(rng, H=96, W=128)
        planes1 = np.asarray(dense_haar_planes(jnp.asarray(img[None])))[0]
        planes2 = np.asarray(dense_haar_planes(
            jnp.asarray(np.roll(img, 5, axis=1)[None])))[0]
        # Interior agrees after undoing the shift (borders differ by zero-fill).
        a = planes1[20:-20, 20:-25]
        b = planes2[20:-20, 25:-20]
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)
