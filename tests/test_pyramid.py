"""Octave-pyramid classic extraction: scale/rotation invariance envelope (the
capability cv2's pyramid ORB / scale-space SIFT provide, ORB.py:7-17, SIFT.py:8-12)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vo_tpu.evalkit.mma import mma_pair
from vo_tpu.features import OrbLikeExtractor
from vo_tpu.features.pyramid import MultiScaleClassicExtractor
from vo_tpu.train.pairs import warp_pair

_REF_IMG = "/root/reference/feature_extractors/r2d2/imgs/brooklyn.png"


@pytest.fixture(scope="module")
def image():
    from PIL import Image

    if os.path.exists(_REF_IMG):
        img = np.asarray(Image.open(_REF_IMG).convert("L"), np.float32)
        return np.asarray(Image.fromarray(img).resize((320, 240)), np.float32)
    from vo_tpu.utils.synthetic import render_sequence

    K = np.array([[260.0, 0, 160.0], [0, 260.0, 120.0], [0, 0, 1.0]], np.float32)
    imgs, _, _ = render_sequence(1, K, H=240, W=320)
    return imgs[0]


def _hm(img, rot=0.0, scale=1.0):
    H, W = img.shape
    c, s = np.cos(rot), np.sin(rot)
    A = np.array([[c * scale, -s * scale, 0], [s * scale, c * scale, 0], [0, 0, 1.0]])
    C = np.array([[1, 0, -W / 2], [0, 1, -H / 2], [0, 0, 1.0]])
    return np.linalg.inv(C) @ A @ C


def _mma3(ex, img, Hm):
    img2, _, _ = warp_pair(jnp.asarray(img), jnp.asarray(Hm, jnp.float32))
    f1 = ex(jnp.asarray(img[None]))
    f2 = ex(jnp.asarray(np.asarray(img2)[None]))
    fb1 = jax.tree.map(lambda a: a[0], f1)
    fb2 = jax.tree.map(lambda a: a[0], f2)
    return float(mma_pair(fb1, fb2, Hm, (3,))[0])


class TestPyramidScaleInvariance:
    @pytest.mark.slow
    def test_brief_pyramid_beats_single_scale_under_zoom(self, image):
        single = OrbLikeExtractor(max_kp=512)
        pyr = MultiScaleClassicExtractor(max_kp=512, n_scales=4)
        for sc in (0.7, 1.4):
            Hm = _hm(image, scale=sc)
            m_single = _mma3(single, image, Hm)
            m_pyr = _mma3(pyr, image, Hm)
            # measured on the reference image: 0.65 -> 0.89 (x0.7), 0.68 -> 0.85 (x1.4)
            assert m_pyr > m_single + 0.08, (sc, m_single, m_pyr)
            assert m_pyr > 0.75, (sc, m_pyr)

    def test_identity_stays_perfect(self, image):
        pyr = MultiScaleClassicExtractor(max_kp=512, n_scales=4)
        assert _mma3(pyr, image, _hm(image)) > 0.95


class TestOrientedGradhist:
    def test_rotation_envelope(self, image):
        """VERDICT round-1 bar: MMA under +/-15 deg within 10% of upright-no-jitter."""
        ex = MultiScaleClassicExtractor(max_kp=512, n_scales=4,
                                        descriptor="gradhist", oriented=True)
        base = _mma3(ex, image, _hm(image))
        for rot in (15, -15):
            m = _mma3(ex, image, _hm(image, rot=np.deg2rad(rot)))
            assert m > 0.9 * base, (rot, m, base)

    def test_orientation_helps_at_large_rotation(self, image):
        """At 40 deg the upright descriptor collapses; the oriented one must not."""
        Hm = _hm(image, rot=np.deg2rad(40))
        upright = MultiScaleClassicExtractor(max_kp=512, n_scales=2,
                                             descriptor="gradhist", oriented=False)
        oriented = MultiScaleClassicExtractor(max_kp=512, n_scales=2,
                                              descriptor="gradhist", oriented=True)
        m_up = _mma3(upright, image, Hm)
        m_or = _mma3(oriented, image, Hm)
        assert m_or > m_up, (m_up, m_or)


class TestDoGResponse:
    def test_detects_blob(self, rng):
        from vo_tpu.features.detect import detect_keypoints, dog_response

        img = np.zeros((96, 96), np.float32)
        yy, xx = np.mgrid[0:96, 0:96]
        img += 200.0 * np.exp(-((yy - 48) ** 2 + (xx - 30) ** 2) / (2 * 2.5 ** 2))
        resp = dog_response(jnp.asarray(img[None]))
        kp, score, valid = detect_keypoints(resp, max_kp=8, border=6)
        kp0 = np.asarray(kp[0])[np.asarray(valid[0])]
        assert len(kp0) > 0
        d = np.linalg.norm(kp0 - np.array([30, 48]), axis=1).min()
        assert d < 3.0

    def test_sift_style_pyramid_mma(self, image):
        ex = MultiScaleClassicExtractor(max_kp=512, n_scales=3, response="dog",
                                        descriptor="gradhist", oriented=True)
        assert _mma3(ex, image, _hm(image)) > 0.9


class TestPyramidContract:
    @pytest.mark.slow
    def test_features_shape_and_pipeline(self, image):
        from vo_tpu.engine.pipeline import extract_and_backproject

        ex = MultiScaleClassicExtractor(max_kp=256, n_scales=3)
        imgs = jnp.asarray(np.stack([image, image + 1.0]))
        feats = ex(imgs)
        assert feats.kp.shape == (2, 256, 2)
        assert feats.valid.shape == (2, 256)
        assert np.asarray(feats.valid).sum() > 100
        # coordinates are full-resolution
        kp = np.asarray(feats.kp[0])[np.asarray(feats.valid[0])]
        assert kp[:, 0].max() <= image.shape[1] - 1
        assert kp[:, 1].max() <= image.shape[0] - 1

        K = jnp.asarray([[260.0, 0, 160.0], [0, 260.0, 120.0], [0, 0, 1.0]])
        deps = jnp.ones((2,) + image.shape) * 5.0
        feats2, kp3d = extract_and_backproject(ex, imgs, deps, K)
        assert kp3d.shape == (2, 256, 3)
