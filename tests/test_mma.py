"""MMA evaluation harness + photometric augmentation / real-image pair tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vo_tpu.evalkit.mma import mma_on_warps, mma_pair
from vo_tpu.features import OrbLikeExtractor
from vo_tpu.train.pairs import pair_batch_from_images, photometric_augment
from vo_tpu.utils.synthetic import render_sequence

K = np.array([[260.0, 0.0, 160.0], [0.0, 260.0, 120.0], [0.0, 0.0, 1.0]], np.float32)


@pytest.fixture(scope="module")
def textured_images():
    imgs, _, _ = render_sequence(3, K, H=240, W=320, step=0.5)
    return jnp.asarray(imgs)


def test_photometric_augment_preserves_geometry(rng):
    img = jnp.asarray(rng.uniform(0, 255, (64, 64)).astype(np.float32))
    aug = photometric_augment(jax.random.key(0), img)
    a, b = np.asarray(img), np.asarray(aug)
    assert a.shape == b.shape
    assert not np.allclose(a, b)              # actually changed
    assert 0.0 <= b.min() and b.max() <= 255.0
    # monotone-ish tone map + noise: correlation with original stays high
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.9


def test_pair_batch_from_images(textured_images):
    img1, img2, flow, mask = pair_batch_from_images(jax.random.key(2), textured_images)
    assert img1.shape == img2.shape == textured_images.shape
    assert flow.shape == textured_images.shape + (2,)
    m, fl = np.asarray(mask), np.asarray(flow)
    assert m.any(1).any(1).all()              # every pair has valid correspondences
    i2 = np.asarray(img2)
    for b in range(img1.shape[0]):
        ys, xs = np.nonzero(m[b])
        sel = slice(0, len(ys), 53)
        xi = np.clip(np.round(fl[b, ys, xs, 0][sel]).astype(int), 0, 319)
        yi = np.clip(np.round(fl[b, ys, xs, 1][sel]).astype(int), 0, 239)
        v1 = np.asarray(img1[b])[ys, xs][sel]
        v2 = i2[b, yi, xi]
        # photometric jitter shifts values; correspondence keeps them correlated
        assert np.corrcoef(v1, v2)[0, 1] > 0.7


def test_mma_perfect_features():
    # identical kp/desc + identity homography -> MMA = 1 at every threshold
    class F:
        kp = jnp.asarray(np.random.default_rng(0).uniform(0, 100, (64, 2)), jnp.float32)
        desc = jnp.asarray(np.random.default_rng(1).normal(size=(64, 16)), jnp.float32)
        valid = jnp.ones(64, bool)
    curve = mma_pair(F, F, np.eye(3), (1, 3, 5))
    np.testing.assert_allclose(curve, 1.0)


def test_mma_orb_on_warps(textured_images):
    ex = OrbLikeExtractor(max_kp=512)
    res = mma_on_warps(lambda im: ex(im), textured_images, jax.random.key(0),
                       thresholds=(1, 3, 5, 10))
    assert res["n_pairs"] == 3
    assert res["mean_matches"] > 30
    mma = np.asarray(res["mma"])
    assert (np.diff(mma) >= 0).all()          # monotone in threshold
    # upright BRIEF on moderate warps with illumination jitter: well above chance
    assert res["mma@3"] > 0.35, res


def test_mma_r2d2_pretrained_beats_chance():
    import os
    if not os.path.isdir("/root/reference/feature_extractors/r2d2/models"):
        pytest.skip("reference checkpoints unavailable")
    from PIL import Image

    from vo_tpu.models.r2d2_extractor import R2D2Extractor

    # Real photographic content (the upstream sample image): learned descriptors
    # alias badly on our band-limited procedural sinusoid textures, so MMA for the
    # CNN extractor is only meaningful on natural images.
    img = np.asarray(Image.open(
        "/root/reference/feature_extractors/r2d2/imgs/test.png")
        .convert("L").resize((320, 240)), np.float32)
    batch = jnp.asarray(np.stack([img, img[::-1].copy()]))

    # relax the production 0.7/0.7 confidence gates for a usable population
    ex = R2D2Extractor.from_pretrained("faster2d2_WASF_N16", max_kp=512,
                                       score_thr=0.0, rel_thr=0.1, rep_thr=0.1)
    res = mma_on_warps(lambda im: ex(im), batch, jax.random.key(1),
                       thresholds=(1, 3, 5))
    assert res["mean_matches"] > 30
    # published HPatches MMA@3 for this family is 0.65-0.76 (BASELINE.md); our
    # homography-warp protocol on this image lands ~0.87
    assert res["mma@3"] > 0.6, res
