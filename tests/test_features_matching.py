"""Feature detection / description / matching tests on synthetic textured images."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vo_tpu.features import (
    OrbLikeExtractor,
    detect_keypoints,
    harris_response,
    shi_tomasi_response,
)
from vo_tpu.matching import (
    mutual_nn_match,
    ratio_mutual_nn_match,
    ratio_match,
    similarity_matrix,
    matches_to_pairs,
)


def make_textured_image(rng, H=120, W=160, n_blobs=60):
    """Random gaussian blobs on a gradient background — plenty of corners."""
    img = np.zeros((H, W), np.float32)
    ys, xs = np.mgrid[:H, :W]
    my, mx = min(10, H // 3), min(10, W // 3)  # keep margins valid for tiny images
    for _ in range(n_blobs):
        cy, cx = rng.uniform(my, H - my), rng.uniform(mx, W - mx)
        s = rng.uniform(1.5, 4.0)
        a = rng.uniform(50, 200)
        img += a * np.exp(-(((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * s * s)))
    # Add some rectangles for hard corners (only when they fit).
    if H > 35 and W > 35:
        for _ in range(10):
            y0, x0 = int(rng.uniform(5, H - 30)), int(rng.uniform(5, W - 30))
            img[y0:y0 + int(rng.uniform(8, 20)), x0:x0 + int(rng.uniform(8, 20))] += rng.uniform(40, 120)
    return np.clip(img, 0, 255)


class TestDetector:
    def test_detects_known_corner(self, rng):
        img = np.zeros((100, 100), np.float32)
        img[40:, 50:] = 200.0  # one strong corner at (50, 40)
        resp = harris_response(jnp.asarray(img[None]))
        kp, score, valid = detect_keypoints(resp, max_kp=16, border=8)
        kp0 = np.asarray(kp[0])[np.asarray(valid[0])]
        d = np.linalg.norm(kp0 - np.array([50, 40]), axis=1).min()
        assert d < 4.0

    def test_fixed_shapes_and_mask(self, rng):
        img = make_textured_image(rng)
        resp = shi_tomasi_response(jnp.asarray(img[None]))
        kp, score, valid = detect_keypoints(resp, max_kp=512)
        assert kp.shape == (1, 512, 2) and valid.shape == (1, 512)
        v = np.asarray(valid[0])
        assert v.sum() > 50  # textured image should produce many corners
        # invalid slots zeroed
        assert np.all(np.asarray(kp[0])[~v] == 0)

    def test_nms_separation(self, rng):
        img = make_textured_image(rng)
        resp = harris_response(jnp.asarray(img[None]))
        kp, _, valid = detect_keypoints(resp, max_kp=256, nms_size=5)
        pts = np.asarray(kp[0])[np.asarray(valid[0])]
        # No two detections within the NMS radius (strict maxima survive).
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        np.fill_diagonal(d, 99)
        assert d.min() >= 2.0

    def test_batched(self, rng):
        imgs = np.stack([make_textured_image(rng) for _ in range(3)])
        resp = harris_response(jnp.asarray(imgs))
        kp, _, valid = detect_keypoints(resp, max_kp=128)
        assert kp.shape == (3, 128, 2)

    def test_budget_exceeds_cell_count(self, rng):
        """max_kp above the 2x2-cell count (tiny pyramid level, big per-scale budget)
        must fall back to a flat top_k instead of erroring (ADVICE round-1)."""
        img = make_textured_image(rng, H=24, W=32)
        resp = harris_response(jnp.asarray(img[None]))
        kp, score, valid = detect_keypoints(resp, max_kp=512, border=2)
        assert kp.shape == (1, 512, 2) and valid.shape == (1, 512)
        v = np.asarray(valid[0])
        assert 0 < v.sum() < 512
        assert np.all(np.asarray(kp[0])[~v] == 0)

    def test_budget_exceeds_pixel_count(self, rng):
        img = make_textured_image(rng, H=12, W=12)
        resp = harris_response(jnp.asarray(img[None]))
        kp, score, valid = detect_keypoints(resp, max_kp=256, border=1)
        assert kp.shape == (1, 256, 2)
        assert np.asarray(valid[0]).sum() < 144


class TestExtractorAndMatching:
    @pytest.fixture(scope="class")
    def shifted_pair(self):
        rng = np.random.default_rng(8214)
        img1 = make_textured_image(rng, H=160, W=220)
        dx, dy = 7, 3
        img2 = np.roll(np.roll(img1, dy, axis=0), dx, axis=1)
        ex = OrbLikeExtractor(max_kp=256)
        feats = ex(jnp.asarray(np.stack([img1, img2])))
        return feats, (dx, dy)

    def test_descriptors_are_pm_one(self, shifted_pair):
        feats, _ = shifted_pair
        d = np.asarray(feats.desc[0], np.float32)
        v = np.asarray(feats.valid[0])
        assert set(np.unique(d[v])) <= {-1.0, 1.0}
        assert np.all(d[~v] == 0)

    def test_translation_recovered_by_matching(self, shifted_pair):
        feats, (dx, dy) = shifted_pair
        res = ratio_match(feats.desc[0], feats.desc[1], feats.valid[0], feats.valid[1],
                          ratio=0.85, binary_dim=feats.desc.shape[-1])
        pairs = matches_to_pairs(res)
        assert pairs.shape[0] >= 30
        kp1 = np.asarray(feats.kp[0])[pairs[:, 0]]
        kp2 = np.asarray(feats.kp[1])[pairs[:, 1]]
        flow = kp2 - kp1
        med = np.median(flow, axis=0)
        assert np.allclose(med, [dx, dy], atol=1.0)
        # inlier fraction of the recovered translation should dominate
        inl = (np.abs(flow - med) < 2).all(axis=1).mean()
        assert inl > 0.7

    def test_mutual_nn_symmetry(self, shifted_pair):
        feats, _ = shifted_pair
        res = mutual_nn_match(feats.desc[0], feats.desc[1], feats.valid[0], feats.valid[1],
                              threshold=0.0)
        pairs = matches_to_pairs(res)
        # mutual-NN is symmetric: matching B->A must give the inverse pairs
        res_rev = mutual_nn_match(feats.desc[1], feats.desc[0], feats.valid[1], feats.valid[0],
                                  threshold=0.0)
        rev = {(b, a) for a, b in matches_to_pairs(res_rev)}
        assert all((a, b) in rev for a, b in pairs)

    def test_ratio_mutual_nn_on_floats(self, rng):
        # unit-norm float descriptors with known correspondence + distractors
        D = 128
        a = rng.normal(size=(64, D)).astype(np.float32)
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        noise = rng.normal(size=(64, D)).astype(np.float32) * 0.05
        b = a + noise
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        perm = rng.permutation(64)
        res = ratio_mutual_nn_match(jnp.asarray(a), jnp.asarray(b[np.argsort(perm)][perm]),
                                    ratio=0.9)
        res = ratio_mutual_nn_match(jnp.asarray(a), jnp.asarray(b), ratio=0.9)
        pairs = matches_to_pairs(res)
        assert pairs.shape[0] > 55
        assert np.all(pairs[:, 0] == pairs[:, 1])

    def test_invalid_columns_never_matched(self, rng):
        a = rng.normal(size=(8, 16)).astype(np.float32)
        b = np.concatenate([a, a[:2] * 100], axis=0)
        valid_b = np.ones(10, bool)
        valid_b[8:] = False
        res = mutual_nn_match(jnp.asarray(a), jnp.asarray(b),
                              jnp.ones(8, bool), jnp.asarray(valid_b), threshold=-1e9)
        assert np.all(np.asarray(res.idx)[np.asarray(res.mask)] < 8)

    def test_similarity_matrix_hamming_identity(self, rng):
        D = 64
        a = np.sign(rng.normal(size=(10, D))).astype(np.float32)
        b = np.sign(rng.normal(size=(12, D))).astype(np.float32)
        sim = np.asarray(similarity_matrix(jnp.asarray(a), jnp.asarray(b)))
        ham = ((a[:, None] * b[None, :]) < 0).sum(-1)
        assert np.allclose((D - sim) / 2, ham)


class TestSubpixelRefinement:
    def test_recovers_fractional_peak(self):
        """A quadratic bump centred between pixels: parabola interpolation recovers
        the fractional coordinate within 0.05 px (integer detection is 0.5 off)."""
        from vo_tpu.features.detect import detect_keypoints, refine_subpixel

        H, W = 64, 96
        cx, cy = 47.3, 31.6
        ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                             np.arange(W, dtype=np.float32), indexing="ij")
        resp = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / 18.0)[None]
        kp, score, valid = detect_keypoints(jnp.asarray(resp), max_kp=4,
                                            nms_size=5, rel_threshold=1e-3,
                                            border=4, subpixel=True)
        best = np.asarray(kp[0, 0])
        assert np.asarray(valid[0, 0])
        assert abs(best[0] - cx) < 0.05 and abs(best[1] - cy) < 0.05, best

    def test_invalid_rows_untouched(self):
        from vo_tpu.features.detect import refine_subpixel

        resp = jnp.asarray(np.random.default_rng(0).random((1, 32, 32), np.float32))
        kp = jnp.zeros((1, 3, 2))
        out = refine_subpixel(resp, kp, jnp.zeros((1, 3), bool))
        assert np.array_equal(np.asarray(out), np.asarray(kp))
