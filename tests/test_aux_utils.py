"""Tests for the auxiliary utilities: flow/heatmap viz, camera distortion,
segmentation, debug helpers, kapture export."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_tpu.geometry.camera import (Distortion, are_visible, distort_points,
                                    is_in_frame, undistort_points)
from vo_tpu.utils.seg import (SegNetSpec, apply_segnet, auto_park_vision,
                              heuristic_road_mask, init_segnet_params)
from vo_tpu.utils.viz import (flow_to_color, heatmap_overlay, make_color_wheel,
                              save_flow_png, save_heatmaps)

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)


class TestDistortion:
    def test_undistort_inverts_distort(self):
        dist = Distortion.from_coeffs([-0.28, 0.07, 1e-4, -2e-4, 0.0])
        rng = np.random.default_rng(0)
        kp = rng.uniform([80, 60], [560, 420], (200, 2)).astype(np.float32)
        kp_d = distort_points(jnp.asarray(kp), jnp.asarray(K), dist)
        kp_u = undistort_points(kp_d, jnp.asarray(K), dist)
        np.testing.assert_allclose(np.asarray(kp_u), kp, atol=5e-2)

    def test_zero_coeffs_identity(self):
        dist = Distortion.from_coeffs([0.0])
        kp = jnp.asarray([[100.0, 200.0], [320.0, 240.0]])
        np.testing.assert_allclose(
            np.asarray(undistort_points(kp, jnp.asarray(K), dist)), np.asarray(kp),
            atol=1e-5)
        assert bool(dist.is_zero)

    def test_matches_opencv_model(self):
        # Independent reference implementation of Brown-Conrady forward model.
        dist = Distortion.from_coeffs([-0.2, 0.05, 1e-3, -1e-3, 0.01])
        x, y = 0.3, -0.2
        r2 = x * x + y * y
        rad = 1 + -0.2 * r2 + 0.05 * r2 ** 2 + 0.01 * r2 ** 3
        xd = x * rad + 2 * 1e-3 * x * y + -1e-3 * (r2 + 2 * x * x)
        yd = y * rad + 1e-3 * (r2 + 2 * y * y) + 2 * -1e-3 * x * y
        u_exp = 500 * xd + 320
        v_exp = 500 * yd + 240
        kp = jnp.asarray([[500 * x + 320, 500 * y + 240]])
        out = np.asarray(distort_points(kp, jnp.asarray(K), dist))[0]
        np.testing.assert_allclose(out, [u_exp, v_exp], rtol=1e-5)


class TestVisibility:
    def test_are_visible(self):
        pts = jnp.asarray([
            [0.0, 0.0, 5.0],     # center, visible
            [0.0, 0.0, -5.0],    # behind
            [10.0, 0.0, 5.0],    # projects far outside
            [0.0, 0.0, 100.0],   # beyond z_far
        ])
        vis = np.asarray(are_visible(pts, jnp.asarray(K), 640, 480, z_far=50.0))
        assert vis.tolist() == [True, False, False, False]

    def test_is_in_frame_margin(self):
        uv = jnp.asarray([[5.0, 5.0], [630.0, 470.0], [320.0, 240.0]])
        assert np.asarray(is_in_frame(uv, 640, 480)).all()
        inner = np.asarray(is_in_frame(uv, 640, 480, margin=10.0))
        assert inner.tolist() == [False, False, True]


class TestFlowViz:
    def test_wheel_shape_and_endpoints(self):
        w = make_color_wheel()
        assert w.shape == (55, 3)
        assert w[0].tolist() == [255, 0, 0]          # pure red start
        assert (w.max(0) == 255).all()

    def test_flow_to_color_properties(self):
        flow = np.zeros((16, 16, 2), np.float32)
        flow[:8, :, 0] = 3.0
        flow[8:, :, 1] = -3.0
        img = flow_to_color(flow)
        assert img.shape == (16, 16, 3) and img.dtype == np.uint8
        # Distinct directions -> distinct colors.
        assert not (img[0, 0] == img[15, 0]).all()
        # NaN -> black.
        flow[0, 0] = np.nan
        assert flow_to_color(flow)[0, 0].tolist() == [0, 0, 0]

    def test_save_flow_png(self, tmp_path):
        p = save_flow_png(str(tmp_path / "f.png"),
                          np.random.default_rng(0).normal(size=(8, 8, 2)))
        assert os.path.exists(p)


class TestHeatmaps:
    def test_overlay_shapes(self):
        img = np.random.default_rng(1).uniform(0, 255, (32, 48)).astype(np.float32)
        heat = np.random.default_rng(2).uniform(0, 1, (8, 12))  # low-res map upsampled
        out = heatmap_overlay(img, heat)
        assert out.shape == (32, 48, 3) and out.dtype == np.uint8

    def test_save_heatmaps(self, tmp_path):
        img = np.zeros((16, 16), np.uint8)
        h = np.random.default_rng(0).uniform(size=(16, 16))
        paths = save_heatmaps(str(tmp_path / "x"), img, h, h)
        assert all(os.path.exists(p) for p in paths)
        assert paths[0].endswith("_reliability.png")


class TestSegmentation:
    def test_segnet_forward_shapes(self):
        spec = SegNetSpec(width=8)
        params = init_segnet_params(jax.random.key(0), spec)
        img = jnp.zeros((2, 32, 48, 3))
        logits = apply_segnet(params, img, spec)
        assert logits.shape == (2, 32, 48, 2)

    def test_auto_park_vision_fallback_and_net(self):
        img = np.full((16, 16, 3), 120.0, np.float32)   # mid-gray == road heuristic
        mask = np.asarray(auto_park_vision(jnp.asarray(img)))
        assert mask.all()
        spec = SegNetSpec(width=8)
        params = init_segnet_params(jax.random.key(0), spec)
        mask2 = np.asarray(auto_park_vision(jnp.asarray(img), params, spec))
        assert mask2.shape == (16, 16) and mask2.dtype == bool

    def test_heuristic_rejects_saturated(self):
        img = np.zeros((4, 4, 3), np.float32)
        img[..., 0] = 255.0                              # saturated red: not road
        assert not np.asarray(heuristic_road_mask(jnp.asarray(img))).any()

    def test_seg_train_step_decreases_loss(self):
        import optax

        spec = SegNetSpec(width=8)
        params = init_segnet_params(jax.random.key(0), spec)
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)
        rng = np.random.default_rng(3)
        imgs = jnp.asarray(rng.uniform(0, 255, (2, 16, 16, 3)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 2, (2, 16, 16)))
        from vo_tpu.utils.seg import seg_train_step

        losses = []
        for _ in range(12):
            params, opt_state, loss = seg_train_step(params, opt_state, imgs, labels,
                                                     opt, spec)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestDebug:
    def test_display_image_writes(self, tmp_path):
        from vo_tpu.utils.debug import display_image

        p = display_image(np.zeros((8, 8)), name="t", out_dir=str(tmp_path))
        assert os.path.exists(p)


class TestKaptureExport:
    def _feats(self):
        from types import SimpleNamespace

        return SimpleNamespace(
            kp=np.array([[[1.0, 2.0, 1.0], [3.0, 4.0, 0.5], [0, 0, 0]]]),
            desc=np.random.default_rng(0).normal(size=(1, 3, 128)).astype(np.float32),
            valid=np.array([[True, True, False]]))

    def test_layout_and_roundtrip(self, tmp_path):
        from vo_tpu.runners.extract import load_kapture_features, save_kapture_features

        feats = self._feats()
        kpath, dpath = save_kapture_features(str(tmp_path), "r2d2", "img0.png",
                                             feats, 0)
        # strict parse-back through the documented kapture 1.x CSV headers
        kp, desc = load_kapture_features(str(tmp_path), "r2d2", "img0.png")
        assert kp.shape == (2, 3) and desc.shape == (2, 128)
        np.testing.assert_allclose(desc, feats.desc[0, :2])
        np.testing.assert_allclose(kp, feats.kp[0, :2])

    def test_csv_headers_and_subpath(self, tmp_path):
        """kapture 1.x type headers are CSV tables, and features mirror the image's
        path relative to the records root (same-named images in different dirs must
        not collide) — ADVICE.md round-1 medium finding."""
        from vo_tpu.runners.extract import save_kapture_features

        feats = self._feats()
        img_root = tmp_path / "records"
        for sub in ("camA", "camB"):
            (img_root / sub).mkdir(parents=True)
            (img_root / sub / "img0.png").touch()
        p1, _ = save_kapture_features(str(tmp_path), "r2d2",
                                      str(img_root / "camA" / "img0.png"), feats, 0,
                                      image_root=str(img_root))
        p2, _ = save_kapture_features(str(tmp_path), "r2d2",
                                      str(img_root / "camB" / "img0.png"), feats, 0,
                                      image_root=str(img_root))
        assert p1 != p2
        assert p1.endswith("reconstruction/keypoints/r2d2/camA/img0.png.kpt")

        lines = (tmp_path / "reconstruction/keypoints/r2d2/keypoints.txt"
                 ).read_text().splitlines()
        assert lines[0].startswith("# kapture format: 1.")
        assert [c.strip() for c in lines[1].split(",")] == ["name", "dtype", "dsize"]
        assert [c.strip() for c in lines[2].split(",")] == ["r2d2", "float32", "3"]
        dlines = (tmp_path / "reconstruction/descriptors/r2d2/descriptors.txt"
                  ).read_text().splitlines()
        assert [c.strip() for c in dlines[1].split(",")] == [
            "name", "dtype", "dsize", "keypoints_type", "metric_type"]
        assert [c.strip() for c in dlines[2].split(",")] == [
            "r2d2", "float32", "128", "r2d2", "L2"]

        with pytest.raises(ValueError, match="not under"):
            save_kapture_features(str(tmp_path), "r2d2", "/elsewhere/img.png",
                                  feats, 0, image_root=str(img_root))
