"""Real-image training pipeline: datasets, flow format, window loader, training."""

import os

import numpy as np
import jax
import pytest

from vo_tpu.train.datasets import (
    CatPairs,
    FlowPairs,
    ImageFolder,
    RandomWindowPairLoader,
    StillPairs,
    SyntheticHomographyPairs,
    WindowLoaderConfig,
    flow_to_png,
    png_to_flow,
    tilt_second_image,
)

# Real photographs bundled by the reference (read-only); synthetic fallback keeps the
# test hermetic if the reference tree is absent.
_REF_IMGS = "/root/reference/feature_extractors/r2d2/imgs"


def _image_dir(tmp_path):
    if os.path.isdir(_REF_IMGS):
        return _REF_IMGS
    from PIL import Image

    from vo_tpu.utils.synthetic import render_sequence

    K = np.array([[260.0, 0, 160.0], [0, 260.0, 120.0], [0, 0, 1.0]], np.float32)
    imgs, _, _ = render_sequence(3, K, H=240, W=320, step=2.0)
    d = tmp_path / "imgs"
    d.mkdir(exist_ok=True)
    for i, im in enumerate(imgs):
        Image.fromarray(im.astype(np.uint8)).save(d / f"im{i}.png")
    return str(d)


def _corr_at_flow(img1, img2, aflow, mask, min_pts=50):
    """Correlation of img1 values with img2 sampled at the claimed correspondences."""
    ys, xs = np.nonzero(mask)
    assert len(ys) >= min_pts
    sel = slice(0, len(ys), max(len(ys) // 500, 1))
    ys, xs = ys[sel], xs[sel]
    H2, W2 = img2.shape
    xi = np.clip(np.round(aflow[ys, xs, 0]).astype(int), 0, W2 - 1)
    yi = np.clip(np.round(aflow[ys, xs, 1]).astype(int), 0, H2 - 1)
    return np.corrcoef(img1[ys, xs], img2[yi, xi])[0, 1]


class TestFlowPng:
    def test_roundtrip_reference_format(self, tmp_path, rng):
        flow = rng.normal(0, 40, (32, 48, 2)).astype(np.float32)
        p = str(tmp_path / "flow.png")
        q = flow_to_png(flow, p)
        back = png_to_flow(p)
        # x16 int16 quantization: exact to 1/16 px
        np.testing.assert_allclose(back, q, atol=1e-6)
        assert np.abs(back - flow).max() <= 1 / 16 + 1e-6


class TestImageFolder:
    def test_recursive_and_select(self, tmp_path):
        from PIL import Image

        for sub in ("db", "query"):
            (tmp_path / "tree" / sub).mkdir(parents=True)
            Image.fromarray(np.zeros((8, 8), np.uint8)).save(
                tmp_path / "tree" / sub / "a.png")
        all_ = ImageFolder(str(tmp_path / "tree"))
        assert len(all_) == 2
        db = ImageFolder(str(tmp_path / "tree"), select="db")
        assert len(db) == 1 and "db" in db.paths[0]

    def test_cached_list(self, tmp_path):
        from PIL import Image

        d = tmp_path / "web"
        d.mkdir()
        Image.fromarray(np.zeros((8, 8), np.uint8)).save(d / "x.png")
        (d / "image_list_0.txt").write_text("x.png\n")
        f = ImageFolder(str(d))
        assert len(f) == 1
        assert f.load_gray(0).shape == (8, 8)

    def test_cached_list_hex_prefix_layout(self, tmp_path):
        """revisitop1m layout: cached lists hold bare names that live under a
        3-char hex-prefix subfolder (web_images.py:50-52)."""
        from PIL import Image

        d = tmp_path / "web"
        (d / "0ab").mkdir(parents=True)
        Image.fromarray(np.zeros((8, 8), np.uint8)).save(d / "0ab" / "0abcd.jpg")
        (d / "image_list_0.txt").write_text("0abcd.jpg\n")
        f = ImageFolder(str(d))
        assert len(f) == 1
        assert f.load_gray(0).shape == (8, 8)


class TestPairSources:
    def test_still_pairs(self, tmp_path):
        src = StillPairs(ImageFolder(_image_dir(tmp_path)), max_side=320)
        img1, img2, aflow, mask = src.get_pair(0)
        assert img1.shape == img2.shape and mask.all()
        gy, gx = np.mgrid[0:img1.shape[0], 0:img1.shape[1]]
        np.testing.assert_array_equal(aflow[..., 0], gx)
        np.testing.assert_array_equal(aflow[..., 1], gy)

    def test_synthetic_homography_pairs(self, tmp_path):
        src = SyntheticHomographyPairs(ImageFolder(_image_dir(tmp_path)), max_side=320)
        img1, img2, aflow, mask = src.get_pair(0)
        assert mask.sum() > 0.3 * mask.size
        assert _corr_at_flow(img1, img2, aflow, mask) > 0.9

    def test_flow_pairs_from_disk(self, tmp_path, rng):
        from PIL import Image

        img1 = rng.uniform(0, 255, (64, 80)).astype(np.float32)
        shift = 7
        img2 = np.roll(img1, shift, axis=1)
        gy, gx = np.mgrid[0:64, 0:80]
        aflow = np.stack([gx + shift, gy], -1).astype(np.float32)
        mask = gx < 80 - shift

        d = tmp_path / "fp"
        d.mkdir()
        Image.fromarray(img1.astype(np.uint8)).save(d / "a.png")
        Image.fromarray(img2.astype(np.uint8)).save(d / "b.png")
        flow_to_png(aflow, str(d / "flow.png"))
        Image.fromarray((mask * 255).astype(np.uint8)).save(d / "mask.png")
        (d / "pairs.txt").write_text("a.png b.png flow.png mask.png\n")

        src = FlowPairs(str(d))
        i1, i2, af, mk = src.get_pair(0)
        assert mk.sum() > 0.8 * mask.sum()
        assert _corr_at_flow(i1, i2, af, mk) > 0.95

    def test_style_transfer_pairs(self, tmp_path, rng):
        """Aachen day-night catalog shape: '<tag>.jpg.st_x.jpg' pairs against the
        db image with stem '<tag>' (aachen.py:50-73)."""
        from PIL import Image

        from vo_tpu.train.datasets import StyleTransferPairs

        db = tmp_path / "db"
        st = tmp_path / "style_transfer"
        db.mkdir()
        st.mkdir()
        img = rng.uniform(0, 255, (48, 64)).astype(np.uint8)
        Image.fromarray(img).save(db / "1024.jpg")
        Image.fromarray(255 - img).save(st / "1024.jpg.st_night_ref7.jpg")
        Image.fromarray(img).save(st / "9999.jpg.st_x.jpg")  # no matching db tag

        src = StyleTransferPairs(ImageFolder(str(db)), str(st))
        assert len(src) == 1
        i1, i2, af, mk = src.get_pair(0)
        assert i1.shape == i2.shape == (48, 64) and mk.all()
        # identity aflow, pixel-aligned restyled content (here: inverted)
        assert _corr_at_flow(i1, 255.0 - i2, af, mk) > 0.99

    def test_flow_dir_pairs(self, tmp_path, rng):
        """Aachen optical-flow catalog shape: flow/<tagA>_<tagB>.png (RELATIVE x16
        int16 flow) + mask/ resolving tags by filename stem (aachen.py:79-146)."""
        from PIL import Image

        from vo_tpu.train.datasets import FlowDirPairs

        imgs = tmp_path / "images"
        root = tmp_path / "optical_flow"
        imgs.mkdir()
        (root / "flow").mkdir(parents=True)
        (root / "mask").mkdir()
        img1 = rng.uniform(0, 255, (48, 64)).astype(np.float32)
        shift = 5
        img2 = np.roll(img1, shift, axis=1)
        Image.fromarray(img1.astype(np.uint8)).save(imgs / "100.jpg")
        Image.fromarray(img2.astype(np.uint8)).save(imgs / "200.jpg")
        rel = np.zeros((48, 64, 2), np.float32)
        rel[..., 0] = shift                      # relative flow, reference format
        flow_to_png(rel, str(root / "flow" / "100_200.png"))
        gx = np.mgrid[0:48, 0:64][1]
        Image.fromarray(((gx < 64 - shift) * 255).astype(np.uint8)).save(
            root / "mask" / "100_200.png")

        src = FlowDirPairs(ImageFolder(str(imgs)), str(root))
        assert len(src) == 1
        i1, i2, af, mk = src.get_pair(0)
        assert mk.sum() > 0                       # masked to the valid overlap
        assert _corr_at_flow(i1, i2, af, mk) > 0.95

    def test_cat_pairs(self, tmp_path):
        folder = ImageFolder(_image_dir(tmp_path))
        a, b = StillPairs(folder, 160), SyntheticHomographyPairs(folder, 160)
        cat = CatPairs(a, b)
        assert len(cat) == len(a) + len(b)
        i1a, _, _, _ = cat.get_pair(0)
        i1b, _, _, _ = cat.get_pair(len(a))
        assert i1a.shape == i1b.shape or True  # both resolve without error


class TestTilt:
    def test_preserves_correspondence(self, tmp_path, rng):
        src = StillPairs(ImageFolder(_image_dir(tmp_path)), max_side=320)
        img1, img2, aflow, mask = src.get_pair(0)
        img2t, aflow2, mask2 = tilt_second_image(rng, img2, aflow, mask)
        assert mask2.sum() > 0.3 * mask.size
        assert _corr_at_flow(img1, img2t, aflow2, mask2) > 0.85


class TestRandomWindowLoader:
    def test_fixed_shapes_and_correspondence(self, tmp_path):
        folder = ImageFolder(_image_dir(tmp_path))
        loader = RandomWindowPairLoader(
            CatPairs(StillPairs(folder, 480), SyntheticHomographyPairs(folder, 480)),
            WindowLoaderConfig(crop=128, n_samples=5))
        for _ in range(4):
            img1, img2, aflow, mask = loader.sample()
            assert img1.shape == img2.shape == (128, 128)
            assert aflow.shape == (128, 128, 2) and mask.shape == (128, 128)
            if mask.sum() > 500:
                assert _corr_at_flow(img1, img2, aflow, mask) > 0.7

    def test_batch_shapes(self, tmp_path):
        folder = ImageFolder(_image_dir(tmp_path))
        loader = RandomWindowPairLoader(StillPairs(folder, 320),
                                        WindowLoaderConfig(crop=96))
        img1, img2, aflow, mask = loader.batch(3)
        assert img1.shape == (3, 96, 96) and aflow.shape == (3, 96, 96, 2)
        assert mask.dtype == bool

    def test_scale_mismatch_grows_right_window(self, tmp_path, rng):
        """A pair whose flow doubles coordinates (img2 = 2x upsampled img1) must pick
        a right window ~2x the left one (the reference's sigma in [1, 5) branch)."""
        from PIL import Image

        img1 = rng.uniform(0, 255, (120, 160)).astype(np.float32)
        img2 = np.asarray(Image.fromarray(img1).resize((320, 240), Image.BILINEAR),
                          np.float32)
        gy, gx = np.mgrid[0:120, 0:160]
        aflow = np.stack([2.0 * gx, 2.0 * gy], -1).astype(np.float32)

        class Src:
            def __len__(self):
                return 1

            def get_pair(self, i):
                return img1, img2, aflow, np.ones((120, 160), bool)

        loader = RandomWindowPairLoader(Src(), WindowLoaderConfig(crop=64, tilt=False))
        i1, i2, af, mk = loader.sample()
        assert mk.sum() > 1000
        assert _corr_at_flow(i1, i2, af, mk) > 0.8


class TestRealImageTraining:
    @pytest.mark.slow
    def test_loss_decreases_on_real_images(self, tmp_path):
        """Short real-image training run: the full pipeline (window loader ->
        photometric -> train_step_batch) must reduce the loss from init."""
        import jax.numpy as jnp

        from vo_tpu.models.patchnet import FAST_QUAD_L2NET_CONFCFS
        from vo_tpu.train import TrainConfig, create_train_state, train_step_batch
        from vo_tpu.train.pairs import photometric_augment

        folder = ImageFolder(_image_dir(tmp_path))
        loader = RandomWindowPairLoader(
            CatPairs(StillPairs(folder, 320), SyntheticHomographyPairs(folder, 320)),
            WindowLoaderConfig(crop=96))
        cfg = TrainConfig(batch=4, height=96, width=96, lr=3e-4)
        spec = FAST_QUAD_L2NET_CONFCFS
        state = create_train_state(spec, cfg)

        key = jax.random.key(0)
        losses = []
        for i in range(12):
            key, sub = jax.random.split(key)
            img1, img2, aflow, mask = loader.batch(cfg.batch)
            img2 = jax.vmap(photometric_augment)(
                jax.random.split(sub, cfg.batch), jnp.asarray(img2))
            state, metrics = train_step_batch(
                state, (jnp.asarray(img1), img2, jnp.asarray(aflow),
                        jnp.asarray(mask)), spec, cfg)
            losses.append(float(metrics["total"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
