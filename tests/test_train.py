"""Training-stack tests: pair synthesis geometry, loss behavior, end-to-end steps."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vo_tpu.models.patchnet import FAST_QUAD_L2NET_CONFCFS, QUAD_L2NET_CONFCFS
from vo_tpu.train import (
    TrainConfig,
    create_train_state,
    train_step,
    synthetic_pair_batch,
    random_homography,
    warp_pair,
    cosim_loss,
    peaky_loss,
    ap_reliability_loss,
)
from vo_tpu.train.trainer import save_checkpoint, load_checkpoint


class TestPairs:
    def test_flow_consistency(self):
        """img2 sampled back through flow must match img1 where valid."""
        key = jax.random.key(0)
        img1, img2, flow, mask = synthetic_pair_batch(key, 2, 96, 96)
        img1, img2, flow, mask = map(np.asarray, (img1, img2, flow, mask))
        for b in range(2):
            ys, xs = np.nonzero(mask[b])
            sel = slice(0, len(ys), 37)
            ys, xs = ys[sel], xs[sel]
            tx = flow[b, ys, xs, 0]
            ty = flow[b, ys, xs, 1]
            xi = np.clip(np.round(tx).astype(int), 0, 95)
            yi = np.clip(np.round(ty).astype(int), 0, 95)
            v1 = img1[b, ys, xs]
            v2 = img2[b, yi, xi]
            # bilinear + rounding tolerance on smooth textures
            assert np.median(np.abs(v1 - v2)) < 6.0

    def test_identity_homography(self):
        img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (64, 64)).astype(np.float32))
        img2, flow, mask = warp_pair(img, jnp.eye(3))
        assert np.allclose(np.asarray(img2), np.asarray(img), atol=1e-3)
        gx, gy = np.meshgrid(np.arange(64), np.arange(64))
        assert np.allclose(np.asarray(flow)[..., 0], gx, atol=1e-4)
        assert np.asarray(mask).all()

    def test_homography_invertible(self):
        Hm = np.asarray(random_homography(jax.random.key(3), 128, 128))
        assert abs(np.linalg.det(Hm)) > 1e-3


class TestLosses:
    def test_peaky_prefers_peaks(self, rng):
        flat = jnp.full((1, 64, 64), 0.5)
        peaked = jnp.zeros((1, 64, 64)).at[:, ::8, ::8].set(1.0)
        assert float(peaky_loss(peaked)) < float(peaky_loss(flat))

    def test_cosim_identity_flow_zero(self, rng):
        rep = jnp.asarray(rng.uniform(0, 1, (2, 64, 64)).astype(np.float32))
        gx, gy = np.meshgrid(np.arange(64), np.arange(64))
        flow = jnp.asarray(np.stack([gx, gy], -1)[None].repeat(2, 0).astype(np.float32))
        mask = jnp.ones((2, 64, 64), bool)
        assert float(cosim_loss(rep, rep, flow, mask)) < 1e-5

    def test_ap_loss_good_vs_bad_descriptors(self, rng):
        B, H, W, D = 1, 64, 64, 32
        gx, gy = np.meshgrid(np.arange(W), np.arange(H))
        flow = jnp.asarray(np.stack([gx, gy], -1)[None].astype(np.float32))
        mask = jnp.ones((B, H, W), bool)
        rel = jnp.full((B, H, W), 0.9)
        # good: distinctive per-pixel descriptors identical across views
        d = rng.normal(size=(B, H, W, D)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        good = float(ap_reliability_loss(jnp.asarray(d), jnp.asarray(d), rel, flow, mask))
        # bad: all descriptors identical -> no discrimination
        same = np.ones((B, H, W, D), np.float32) / np.sqrt(D)
        bad = float(ap_reliability_loss(jnp.asarray(same), jnp.asarray(same), rel, flow, mask))
        assert good < bad

    def test_ngh_ap_loss_good_vs_bad(self, rng):
        from vo_tpu.train.losses import ngh_ap_reliability_loss

        B, H, W, D = 1, 64, 64, 32
        gx, gy = np.meshgrid(np.arange(W), np.arange(H))
        flow = jnp.asarray(np.stack([gx, gy], -1)[None].astype(np.float32))
        mask = jnp.ones((B, H, W), bool)
        rel = jnp.full((B, H, W), 0.9)
        # Smooth but distinctive descriptor field (so the pos ring stays positive
        # under bilinear sampling while far negatives differ).
        base = rng.normal(size=(B, H // 8, W // 8, D)).astype(np.float32)
        d = np.array(jax.image.resize(jnp.asarray(base), (B, H, W, D), "linear"))
        d = d / np.linalg.norm(d, axis=-1, keepdims=True).clip(1e-8)
        good = float(ngh_ap_reliability_loss(jnp.asarray(d), jnp.asarray(d), rel,
                                             flow, mask))
        same = np.ones((B, H, W, D), np.float32) / np.sqrt(D)
        bad = float(ngh_ap_reliability_loss(jnp.asarray(same), jnp.asarray(same), rel,
                                            flow, mask))
        assert good < bad

    @pytest.mark.slow
    def test_ngh_sampler_trains(self):
        cfg = TrainConfig(batch=2, height=96, width=96, sampler="ngh")
        spec = FAST_QUAD_L2NET_CONFCFS
        state = create_train_state(spec, cfg)
        key = jax.random.key(1)
        losses = []
        for _ in range(4):
            state, metrics = train_step(state, key, spec, cfg)
            losses.append(float(metrics["total"]))
        assert losses[-1] < losses[0], losses


class TestGradThroughEverySpec:
    """Regression guard for the r04 breakage: an Array init value in
    lax.reduce_window (patchnet.py pool branch) defeats JAX's max-pool monoid
    matching and kills reverse-mode autodiff. Cheap CPU check that jax.grad
    flows through EVERY registered architecture's train-mode forward."""

    @pytest.mark.parametrize("spec", [QUAD_L2NET_CONFCFS, FAST_QUAD_L2NET_CONFCFS],
                             ids=lambda s: s.name)
    def test_grad_flows(self, spec):
        from vo_tpu.models.patchnet import apply_patchnet, init_patchnet_params

        params = init_patchnet_params(jax.random.key(0), spec)
        x = jax.random.uniform(jax.random.key(1), (1, 16, 16, 3))

        def loss(p):
            out = apply_patchnet(p, spec, x, train=True)
            return (jnp.mean(out["descriptors"] ** 2)
                    + jnp.mean(out["reliability"]) + jnp.mean(out["repeatability"]))

        val, grads = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(val))
        flat = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        # at least one conv weight gradient must be nonzero
        assert any(float(jnp.max(jnp.abs(g))) > 0 for g in flat)


class TestTrainStep:
    @pytest.mark.slow
    def test_loss_decreases_on_fixed_batch(self):
        # Same key every step -> same pair batch -> loss must strictly improve.
        cfg = TrainConfig(batch=2, height=96, width=96)
        spec = FAST_QUAD_L2NET_CONFCFS
        state = create_train_state(spec, cfg)
        key = jax.random.key(1)
        losses = []
        for i in range(8):
            state, metrics = train_step(state, key, spec, cfg)
            losses.append(float(metrics["total"]))
            assert not bool(metrics["skipped"])
        assert losses[-1] < losses[0], losses
        assert int(state.step) == 8

    @pytest.mark.slow
    def test_checkpoint_roundtrip(self, tmp_path):
        cfg = TrainConfig(batch=2, height=96, width=96)
        spec = FAST_QUAD_L2NET_CONFCFS
        state = create_train_state(spec, cfg)
        state, _ = train_step(state, jax.random.key(0), spec, cfg)
        p = str(tmp_path / "ckpt.pkl")
        save_checkpoint(p, state, spec.name)
        restored = load_checkpoint(p, state)
        assert int(restored.step) == int(state.step)
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        assert np.allclose(np.asarray(a), np.asarray(b))


class TestCatalogCLIWiring:
    def test_real_image_batches_with_catalog_flags(self, tmp_path, rng):
        """The --style-pairs / --flow-dir / --select CLI flags must wire their
        catalogs into the pair mix and yield trainable batches."""
        from types import SimpleNamespace

        from PIL import Image

        from vo_tpu.runners.train_r2d2 import real_image_batches
        from vo_tpu.train.datasets import flow_to_png

        img_dir = tmp_path / "imgs" / "db"
        st_dir = tmp_path / "style_transfer"
        flow_root = tmp_path / "optical_flow"
        img_dir.mkdir(parents=True)
        st_dir.mkdir()
        (flow_root / "flow").mkdir(parents=True)

        img = rng.uniform(0, 255, (128, 128)).astype(np.uint8)
        Image.fromarray(img).save(img_dir / "100.jpg")
        Image.fromarray(np.roll(img, 5, 1)).save(img_dir / "200.jpg")
        Image.fromarray(255 - img).save(st_dir / "100.jpg.st_x.jpg")
        rel = np.zeros((128, 128, 2), np.float32)
        rel[..., 0] = 5
        flow_to_png(rel, str(flow_root / "flow" / "100_200.png"))

        args = SimpleNamespace(data_dir=str(tmp_path / "imgs"), flow_pairs=None,
                               style_pairs=str(st_dir), flow_dir=str(flow_root),
                               select="db")
        cfg = TrainConfig(batch=2, height=96, width=96)
        batches = list(real_image_batches(args, cfg, steps=2, prefetch=1))
        assert len(batches) == 2
        img1, img2, aflow, mask = batches[0]
        assert img1.shape == (2, 96, 96) and aflow.shape == (2, 96, 96, 2)
        assert mask.any()


class TestLoaderErrorPropagation:
    def test_dead_producer_raises_in_main_loop(self, tmp_path, monkeypatch):
        """A pair-loader crash mid-train must raise in the consumer, not deadlock it
        at q.get forever (the producer follows the same catch-and-reraise contract
        as the streaming runner's decode thread)."""
        from types import SimpleNamespace

        from PIL import Image

        from vo_tpu.runners.train_r2d2 import real_image_batches
        from vo_tpu.train import datasets as ds

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rng = np.random.default_rng(0)
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (128, 128), np.uint8)).save(
                img_dir / f"{i}.png")

        calls = {"n": 0}
        orig = ds.RandomWindowPairLoader.batch

        def dying_batch(self, b):
            calls["n"] += 1
            if calls["n"] >= 3:
                raise OSError("disk vanished")
            return orig(self, b)

        monkeypatch.setattr(ds.RandomWindowPairLoader, "batch", dying_batch)
        args = SimpleNamespace(data_dir=str(img_dir), flow_pairs=None)
        cfg = TrainConfig(batch=2, height=96, width=96)
        with pytest.raises(RuntimeError, match="loader died") as ei:
            for _ in real_image_batches(args, cfg, steps=10, prefetch=2):
                pass
        assert isinstance(ei.value.__cause__, OSError)
