"""Multiscale pyramid extraction (reference extract.py parity) + extract CLI."""

import numpy as np
import jax
import pytest

from vo_tpu.models.multiscale import (MultiscaleConfig, extract_multiscale,
                                      pyramid_scales, save_r2d2_npz)
from vo_tpu.models.patchnet import FAST_QUAD_L2NET_CONFCFS, init_patchnet_params


CFG = MultiscaleConfig(min_size=32, max_size=256, top_k=256, per_scale_k=128,
                       rel_thr=0.0, rep_thr=0.0)


@pytest.fixture(scope="module")
def net():
    spec = FAST_QUAD_L2NET_CONFCFS
    params = init_patchnet_params(jax.random.key(0), spec)
    return spec, params


def test_pyramid_scales_match_reference_walk():
    # reference: s from 1.0, s /= 2^0.25, while s >= max(min_scale, min_size/max(H,W))
    scales = pyramid_scales(128, 96, CFG)
    assert scales[0] == 1.0
    assert all(scales[i] / scales[i + 1] == pytest.approx(2 ** 0.25)
               for i in range(len(scales) - 1))
    assert min(scales) >= 32 / 128 / 2 ** 0.25  # stops at the min_size bound
    assert len(scales) >= 4

    # max_size gates the top of the pyramid: a 2048-wide image skips scale 1.0
    big = pyramid_scales(512, 2048, MultiscaleConfig(min_size=32, max_size=1024))
    assert 1.0 not in big and max(big) <= 1024 / 2048 + 0.001


def test_multiscale_extract_shapes_and_scale_column(rng, net):
    spec, params = net
    imgs = rng.uniform(0, 255, (2, 96, 128, 3)).astype(np.float32)
    feats = extract_multiscale(params, spec, imgs, CFG)
    assert feats.kp.shape == (2, 256, 3)
    assert feats.desc.shape == (2, 256, spec.out_dim)
    assert bool(feats.valid.any())

    kp = np.asarray(feats.kp)[np.asarray(feats.valid)]
    # coordinates map back to full resolution
    assert kp[:, 0].max() < 128 and kp[:, 1].max() < 96
    # third column is the reference's 32/s patch-size convention
    expected = {np.float32(32.0 / s) for s in pyramid_scales(96, 128, CFG)}
    assert set(np.unique(kp[:, 2])) <= expected
    assert len(set(np.unique(kp[:, 2]))) >= 2  # detections from multiple levels

    # descriptors L2-normalized where valid
    d = np.asarray(feats.desc)[np.asarray(feats.valid)]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)

    # scores sorted descending (global top-k)
    sc = np.asarray(feats.score)
    assert (np.diff(sc, axis=1) <= 1e-6).all()


def test_r2d2_npz_roundtrip(tmp_path, rng, net):
    spec, params = net
    imgs = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    feats = extract_multiscale(params, spec, imgs, CFG)
    path = save_r2d2_npz(str(tmp_path / "im.png.r2d2"), feats, imsize=(64, 64))
    blob = np.load(path)
    assert tuple(blob["imsize"]) == (64, 64)
    n = blob["keypoints"].shape[0]
    assert blob["descriptors"].shape == (n, spec.out_dim)
    assert blob["scores"].shape == (n,)
    assert (np.diff(blob["scores"]) >= 0).all()  # ascending, reference layout


def test_extract_cli(tmp_path, rng, net, monkeypatch):
    from PIL import Image

    from vo_tpu.runners import extract as cli

    p = tmp_path / "img.png"
    Image.fromarray(rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)).save(p)
    lst = tmp_path / "imgs.txt"
    lst.write_text(f"{p}\n")

    # route the CLI's checkpoint load to the random-init test net
    monkeypatch.setattr("vo_tpu.models.port_weights.load_pretrained",
                        lambda name: net)
    rc = cli.main(["--images", str(lst), "--min-size", "32", "--top-k", "64",
                   "--reliability-thr", "0", "--repeatability-thr", "0"])
    assert rc == 0
    blob = np.load(str(p) + ".r2d2")
    assert tuple(blob["imsize"]) == (80, 64)
    assert blob["keypoints"].shape[1] == 3
