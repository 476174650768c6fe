"""Native C++ loader vs the pure-Python reader: bit-exact decode, ordering, errors."""

import os
import subprocess

import numpy as np
import pytest

from vo_tpu.io.dataset import RGBDSequence
from vo_tpu.io.native import NativeRGBDSequence, native_available

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    """Small on-disk (*.png, *_depth.npy) sequence rendered via the synthetic world."""
    from PIL import Image

    from vo_tpu.utils.synthetic import render_sequence

    d = tmp_path_factory.mktemp("seq")
    K = np.array([[130.0, 0, 80.0], [0, 130.0, 60.0], [0, 0, 1]], np.float32)
    imgs, deps, _ = render_sequence(6, K, H=120, W=160)
    for i, (g, dep) in enumerate(zip(imgs, deps)):
        rgb = np.stack([g, g * 0.9, g * 0.8], -1).astype(np.uint8)
        Image.fromarray(rgb).save(d / f"{i:06d}.png")
        np.save(d / f"{i:06d}_depth.npy", dep)
    return str(d)


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not native_available():
        subprocess.run(["make", "-C", NATIVE_DIR], check=False, capture_output=True)


needs_native = pytest.mark.skipif(not native_available(),
                                  reason="libvoloader.so not built")


@needs_native
class TestNativeLoader:
    def test_bit_exact_vs_python(self, seq_dir):
        nat = NativeRGBDSequence.try_open(seq_dir)
        ref = RGBDSequence.from_dir(seq_dir)
        assert len(nat) == len(ref)
        for i, (rgb, dep) in enumerate(nat):
            rgb_ref, dep_ref = ref[i]
            assert np.array_equal(rgb, rgb_ref), i
            assert np.array_equal(dep, dep_ref), i

    def test_meta(self, seq_dir):
        nat = NativeRGBDSequence.try_open(seq_dir)
        assert (nat.H, nat.W) == (120, 160)
        assert len(nat) == 6
        nat.close()

    def test_empty_dir(self, tmp_path):
        assert NativeRGBDSequence.try_open(str(tmp_path)) is None

    def test_f8_depth(self, seq_dir, tmp_path):
        from PIL import Image

        rgb = np.zeros((8, 10, 3), np.uint8)
        Image.fromarray(rgb).save(tmp_path / "000000.png")
        np.save(tmp_path / "000000_depth.npy", np.ones((8, 10), np.float64) * 2.5)
        nat = NativeRGBDSequence.try_open(str(tmp_path))
        _, dep = nat.next_frame()
        assert dep.dtype == np.float32
        assert np.allclose(dep, 2.5)

    def test_corrupt_png_raises(self, tmp_path):
        (tmp_path / "000000.png").write_bytes(b"not a png at all")
        np.save(tmp_path / "000000_depth.npy", np.zeros((4, 4), np.float32))
        nat = NativeRGBDSequence.try_open(str(tmp_path))
        assert nat is None  # first-frame probe fails -> clean None
