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

    def test_gray_and_u16mm_formats(self, seq_dir):
        """vol_next2's minimal-byte emission: gray = BT.601 luma of the RGB decode,
        u16-mm depth = round(clip(d)*1000) within 0.5 mm (+1 ulp) of f32."""
        nat = NativeRGBDSequence.try_open(seq_dir)
        ref = RGBDSequence.from_dir(seq_dir)
        for start, imgs, deps in nat.iter_batches(4, gray=True, depth="u16mm"):
            assert imgs.ndim == 3 and imgs.dtype == np.uint8
            assert deps.dtype == np.uint16
            for i in range(imgs.shape[0]):
                fi = min(start + i, len(ref) - 1)
                rgb_ref, dep_ref = ref[fi]
                luma = ((299 * rgb_ref[..., 0].astype(np.uint32)
                         + 587 * rgb_ref[..., 1].astype(np.uint32)
                         + 114 * rgb_ref[..., 2].astype(np.uint32) + 500) // 1000)
                assert np.array_equal(imgs[i], luma.astype(np.uint8)), fi
                err = np.abs(deps[i] / 1000.0 - np.clip(dep_ref, 0, 65.535))
                assert err.max() <= 0.51e-3, fi
        nat.close()

    def test_u16mm_npy_on_disk(self, tmp_path):
        """<u2 (millimetre) depth npy round-trips through both emission formats and
        through the pure-Python reader (which converts to metres)."""
        from PIL import Image

        dmm = (np.arange(80, dtype=np.uint16).reshape(8, 10) * 100 + 7)
        Image.fromarray(np.zeros((8, 10, 3), np.uint8)).save(tmp_path / "000000.png")
        np.save(tmp_path / "000000_depth.npy", dmm)
        nat = NativeRGBDSequence.try_open(str(tmp_path))
        _, imgs, deps = next(nat.iter_batches(1, gray=True, depth="u16mm"))
        assert np.array_equal(deps[0], dmm)  # pure memcpy path
        nat.close()
        nat = NativeRGBDSequence.try_open(str(tmp_path))
        _, dep_f32 = nat.next_frame()
        np.testing.assert_allclose(dep_f32, dmm.astype(np.float32) * 1e-3)
        nat.close()
        _, dep_py = RGBDSequence.from_dir(str(tmp_path))[0]
        np.testing.assert_allclose(dep_py, dmm.astype(np.float32) * 1e-3)

    def test_corrupt_png_raises(self, tmp_path):
        (tmp_path / "000000.png").write_bytes(b"not a png at all")
        np.save(tmp_path / "000000_depth.npy", np.zeros((4, 4), np.float32))
        nat = NativeRGBDSequence.try_open(str(tmp_path))
        assert nat is None  # first-frame probe fails -> clean None
