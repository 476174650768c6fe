"""RGB-D sequence reader — same on-disk contract as the reference's offline loop.

The reference globs ``*.png`` (RGB, read BGR then converted) and ``*_depth.npy`` (metric
depth), sorted and zipped pairwise (vo_stereo_runner.py:38-39,49-54). This reader yields
RGB uint8 + float32 depth, supports batched prefetch for feeding the batched TPU
extractor, and optionally uses the native C++ loader (vo_tpu.io.native) when built.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import numpy as np


def _read_png_rgb(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def load_rgbd_pair(png_path: str, depth_path: str) -> tuple[np.ndarray, np.ndarray]:
    d = np.load(depth_path)
    if d.dtype == np.uint16:  # millimetre-quantized depth (half the disk bytes)
        d = d.astype(np.float32) * 1e-3
    else:
        d = d.astype(np.float32)
    return _read_png_rgb(png_path), d


@dataclass
class RGBDSequence:
    """Sorted (*.png, *_depth.npy) pairs from a directory, same globbing as the reference."""

    image_files: list
    depth_files: list

    @classmethod
    def from_dir(cls, img_dir: str) -> "RGBDSequence":
        pngs = sorted(glob.glob(os.path.join(img_dir, "*.png")))
        deps = sorted(glob.glob(os.path.join(img_dir, "*_depth.npy")))
        return cls(image_files=pngs, depth_files=deps)

    def __len__(self) -> int:
        return min(len(self.image_files), len(self.depth_files))

    def __getitem__(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        return load_rgbd_pair(self.image_files[i], self.depth_files[i])

    def iter_batches(self, batch: int, limit: int = 0):
        """Yield (idx0, rgb [B,H,W,3] uint8, depth [B,H,W] f32) contiguous batches.

        The last batch is padded by repeating the final frame so shapes stay static for
        the jitted extractor; the caller trims by sequence length.
        """
        n = len(self) if not limit else min(limit, len(self))
        for start in range(0, n, batch):
            idxs = list(range(start, min(start + batch, n)))
            pad = batch - len(idxs)
            idxs = idxs + [n - 1] * pad
            imgs, deps = zip(*(self[i] for i in idxs))
            yield start, np.stack(imgs), np.stack(deps)
