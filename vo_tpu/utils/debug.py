"""Interactive debug helpers — counterpart of Utils/debug_utils.py:5-14.

The reference's helpers are a blocking ``input()`` breakpoint and a ``cv2.imshow``
viewer with 'q'-to-exit. Headless TPU hosts have no display, so ``display_image``
writes a PNG (and only blocks on input when a TTY is attached and ``block=True``);
``breakpoint_prompt`` is the same guarded-input gate.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def breakpoint_prompt(message: str = "breakpoint") -> str:
    """Blocking prompt like the reference's ``breakpoint()`` (debug_utils.py:5-7),
    but a no-op when stdin is not a TTY (CI / remote runs)."""
    if not sys.stdin.isatty():
        return ""
    return input(f"{message} — press Enter to continue (or type a note): ")


def display_image(image, name: str = "debug", out_dir: str = "/tmp/vo_tpu_debug",
                  block: bool = False) -> str:
    """Save an image for inspection; optionally pause (debug_utils.py:9-14 behavior
    without the cv2 window). Accepts (H, W) or (H, W, 3), float or uint8, device or
    host arrays. Returns the written path."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    im = np.asarray(image)
    if im.dtype != np.uint8:
        lo, hi = float(im.min()), float(im.max())
        if hi <= 1.0 and lo >= 0.0:
            im = im * 255.0
        im = np.clip(im, 0, 255).astype(np.uint8)
    if im.ndim == 2:
        im = np.stack([im] * 3, -1)
    path = os.path.join(out_dir, f"{name}.png")
    Image.fromarray(im).save(path)
    if block:
        breakpoint_prompt(f"wrote {path}")
    return path
