"""ctypes bindings for the native prefetching RGB-D loader (native/vo_loader.cpp).

Falls back cleanly when the shared library hasn't been built; callers use
``native_available()`` / ``NativeRGBDSequence.try_open`` and keep the pure-Python
``RGBDSequence`` as the portable path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libvoloader.so"),
    os.path.join(os.path.dirname(__file__), "libvoloader.so"),
]

_lib = None
_build_attempted = False


def _ensure_built() -> None:
    """Build libvoloader.so from source if it is missing (one `make`, ~2 s, -lz only).

    Round 2 shipped a bench whose IO numbers silently fell back to the PIL path
    because nothing ever built the library in the bench environment; building on
    demand makes the native loader the default measured path everywhere the
    toolchain exists. Failures are swallowed — callers still see the clean
    ``native_available() == False`` fallback."""
    global _build_attempted
    if _build_attempted:
        return
    _build_attempted = True
    src_dir = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "native"))
    src = os.path.join(src_dir, "vo_loader.cpp")
    if not os.path.exists(src):
        return
    # Run make even when the .so exists: the Makefile is dependency-correct, so
    # this is a no-op when fresh and rebuilds a stale library left over from an
    # older vo_loader.cpp (whose dlsym would otherwise fail on newer symbols).
    try:
        subprocess.run(["make", "-C", src_dir], check=True, timeout=120,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except Exception:
        pass


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    _ensure_built()
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.vol_open.restype = ctypes.c_void_p
            lib.vol_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
            lib.vol_meta.restype = ctypes.c_int
            lib.vol_meta.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_int)] * 3
            lib.vol_next.restype = ctypes.c_int
            lib.vol_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            try:
                lib.vol_next2.restype = ctypes.c_int
                lib.vol_next2.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                          ctypes.c_void_p, ctypes.c_void_p]
            except AttributeError:
                # Stale pre-v2 build that make couldn't refresh (e.g. read-only
                # checkout): degrade to the pure-Python loader instead of crashing.
                continue
            lib.vol_close.restype = None
            lib.vol_close.argtypes = [ctypes.c_void_p]
            _lib = lib
            return lib
    return None


def native_available() -> bool:
    return _load_lib() is not None


class NativeRGBDSequence:
    """Streaming reader over (*.png, *_depth.npy) pairs with C++ decode + prefetch."""

    def __init__(self, handle, lib, n_frames, H, W):
        self._h = handle
        self._lib = lib
        self.n_frames = n_frames
        self.H = H
        self.W = W
        self._emitted = 0

    @classmethod
    def try_open(cls, img_dir: str, prefetch_depth: int = 8,
                 n_threads: int = 0) -> "NativeRGBDSequence | None":
        lib = _load_lib()
        if lib is None:
            return None
        h = lib.vol_open(img_dir.encode(), prefetch_depth, n_threads)
        if not h:
            return None
        n = ctypes.c_int()
        H = ctypes.c_int()
        W = ctypes.c_int()
        lib.vol_meta(h, ctypes.byref(n), ctypes.byref(H), ctypes.byref(W))
        return cls(h, lib, n.value, H.value, W.value)

    def __len__(self):
        return self.n_frames

    def next_frame(self) -> tuple[np.ndarray, np.ndarray] | None:
        """Sequential read: (rgb uint8 (H, W, 3), depth f32 (H, W)) or None at end.

        Raises RuntimeError on a decode failure (corrupt frame)."""
        if self._emitted >= self.n_frames:
            return None
        rgb = np.empty((self.H, self.W, 3), np.uint8)
        depth = np.empty((self.H, self.W), np.float32)
        rc = self._lib.vol_next(
            self._h,
            rgb.ctypes.data_as(ctypes.c_void_p),
            depth.ctypes.data_as(ctypes.c_void_p),
        )
        if rc == -2:
            return None
        if rc != 0:
            raise RuntimeError(f"native loader: decode failure rc={rc} "
                               f"at frame {self._emitted}")
        self._emitted += 1
        return rgb, depth

    def __iter__(self):
        while True:
            fr = self.next_frame()
            if fr is None:
                return
            yield fr

    def iter_batches(self, batch: int, limit: int = 0, gray: bool = False,
                     depth: str = "f32"):
        """Yield (start, imgs (B, H, W[, 3]) uint8, depth (B, H, W)) fixed-size
        batches; the tail is padded by repeating the final frame (same contract as
        RGBDSequence.iter_batches) so jitted extraction sees one static shape. The C++
        prefetch pool keeps decoding ahead while the caller computes.

        ``gray=True`` emits single-channel uint8 (3x fewer image bytes, BT.601 luma
        for colour sources) and ``depth="u16mm"`` emits rounded uint16 millimetres
        (half of f32) — the minimal-byte formats for a bandwidth-bound consumer
        (e.g. the sparse-depth streaming runner on a thin device link). The C++ side
        writes straight into the batch buffers: no per-frame Python arrays, no
        np.stack copies."""
        if depth not in ("f32", "u16mm"):
            raise ValueError(f"depth must be 'f32' or 'u16mm', got {depth!r}")
        if self._emitted >= self.n_frames:
            return
        n = self.n_frames if not limit else min(limit, self.n_frames)
        img_fmt = 1 if gray else 0
        depth_fmt = 1 if depth == "u16mm" else 0
        ishape = (batch, self.H, self.W) if gray else (batch, self.H, self.W, 3)
        # Start from the shared sequential cursor so the yielded `start` is always
        # an ABSOLUTE frame index even if the caller consumed frames via
        # next_frame() first — the streaming runner uses it for pose bookkeeping.
        start = self._emitted
        while start < n:
            imgs = np.empty(ishape, np.uint8)
            deps = np.empty((batch, self.H, self.W),
                            np.uint16 if depth_fmt else np.float32)
            want = min(batch, n - start)
            got = 0
            for i in range(want):
                if self._emitted >= self.n_frames:
                    break
                rc = self._lib.vol_next2(
                    self._h, img_fmt, depth_fmt,
                    imgs[i].ctypes.data_as(ctypes.c_void_p),
                    deps[i].ctypes.data_as(ctypes.c_void_p))
                if rc == -2:
                    break
                if rc != 0:
                    raise RuntimeError(f"native loader: decode failure rc={rc} "
                                       f"at frame {self._emitted}")
                self._emitted += 1
                got += 1
            if got == 0:
                return
            for i in range(got, batch):  # pad tail by repeating the final frame
                imgs[i] = imgs[got - 1]
                deps[i] = deps[got - 1]
            yield start, imgs, deps
            start += batch

    def close(self):
        if self._h:
            self._lib.vol_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
