"""End-to-end offline VO pipeline: batched extraction + scan engine + pose chain.

This is the TPU-shaped version of the reference's offline loop
(vo_stereo_runner.py:27-60): instead of a frame-at-a-time Python loop calling OpenCV,
extraction runs batched over frames (vmap; shard the batch axis over devices for DP),
keypoint back-projection is a fused gather, and the sequential part is one lax.scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vo_tpu.engine.vo import VOConfig, VOEngine
from vo_tpu.features.extractor import OrbLikeExtractor, Features
from vo_tpu.geometry.camera import depth_to_3d_at


@partial(jax.jit, static_argnames=("extractor",))
def extract_and_backproject(
    extractor,
    images: jnp.ndarray,   # (F, H, W) gray or (F, H, W, 3) RGB
    depths: jnp.ndarray,   # (F, H, W)
    K: jnp.ndarray,
):
    """Batched features + per-frame keypoint 3D back-projection.

    The fused equivalent of extract_features_and_desc + cv2.rgbd.depthTo3d + gather
    (VisualOdometry_Stereo.py:249,96-97) for every frame at once.
    """
    feats: Features = extractor(images)
    kp3d = jax.vmap(lambda d, kp: depth_to_3d_at(d, kp, K))(depths, feats.kp)
    return feats, kp3d


def run_offline_vo(
    images: np.ndarray,
    depths: np.ndarray,
    K: np.ndarray,
    vo_config: VOConfig = VOConfig(),
    extractor=None,
    extraction_batch: int = 0,
    return_features: bool = False,
):
    """Full pipeline on in-memory arrays. Returns (poses (F, 4, 4) np, diagnostics)
    — plus (feats, kp3d) when ``return_features`` (for BA refinement / viz).

    extraction_batch > 0 chunks the extraction pass to bound peak memory for long
    sequences (the scan still sees the whole sequence).
    """
    if extractor is None:
        extractor = OrbLikeExtractor()
    K = jnp.asarray(K, jnp.float32)
    images = jnp.asarray(images)
    depths = jnp.asarray(depths, jnp.float32)

    if extraction_batch and images.shape[0] > extraction_batch:
        chunks = []
        for s in range(0, images.shape[0], extraction_batch):
            chunks.append(extract_and_backproject(
                extractor, images[s:s + extraction_batch], depths[s:s + extraction_batch], K))
        feats = Features(*(jnp.concatenate([c[0][i] for c in chunks]) for i in range(4)))
        kp3d = jnp.concatenate([c[1] for c in chunks])
    else:
        feats, kp3d = extract_and_backproject(extractor, images, depths, K)

    engine = VOEngine(vo_config)
    poses, diag = engine.run_sequence(feats.kp, feats.desc, feats.valid, kp3d, K)
    out = (np.asarray(poses), jax.tree.map(np.asarray, diag))
    return out + ((feats, kp3d),) if return_features else out


def run_offline_vo_streaming(
    batches,
    n_frames: int,
    K: np.ndarray,
    vo_config: VOConfig = VOConfig(),
    extractor=None,
    prefetch: int = 2,
):
    """Streaming pipeline: decode overlaps device compute, peak host RAM = O(batch).

    ``batches`` yields ``(start_index, imgs (B, H, W[, 3]) uint8/float, depths
    (B, H, W) f32)`` with a FIXED batch size (pad the tail by repeating the last
    frame — vo_tpu.io.dataset.RGBDSequence.iter_batches / io.native's equivalent do).
    A producer thread runs the (host) decode while the device extracts the previous
    batch — the double-buffering the round-1 runner lacked (it drained the whole
    sequence into one np.stack first, peak RAM = whole sequence).

    Returns (poses, diag, (feats, kp3d)); only the fixed-budget features are kept
    (~2 MB/frame at 2048 kp), never the frames.
    """
    import queue
    import threading

    if extractor is None:
        extractor = OrbLikeExtractor()
    Kj = jnp.asarray(K, jnp.float32)

    q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))
    err: list[BaseException] = []

    def producer():
        try:
            for item in batches:
                q.put(item)
        except BaseException as e:  # surface decode errors on the consumer side
            err.append(e)
        finally:
            q.put(None)

    threading.Thread(target=producer, daemon=True).start()

    chunks = []
    while True:
        item = q.get()
        if item is None:
            break
        start, imgs, deps = item
        chunks.append(extract_and_backproject(
            extractor, jnp.asarray(imgs), jnp.asarray(deps, jnp.float32), Kj))
    if err:
        raise err[0]
    if not chunks:
        raise ValueError("empty batch stream")

    feats = Features(*(jnp.concatenate([c[0][i] for c in chunks])[:n_frames]
                       for i in range(4)))
    kp3d = jnp.concatenate([c[1] for c in chunks])[:n_frames]

    engine = VOEngine(vo_config)
    poses, diag = engine.run_sequence(feats.kp, feats.desc, feats.valid, kp3d, Kj)
    return np.asarray(poses), jax.tree.map(np.asarray, diag), (feats, kp3d)
