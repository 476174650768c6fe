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
from vo_tpu.geometry.camera import depth_to_3d_at, unproject


@partial(jax.jit, static_argnames=("extractor",))
def extract_and_backproject(
    extractor,
    images: jnp.ndarray,   # (F, H, W) gray or (F, H, W, 3) RGB
    depths: jnp.ndarray,   # (F, H, W) f32 metres, or uint16 millimetres
    K: jnp.ndarray,
):
    """Batched features + per-frame keypoint 3D back-projection.

    The fused equivalent of extract_features_and_desc + cv2.rgbd.depthTo3d + gather
    (VisualOdometry_Stereo.py:249,96-97) for every frame at once.

    uint16 depths are millimetre-quantized (the streaming runner's reduced-bandwidth
    host->device transfer format) and are dequantized to metres here.
    """
    if depths.dtype == jnp.uint16:
        depths = depths.astype(jnp.float32) * 1e-3
    feats: Features = extractor(images)
    kp3d = jax.vmap(lambda d, kp: depth_to_3d_at(d, kp, K))(depths, feats.kp)
    return feats, kp3d


@partial(jax.jit, static_argnames=("extractor",))
def extract_and_kp_int16(extractor, images: jnp.ndarray):
    """Batched features + clipped integer pixel coords for host-side depth gather.

    The sparse-depth streaming mode ships depth host->device only at keypoint pixels
    (8 KB/frame instead of a ~1 MB depth map), so the host must gather depth at
    exactly the pixels ``depth_to_3d_at`` would touch: truncate-to-int then clip
    (geometry/camera.py:95-98, matching the reference's ``.astype(np.int32)`` gather,
    VisualOdometry_Stereo.py:96-97). int16 halves the device->host readback; image
    dims are far below 2^15.
    """
    feats: Features = extractor(images)
    H, W = images.shape[1], images.shape[2]
    xi = jnp.clip(feats.kp[..., 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(feats.kp[..., 1].astype(jnp.int32), 0, H - 1)
    return feats, jnp.stack([xi, yi], axis=-1).astype(jnp.int16)


@jax.jit
def backproject_sparse(kp: jnp.ndarray, z_u16mm: jnp.ndarray, K: jnp.ndarray):
    """(B, N, 2) float kp + (B, N) uint16 millimetre depth -> (B, N, 3) camera points.

    Device-side tail of the sparse-depth transfer: dequantize mm -> metres and
    unproject with the ORIGINAL float keypoint coordinates (same contract as
    ``depth_to_3d_at``). Zero depth yields z == 0, rejected by the engine's depth gate.
    """
    z = z_u16mm.astype(jnp.float32) * 1e-3
    return unproject(kp.astype(jnp.float32), z, K)


def gather_depth_u16mm(deps: np.ndarray, kp_i16: np.ndarray) -> np.ndarray:
    """Host-side sparse depth gather -> (B, N) uint16 millimetres.

    ``deps`` is the decoded per-chunk depth stack: float32 metres, or uint16
    millimetres straight from a ``<u2`` npy (then the gather is copy-free of any
    conversion). Rounds (not truncates) the mm quantization and zeroes NaNs so the
    quantized value is within 0.5 mm of the source (ADVICE r03 #1).
    """
    b = np.arange(deps.shape[0])[:, None]
    z = deps[b, kp_i16[..., 1].astype(np.int32), kp_i16[..., 0].astype(np.int32)]
    if z.dtype == np.uint16:
        return z
    z = np.nan_to_num(np.asarray(z, np.float32), nan=0.0, posinf=0.0, neginf=0.0)
    return np.round(np.clip(z, 0.0, 65.535) * 1000.0).astype(np.uint16)


@partial(jax.jit, static_argnames=("extractor", "baseline", "max_disp"))
def stereo_extract_and_backproject(
    extractor,
    left: jnp.ndarray,     # (F, H, W) rectified left grayscale
    right: jnp.ndarray,    # (F, H, W) rectified right grayscale
    K: jnp.ndarray,
    baseline: float,
    max_disp: int = 128,
):
    """True-stereo front-end: detect on the left image, measure depth by ZNCC block
    matching along the epipolar row (features/stereo.py), back-project.

    This is the configuration the reference NAMES stereo but never implements (its
    'Stereo' runner consumes precomputed depth maps, vo_stereo_runner.py:39-50; the
    notebook variant triangulates temporal matches). Validity folds in the stereo
    match gate, so textureless / occluded keypoints drop out before PnP.
    """
    from vo_tpu.features.stereo import stereo_depth_at
    from vo_tpu.geometry.camera import unproject

    feats: Features = extractor(left)
    lg = left.astype(jnp.float32)
    rg = right.astype(jnp.float32)
    depth, ok = jax.vmap(
        lambda l, r, kp, v: stereo_depth_at(l, r, kp, v, K, baseline,
                                            max_disp=max_disp)
    )(lg, rg, feats.kp, feats.valid)
    # Failed stereo matches yield z == 0 — rejected by the engine's depth gate,
    # exactly like an invalid pixel in a dense depth map (depth_to_3d_at), while
    # the keypoint stays available as a 2D observation for matching.
    kp3d = unproject(feats.kp.astype(jnp.float32), jnp.where(ok, depth, 0.0), K)
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


def save_vo_checkpoint(path: str, next_frame: int, poses, state) -> None:
    """Mid-run VO checkpoint: poses-so-far + the scan carry (VOState) as one npz —
    the resume story the reference lacks entirely (poses saved only at the very end,
    vo_stereo_runner.py:60).

    bfloat16 fields (the binary ±1 descriptors) are stored as uint16 bit patterns
    under a ``__bf16`` key suffix: plain numpy round-trips ml_dtypes arrays through
    npz as opaque void ('V2') dtypes, which JAX then rejects on load."""
    state_np = {}
    for i, x in enumerate(state):
        a = np.asarray(x)
        if a.dtype == jnp.bfloat16:
            state_np[f"state_{i}__bf16"] = a.view(np.uint16)
        else:
            state_np[f"state_{i}"] = a
    with open(path, "wb") as f:
        np.savez(f, next_frame=np.int64(next_frame), poses=np.asarray(poses),
                 **state_np)


def load_vo_checkpoint(path: str):
    """-> (next_frame, poses (n, 4, 4), VOState)."""
    from vo_tpu.engine.vo import VOState

    with np.load(path) as blob:
        fields = []
        for i in range(len(VOState._fields)):
            if f"state_{i}__bf16" in blob:
                fields.append(jnp.asarray(blob[f"state_{i}__bf16"]).view(jnp.bfloat16))
            else:
                a = blob[f"state_{i}"]
                if a.dtype.kind == "V":
                    # npz round-trips raw ml_dtypes arrays as opaque void records;
                    # only checkpoints from the pre-__bf16 save path look like this.
                    raise ValueError(
                        f"legacy/corrupt VO checkpoint {path!r}: field state_{i} has "
                        f"void dtype {a.dtype} (pre-bf16-fix format) — re-run the "
                        "producing job to regenerate the checkpoint")
                fields.append(jnp.asarray(a))
        return int(blob["next_frame"]), blob["poses"], VOState(*fields)


def _pack_chunk_results(poses, diag):
    """Flatten a chunk's (poses, VOStepDiagnostics) into ONE (B, 21) f32 array.

    The streaming runner reads results back once per chunk; fetching the tree
    leaf-by-leaf costs one link round-trip per leaf (6x the latency on a remote
    device). All fields are exactly representable in f32 (counts < 2^24, flags 0/1).

    Deliberately NOT jitted: the first chunk has B-1 rows (frame 0 seeds the state)
    and full chunks have B, so a jitted pack would compile once per distinct length
    (ADVICE r03 #3); as a handful of async reshape/concat dispatches it costs ~1 ms
    per chunk and compiles nothing."""
    B = poses.shape[0]
    cols = [poses.reshape(B, 16)] + [d.astype(jnp.float32).reshape(B, 1) for d in diag]
    return jnp.concatenate(cols, axis=1)


def _unpack_chunk_results(packed: np.ndarray):
    """Host-side inverse of ``_pack_chunk_results`` -> (poses (B,4,4), diagnostics)."""
    from vo_tpu.engine.vo import VOStepDiagnostics

    poses = packed[:, :16].reshape(-1, 4, 4)
    diag = VOStepDiagnostics(
        n_matches=packed[:, 16].astype(np.int32),
        n_inliers=packed[:, 17].astype(np.int32),
        accepted=packed[:, 18].astype(bool),
        promoted_keyframe=packed[:, 19].astype(bool),
        step_norm=packed[:, 20].astype(np.float32),
    )
    return poses, diag


def run_offline_vo_streaming(
    batches,
    n_frames: int,
    K: np.ndarray,
    vo_config: VOConfig = VOConfig(),
    extractor=None,
    prefetch: int = 2,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 0,
    resume_from: str | None = None,
    retain: str = "all",
    retain_stride: int = 4,
    transfer_depth: str = "float32",
):
    """Streaming pipeline: decode overlaps device compute, peak host RAM = O(batch).

    ``batches`` yields ``(start_index, imgs (B, H, W[, 3]) uint8/float, depths
    (B, H, W) f32)`` with a FIXED batch size (pad the tail by repeating the last
    frame — vo_tpu.io.dataset.RGBDSequence.iter_batches / io.native's equivalent do).
    A producer thread runs the (host) decode while the device extracts AND scans the
    previous batch — the engine runs incrementally per chunk (VOEngine.run_chunk), so
    the double-buffering covers the whole compute, not just extraction.

    Mid-run checkpointing: with ``checkpoint_path`` set, every ``checkpoint_every``
    frames the poses-so-far and the scan carry are written; ``resume_from`` restores
    them and skips already-processed frames (decode of skipped batches still happens —
    the loaders are sequential).

    Feature retention: ``retain="all"`` keeps every frame's fixed-budget features
    (~1-2 MB/frame at 2048 kp — O(sequence) HBM); ``retain="sparse"`` keeps only
    promoted keyframes, every ``retain_stride``-th frame, and the endpoints — the
    frames refinement (``vo_tpu.engine.refine`` / loop closure) actually consumes —
    so --refine runs on KITTI-length sequences in bounded memory.

    Returns (poses, diag, (feats, kp3d, feat_rows)); ``feat_rows`` is the frame id of
    each retained feature row (``arange(n_frames)`` for retain="all"). Pixels are
    never kept.

    ``transfer_depth="uint16mm"`` ships depth host->device as millimetre-quantized
    uint16 (dequantized on device by ``extract_and_backproject``) — half the bytes of
    f32 with uniform 1 mm precision up to 65.5 m; deeper pixels clamp, which is
    loss-free for any depth gate <= 65 m (the engine's is 50 m). Keep "float32" when
    valid depths beyond 65 m matter.

    ``transfer_depth="sparse"`` never ships the depth map at all: images go up, the
    extractor's clipped integer keypoint pixels come back (int16, ~8 KB/frame), the
    host gathers depth at exactly those pixels from the decoded map it already holds,
    and only (B, max_kp) uint16-mm values go up (~4 KB/frame) —
    ``backproject_sparse`` unprojects on device. Semantically identical to
    "uint16mm" (same truncate-clip-gather as ``depth_to_3d_at``, same mm
    quantization) but ~230x fewer depth bytes over the host->device link; on a
    bandwidth-starved link (the dev tunnel moves ~35 MB/s) this is the difference
    between transfer-bound and decode-bound streaming. The loaders may yield depth
    as float32 metres or raw uint16 millimetres (``<u2`` npy) in this mode.

    Host->device staging happens on the producer thread and the per-chunk
    device->host sync (poses + diagnostics) is deferred one chunk, so decode, PCIe/
    link transfer, device compute, and result readback all overlap (a high-latency
    device link otherwise serializes the loop on a dozen tiny syncs per chunk).
    """
    import queue
    import threading

    if retain not in ("all", "sparse"):
        raise ValueError(f"retain must be 'all' or 'sparse', got {retain!r}")
    if transfer_depth not in ("float32", "uint16mm", "sparse"):
        raise ValueError(f"transfer_depth must be 'float32', 'uint16mm' or 'sparse', "
                         f"got {transfer_depth!r}")
    if extractor is None:
        extractor = OrbLikeExtractor()
    Kj = jnp.asarray(K, jnp.float32)
    engine = VOEngine(vo_config)

    q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))
    err: list[BaseException] = []

    def producer():
        """Decode-side thread: also stages each batch into device memory so the
        host->device copy overlaps the consumer's compute and readback. In sparse
        mode the depth map never leaves the host — it rides the queue as a numpy
        array for the consumer's keypoint gather."""
        try:
            for start, imgs, deps in batches:
                if transfer_depth == "sparse":
                    q.put((start, jax.device_put(imgs), np.asarray(deps)))
                    continue
                if transfer_depth == "uint16mm":
                    deps = np.asarray(deps)
                    if deps.dtype != np.uint16:  # already-quantized native u16mm
                        deps = np.nan_to_num(deps.astype(np.float32), nan=0.0,
                                             posinf=0.0, neginf=0.0)
                        deps = np.round(np.clip(deps, 0.0, 65.535)
                                        * 1000.0).astype(np.uint16)
                else:
                    deps = np.asarray(deps, np.float32)
                q.put((start, jax.device_put(imgs), jax.device_put(deps)))
        except BaseException as e:  # surface decode errors on the consumer side
            err.append(e)
        finally:
            q.put(None)

    threading.Thread(target=producer, daemon=True).start()

    state = None
    next_frame = 0
    poses_list = []
    if resume_from:
        next_frame, poses_done, state = load_vo_checkpoint(resume_from)
        poses_list.append(np.asarray(poses_done))

    feat_chunks = []
    feat_rows_list = []
    diag_chunks = []
    since_ckpt = 0

    def retain_chunk(feats, kp3d, start, promoted):
        """Keep this chunk's feature rows per the retention policy (promoted flags
        cover processed rows; zeros for resume-skipped ones)."""
        B = len(promoted)
        fid = np.arange(start, start + B)
        keep = fid < n_frames              # tail padding rows are never real frames
        if retain == "sparse":
            keep &= (promoted | (fid % retain_stride == 0) | (fid == n_frames - 1))
        rows = np.nonzero(keep)[0]
        if len(rows):
            feat_chunks.append((jax.tree.map(lambda a: a[rows], feats), kp3d[rows]))
            feat_rows_list.append(fid[rows])

    # One-chunk software pipeline: the readback of chunk i happens after chunk i+1's
    # device work is enqueued, so link latency hides under compute. Results come back
    # as ONE packed array per chunk (a tree readback costs one round-trip per leaf).
    pending = None   # (start, B, lo, n_real, end, feats, kp3d, packed_dev, state_after)

    def flush(packed_np=None):
        """Consume the pending chunk's results. ``packed_np`` carries the packed
        array when the caller already fetched it (sparse mode piggybacks it on the
        next chunk's keypoint readback — one link round trip instead of two)."""
        nonlocal pending, since_ckpt
        if pending is None:
            return
        start, B, lo, n_real, end, feats, kp3d, packed_dev, st = pending
        pending = None
        if packed_np is None:
            packed_np = np.asarray(packed_dev)
        poses_np, diag_np = _unpack_chunk_results(packed_np)
        poses_list.append(poses_np[:n_real])
        diag_chunks.append(jax.tree.map(lambda a: a[:n_real], diag_np))
        promoted = np.zeros(B, bool)
        promoted[lo:lo + n_real] = diag_chunks[-1].promoted_keyframe
        retain_chunk(feats, kp3d, start, promoted)
        since_ckpt += n_real
        if checkpoint_path and checkpoint_every and since_ckpt >= checkpoint_every:
            save_vo_checkpoint(checkpoint_path, end,
                               np.concatenate(poses_list), st)
            since_ckpt = 0

    while True:
        item = q.get()
        if item is None:
            break
        start, imgs_d, deps_d = item
        if transfer_depth == "sparse":
            # Blocking on the int16 kp readback syncs THIS chunk's extraction while
            # the previous chunk's engine step (dispatched last iteration) is already
            # queued behind it — the round-trip hides under that compute. The
            # previous chunk's packed results ride the same device_get, so the loop
            # pays ONE device->host sync per chunk, not two.
            feats, kp_i16 = extract_and_kp_int16(extractor, imgs_d)
            if pending is not None:
                kp_np, packed_np = jax.device_get((kp_i16, pending[7]))
                flush(packed_np)
            else:
                kp_np = jax.device_get(kp_i16)
            z16 = gather_depth_u16mm(deps_d, kp_np)
            kp3d = backproject_sparse(feats.kp, jax.device_put(z16), Kj)
        else:
            feats, kp3d = extract_and_backproject(extractor, imgs_d, deps_d, Kj)

        B = feats.kp.shape[0]
        end = min(start + B, n_frames)
        if end <= next_frame:
            flush()                       # keep feat_chunks in frame order
            retain_chunk(feats, kp3d, start, np.zeros(B, bool))
            continue                      # resumed past this chunk entirely
        lo = max(next_frame - start, 0)   # first unprocessed row in this chunk

        if state is None:
            state = engine.initial_state(feats.kp[0], feats.desc[0],
                                         feats.valid[0], kp3d[0])
            poses_list.append(np.asarray(state.cur_pose)[None])
            next_frame = 1
            lo = 1
            if end <= 1:
                retain_chunk(feats, kp3d, start, np.zeros(B, bool))
                continue
        ids = jnp.arange(start + lo, start + B, dtype=jnp.int32)
        state, poses, diag = engine.run_chunk(
            state, feats.kp[lo:], feats.desc[lo:], feats.valid[lo:], kp3d[lo:],
            ids, Kj)
        n_real = end - (start + lo)       # drop tail padding rows
        packed = _pack_chunk_results(poses, diag)
        flush()                           # sync chunk i-1 while chunk i computes
        pending = (start, B, lo, n_real, end, feats, kp3d, packed, state)
        next_frame = end

    flush()
    if err:
        raise err[0]
    if not feat_chunks:
        raise ValueError("empty batch stream")
    if checkpoint_path:
        save_vo_checkpoint(checkpoint_path, next_frame,
                           np.concatenate(poses_list), state)

    feats = Features(*(jnp.concatenate([c[0][i] for c in feat_chunks])
                       for i in range(4)))
    kp3d = jnp.concatenate([c[1] for c in feat_chunks])
    feat_rows = np.concatenate(feat_rows_list)
    poses = np.concatenate(poses_list)[:n_frames]
    diag = jax.tree.map(lambda *xs: np.concatenate(xs), *diag_chunks)
    # On resume the pre-checkpoint diagnostics are gone; front-pad with neutral rows
    # so consumers (refine keyframe selection) still see one row per frame 1..F-1.
    missing = (n_frames - 1) - diag.accepted.shape[0]
    if missing > 0:
        diag = jax.tree.map(
            lambda a: np.concatenate([np.zeros((missing,) + a.shape[1:], a.dtype), a]),
            diag)
    return poses, diag, (feats, kp3d, feat_rows)
