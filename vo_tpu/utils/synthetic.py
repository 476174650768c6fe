"""Synthetic textured RGB-D world renderer — exact ground truth for end-to-end tests.

The reference has no test data beyond a committed trajectory; KITTI imagery is not
shipped. This renderer produces geometrically-consistent (image, depth) pairs from any
camera pose over a multi-plane textured world, so the full
extract -> match -> PnP -> chain pipeline can be scored against exact ground truth
(SURVEY.md §4 "create the test pyramid the reference lacks").

World: ground plane + two side walls + a far wall (non-coplanar scene, so PnP's DLT is
well-conditioned). Texture: seeded band-limited sum of sinusoids — smooth but rich in
Harris corners. Pure numpy on purpose: runs at fixture-build time, keeps the device free.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class Plane:
    p0: np.ndarray      # a point on the plane
    n: np.ndarray       # unit normal (pointing toward typical viewers)
    tex_seed: int
    fine_amp: float = 0.0   # amplitude of added fine-scale octaves (0 = off)

    def texture(self, u: np.ndarray, v: np.ndarray,
                sigma: np.ndarray | None = None) -> np.ndarray:
        """Band-limited texture; ``sigma`` is the per-pixel world-space footprint.

        The base band (0.3-6 rad/unit) is evaluated as-is — smooth enough that a
        pixel never undersamples it at the distances these workloads view it, and
        bit-identical with and without a sigma map (existing workload caches stay
        valid). The optional fine band (6-300 rad/unit, ``fine_amp``) is what makes
        surfaces corner-rich when they fill the frame from 1-4 m — a close pass at
        a wall otherwise sees a locally-linear ramp and Harris goes negative
        (edge-like) over the whole image, zeroing detection. Fine components are
        ANALYTICALLY anti-aliased: a Gaussian pixel footprint multiplies component
        amplitude by exp(-|w|^2 sigma^2 / 2), the exact convolution of a sinusoid
        with a Gaussian — so close views get crisp 2D structure while distant views
        get the identical smooth base texture instead of point-sampling noise.
        """
        rng = np.random.default_rng(self.tex_seed)
        val = np.zeros_like(u)
        for _ in range(40):
            w = rng.uniform(0.3, 6.0, 2)
            phase = rng.uniform(0, 2 * np.pi)
            amp = rng.uniform(5, 25)
            val = val + amp * np.sin(w[0] * u + w[1] * v + phase)
        if self.fine_amp > 0.0:
            sig = np.zeros_like(u) if sigma is None else sigma
            # Evaluate only where a fine component survives the footprint filter —
            # the band starts at 20 rad/unit so it is strictly close-range detail
            # (dead beyond sigma ~ 0.15 unit/px) and distant frames skip it.
            live = sig < 0.15
            if np.any(live):
                us, vs, ss = u[live], v[live], sig[live]
                fine = np.zeros_like(us)
                for _ in range(16):
                    w = np.exp(rng.uniform(np.log(20.0), np.log(300.0), 2))
                    phase = rng.uniform(0, 2 * np.pi)
                    amp = rng.uniform(4, 12) * self.fine_amp
                    att = np.exp(-0.5 * (w @ w) * ss * ss)
                    fine = fine + amp * att * np.sin(w[0] * us + w[1] * vs + phase)
                val[live] += fine
        return 128.0 + val * 0.45


def default_world(seed: int = 8214, half_width: float = 8.0,
                  far_z: float = 240.0, fine_amp: float = 0.0) -> list[Plane]:
    """Corridor world. ``far_z`` must exceed any trajectory's final z plus margin —
    round 2 shipped a bench whose camera drove *through* the far wall (then at 120 m)
    and rendered frames with zero valid depth; callers should assert
    ``depth_valid_fraction`` on every rendered frame (bench.py does).

    ``fine_amp`` > 0 adds close-range texture octaves (see Plane.texture) — use for
    trajectories that pass within a few metres of a surface (U-turns)."""
    return [
        Plane(p0=np.array([0.0, 1.6, 0.0]), n=np.array([0.0, -1.0, 0.0]), tex_seed=seed + 1, fine_amp=fine_amp),   # ground
        Plane(p0=np.array([-half_width, 0.0, 0.0]), n=np.array([1.0, 0.0, 0.0]), tex_seed=seed + 2, fine_amp=fine_amp),   # left wall
        Plane(p0=np.array([half_width, 0.0, 0.0]), n=np.array([-1.0, 0.0, 0.0]), tex_seed=seed + 3, fine_amp=fine_amp),   # right wall
        Plane(p0=np.array([0.0, 0.0, far_z]), n=np.array([0.0, 0.0, -1.0]), tex_seed=seed + 4, fine_amp=fine_amp),  # far wall
    ]


def depth_valid_fraction(depth: np.ndarray, lo: float = 0.0, hi: float = 50.0) -> np.ndarray:
    """Fraction of pixels whose depth passes the engine's PnP gate (VOConfig
    min/max_point_depth — reference gate VisualOdometry_Stereo.py:100). Computed over
    the trailing two axes, so it maps over a (F, H, W) stack."""
    return ((depth > lo) & (depth < hi)).mean(axis=(-2, -1))


def _plane_axes(n: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    a = np.array([1.0, 0.0, 0.0]) if abs(n[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    u = np.cross(n, a)
    u /= np.linalg.norm(u)
    v = np.cross(n, u)
    return u, v


def render_rgbd(
    T_wc: np.ndarray,
    K: np.ndarray,
    H: int = 240,
    W: int = 320,
    world: list[Plane] | None = None,
    max_depth: float = 260.0,   # must exceed default_world far_z so the wall renders
) -> tuple[np.ndarray, np.ndarray]:
    """Ray-cast the plane world from camera-to-world pose ``T_wc``.

    Returns (gray (H, W) float32 in [0,255], depth (H, W) float32 camera-frame z).
    """
    if world is None:
        world = default_world()
    Kinv = np.linalg.inv(K)
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1)            # (H, W, 3)
    dirs_cam = pix @ Kinv.T                                         # z-component == 1
    R_wc = T_wc[:3, :3]
    o = T_wc[:3, 3]
    dirs_w = dirs_cam @ R_wc.T                                      # (H, W, 3)

    depth = np.full((H, W), np.inf)
    img = np.full((H, W), 40.0)
    fx = float(K[0, 0])
    dir_norm = np.linalg.norm(dirs_w, axis=-1)
    for pl in world:
        denom = dirs_w @ pl.n
        denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
        t = ((pl.p0 - o) @ pl.n) / denom                            # (H, W); == z_cam
        hit = (t > 0.1) & (t < max_depth) & (t < depth)
        X = o + t[..., None] * dirs_w
        ax_u, ax_v = _plane_axes(pl.n)
        u = (X - pl.p0) @ ax_u
        v = (X - pl.p0) @ ax_v
        # World-space pixel footprint on the plane: range x angular pixel size,
        # stretched by grazing incidence — drives the texture's analytic AA.
        cos_inc = np.clip(np.abs(denom) / dir_norm, 0.2, 1.0)
        sigma = np.abs(t) * dir_norm / fx / cos_inc
        tex = pl.texture(u, v, sigma=sigma)
        img = np.where(hit, tex, img)
        depth = np.where(hit, t, depth)

    depth = np.where(np.isinf(depth), 0.0, depth)                   # 0 = invalid, like KITTI npy
    return np.clip(img, 0, 255).astype(np.float32), depth.astype(np.float32)


def drive_trajectory(n_frames: int, step: float = 0.8, yaw_rate: float = 0.004) -> np.ndarray:
    """(F, 4, 4) camera-to-world poses: forward motion with a slow constant turn."""
    poses = np.zeros((n_frames, 4, 4))
    yaw = 0.0
    pos = np.zeros(3)
    for i in range(n_frames):
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        poses[i, :3, :3] = R
        poses[i, :3, 3] = pos
        poses[i, 3, 3] = 1.0
        pos = pos + R @ np.array([0.0, 0.0, step])
        yaw += yaw_rate * step
    return poses


def slalom_trajectory(n_frames: int, step: float = 0.8, yaw_amp: float = 0.2,
                      period_m: float = 64.0) -> np.ndarray:
    """(F, 4, 4) camera-to-world poses: forward drive with a sinusoidal heading.

    Unlike ``drive_trajectory``'s constant turn (whose arc walks the camera out of any
    finite-width corridor — the round-2 bench bug), the heading here is
    ``yaw(s) = yaw_amp * sin(2*pi*s/period_m)`` over arc length s, so the lateral
    excursion is bounded by ~``2*yaw_amp*period_m/(2*pi)`` (≈4.1 m at the defaults)
    while still exercising real rotation (±yaw_amp rad, ~1.1 deg/m peak turn rate —
    KITTI-like) for the seg-rot metric.
    """
    poses = np.zeros((n_frames, 4, 4))
    pos = np.zeros(3)
    for i in range(n_frames):
        yaw = yaw_amp * np.sin(2 * np.pi * (i * step) / period_m)
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        poses[i, :3, :3] = R
        poses[i, :3, 3] = pos
        poses[i, 3, 3] = 1.0
        pos = pos + R @ np.array([0.0, 0.0, step])
    return poses


def loop_trajectory(out_frames: int = 50, turn_frames: int = 26,
                    step: float = 0.8, turn_step: float = 0.4,
                    lane_offset: float = 6.0) -> np.ndarray:
    """Closed-loop drive for loop-closure workloads: out along +z, U-turn, return on
    a parallel lane, U-turn again — so the final frames are near the START and face
    the SAME direction as the early ones. Same-direction revisit is the matchable
    kind: opposite-direction passes see the world mirrored and descriptor
    verification (correctly) rejects them.

    Geometry fits the default corridor world (|x| < 8): turn radius =
    ``turn_frames * turn_step / pi`` (~3.3 m at defaults), return lane at
    x = 2 * radius ≈ ``lane_offset``. Slower steps through the turns keep per-frame
    rotation ~7 deg so matching survives.
    """
    poses = []
    yaw = 0.0
    pos = np.zeros(3)

    def push(n, dstep, dyaw):
        nonlocal yaw, pos
        for _ in range(n):
            c, s = np.cos(yaw), np.sin(yaw)
            R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = pos
            poses.append(T)
            pos = pos + R @ np.array([0.0, 0.0, dstep])
            yaw += dyaw

    dyaw = np.pi / turn_frames
    push(out_frames, step, 0.0)            # out along +z
    push(turn_frames, turn_step, dyaw)     # U-turn (ends facing -z, x ~ lane_offset)
    push(out_frames, step, 0.0)            # return lane
    # Second U-turn continues the SAME rotation direction (yaw pi -> 2pi), swinging
    # through -x back to the start lane; mirroring the turn would displace the lane
    # outward a second time instead.
    push(turn_frames, turn_step, dyaw)
    return np.stack(poses)


def render_sequence(n_frames: int, K: np.ndarray, H: int = 240, W: int = 320,
                    step: float = 0.8, yaw_rate: float = 0.004,
                    world: list[Plane] | None = None,
                    traj: np.ndarray | None = None):
    """Render a full synthetic drive. Returns (gray (F,H,W), depth (F,H,W), T_wc (F,4,4)).

    ``traj`` overrides the built-in constant-turn drive (e.g. pass
    ``slalom_trajectory(...)`` to stay inside the default corridor on long paths)."""
    if traj is None:
        traj = drive_trajectory(n_frames, step=step, yaw_rate=yaw_rate)
    imgs, deps = [], []
    for T in traj:
        g, d = render_rgbd(T, K, H=H, W=W, world=world)
        imgs.append(g)
        deps.append(d)
    return np.stack(imgs), np.stack(deps), traj
