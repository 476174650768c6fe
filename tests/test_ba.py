"""Bundle-adjustment + pose-graph tests on synthetic problems with exact ground truth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vo_tpu.ba import BAProblem, BAConfig, bundle_adjust, PoseGraphConfig, optimize_pose_graph
from vo_tpu.geometry import so3_exp, pose_from_rt, pose_inverse, transform_points, project

K = np.array([[400.0, 0.0, 320.0], [0.0, 400.0, 180.0], [0.0, 0.0, 1.0]], np.float32)


def make_ba_problem(rng, P=6, L=120, M=80, pose_noise=0.02, point_noise=0.05,
                    px_noise=0.3):
    """Cameras on an arc looking at a point cloud; noisy initialization."""
    points_gt = np.stack([
        rng.uniform(-8, 8, L), rng.uniform(-4, 4, L), rng.uniform(8, 25, L)
    ], -1).astype(np.float32)

    poses_gt = []  # world-to-camera
    for p in range(P):
        w = np.array([0.0, 0.04 * p, 0.0], np.float32)
        t = np.array([-0.5 * p, 0.02 * p, 0.1 * p], np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w[None])))[0]
        poses_gt.append(np.asarray(pose_from_rt(jnp.asarray(R), jnp.asarray(t))))
    poses_gt = np.stack(poses_gt)

    obs_lm = np.zeros((P, M), np.int32)
    obs_uv = np.zeros((P, M, 2), np.float32)
    obs_valid = np.zeros((P, M), bool)
    for p in range(P):
        lm = rng.choice(L, M, replace=False)
        uv, z = project(transform_points(jnp.asarray(points_gt[lm]),
                                         jnp.asarray(poses_gt[p])), jnp.asarray(K))
        uv = np.asarray(uv) + rng.normal(0, px_noise, (M, 2))
        obs_lm[p] = lm
        obs_uv[p] = uv
        obs_valid[p] = np.asarray(z) > 0

    # Noisy initialization
    poses_init = poses_gt.copy()
    for p in range(1, P):
        dw = rng.normal(0, pose_noise, 3).astype(np.float32)
        dt = rng.normal(0, pose_noise * 5, 3).astype(np.float32)
        dT = np.asarray(pose_from_rt(so3_exp(jnp.asarray(dw[None]))[0], jnp.asarray(dt)))
        poses_init[p] = dT @ poses_gt[p]
    points_init = points_gt + rng.normal(0, point_noise, (L, 3)).astype(np.float32)

    prob = BAProblem(
        poses=jnp.asarray(poses_init), points=jnp.asarray(points_init),
        obs_lm=jnp.asarray(obs_lm), obs_uv=jnp.asarray(obs_uv),
        obs_valid=jnp.asarray(obs_valid), K=jnp.asarray(K),
    )
    return prob, poses_gt, points_gt


class TestBundleAdjust:
    def test_reduces_reprojection_error(self, rng):
        prob, poses_gt, points_gt = make_ba_problem(rng)
        poses, points, info = bundle_adjust(prob, BAConfig(iterations=15))
        assert float(info["mean_reproj"]) < 0.6  # ~pixel-noise floor

    def test_recovers_poses(self, rng):
        prob, poses_gt, points_gt = make_ba_problem(rng, px_noise=0.0)
        poses, points, info = bundle_adjust(prob, BAConfig(iterations=20))
        poses = np.asarray(poses)
        for p in range(poses_gt.shape[0]):
            err = np.linalg.inv(poses_gt[p]) @ poses[p]
            t_err = np.linalg.norm(err[:3, 3])
            assert t_err < 2e-2, (p, t_err)

    def test_improves_vs_initialization(self, rng):
        prob, poses_gt, _ = make_ba_problem(rng)
        poses0 = np.asarray(prob.poses)
        poses, _, info = bundle_adjust(prob, BAConfig(iterations=15))
        poses = np.asarray(poses)
        err0 = sum(np.linalg.norm((np.linalg.inv(poses_gt[p]) @ poses0[p])[:3, 3])
                   for p in range(len(poses_gt)))
        err1 = sum(np.linalg.norm((np.linalg.inv(poses_gt[p]) @ poses[p])[:3, 3])
                   for p in range(len(poses_gt)))
        assert err1 < 0.3 * err0, (err0, err1)

    def test_masked_observations_ignored(self, rng):
        prob, _, _ = make_ba_problem(rng)
        # corrupt half the observations but mask them out -> same result
        uv_bad = np.asarray(prob.obs_uv).copy()
        valid = np.asarray(prob.obs_valid).copy()
        uv_bad[:, ::2] += 500.0
        valid[:, ::2] = False
        prob_masked = prob._replace(obs_uv=jnp.asarray(uv_bad),
                                    obs_valid=jnp.asarray(valid))
        _, _, info = bundle_adjust(prob_masked, BAConfig(iterations=10))
        assert float(info["mean_reproj"]) < 1.0


class TestPoseGraph:
    def make_chain(self, rng, N=12, drift=0.05):
        # GT: forward motion camera-to-world chain with a loop-closure edge.
        poses_gt = [np.eye(4, dtype=np.float32)]
        for i in range(1, N):
            R = np.asarray(so3_exp(jnp.asarray([[0.0, 0.02, 0.0]])))[0]
            step = np.asarray(pose_from_rt(jnp.asarray(R), jnp.asarray([0.0, 0.0, 1.0])))
            poses_gt.append(poses_gt[-1] @ step)
        poses_gt = np.stack(poses_gt)

        edges, zs = [], []
        for i in range(N - 1):  # odometry edges with drift noise
            z = np.linalg.inv(poses_gt[i]) @ poses_gt[i + 1]
            dw = rng.normal(0, drift, 3).astype(np.float32) * 0.2
            dt = rng.normal(0, drift, 3).astype(np.float32)
            dT = np.asarray(pose_from_rt(so3_exp(jnp.asarray(dw[None]))[0], jnp.asarray(dt)))
            edges.append((i, i + 1))
            zs.append(dT @ z)
        # exact loop closure from 0 to last
        edges.append((0, N - 1))
        zs.append(np.linalg.inv(poses_gt[0]) @ poses_gt[N - 1])

        # integrate noisy odometry for the initialization
        init = [poses_gt[0]]
        for i in range(N - 1):
            init.append(init[-1] @ zs[i])
        return poses_gt, np.stack(init), np.asarray(edges, np.int32), np.stack(zs)

    def test_loop_closure_reduces_drift(self, rng):
        poses_gt, init, edges, zs = self.make_chain(rng)
        w = np.ones(len(edges), np.float32)
        w[-1] = 20.0  # trust the loop closure
        opt, costs = optimize_pose_graph(jnp.asarray(init), jnp.asarray(edges),
                                         jnp.asarray(zs), jnp.asarray(w),
                                         PoseGraphConfig(iterations=25))
        opt = np.asarray(opt)
        err_init = np.linalg.norm(init[-1][:3, 3] - poses_gt[-1][:3, 3])
        err_opt = np.linalg.norm(opt[-1][:3, 3] - poses_gt[-1][:3, 3])
        assert err_opt < 0.3 * err_init, (err_init, err_opt)
        assert costs[-1] < costs[0]

    def test_perfect_edges_stay_fixed(self, rng):
        poses_gt, _, edges, _ = self.make_chain(rng, drift=0.0)
        zs = np.stack([np.linalg.inv(poses_gt[i]) @ poses_gt[j] for i, j in edges])
        opt, costs = optimize_pose_graph(jnp.asarray(poses_gt), jnp.asarray(edges),
                                         jnp.asarray(zs),
                                         jnp.ones(len(edges), np.float32),
                                         PoseGraphConfig(iterations=5))
        assert np.allclose(np.asarray(opt), poses_gt, atol=1e-3)

    def test_anisotropic_weights_rotation_stiff(self, rng):
        """(E, 6) per-component information: with rotation components made very
        stiff on odometry edges, closure must still happen (drift shrinks) while
        node ROTATIONS stay near their initialization — the r05 refinement
        pipeline's contract (closure rides translation, heading untouched)."""
        poses_gt, init, edges, zs = self.make_chain(rng)
        E = len(edges)
        w6 = np.ones((E, 6), np.float32)
        w6[:-1, 3:] = 1000.0          # odometry rotation components stiff
        w6[-1] = 20.0                 # loop edge
        opt, costs = optimize_pose_graph(jnp.asarray(init), jnp.asarray(edges),
                                         jnp.asarray(zs), jnp.asarray(w6),
                                         PoseGraphConfig(iterations=25))
        opt = np.asarray(opt)
        err_init = np.linalg.norm(init[-1][:3, 3] - poses_gt[-1][:3, 3])
        err_opt = np.linalg.norm(opt[-1][:3, 3] - poses_gt[-1][:3, 3])
        assert err_opt < 0.5 * err_init, (err_init, err_opt)
        # rotations stay within a fraction of a degree of the init
        dR = np.einsum("nij,nkj->nik", opt[:, :3, :3], init[:, :3, :3])
        ang = np.degrees(np.arccos(
            np.clip((np.einsum("nii->n", dR) - 1) / 2, -1, 1)))
        assert ang.max() < 0.5, ang.max()
        assert np.asarray(costs)[-1] < np.asarray(costs)[0]

    def test_long_run_past_convergence_stays_finite(self, rng):
        """Running MANY iterations past convergence must not diverge: the
        pre-LM optimizer applied every GN step unconditionally and a converged
        120-node graph once exploded 0.13 -> 1e32 -> NaN. Step acceptance +
        adaptive damping make over-iteration safe."""
        poses_gt, init, edges, zs = self.make_chain(rng, N=40)
        w = np.ones(len(edges), np.float32)
        w[-1] = 20.0
        opt, costs = optimize_pose_graph(jnp.asarray(init), jnp.asarray(edges),
                                         jnp.asarray(zs), jnp.asarray(w),
                                         PoseGraphConfig(iterations=120))
        costs = np.asarray(costs)
        assert np.isfinite(np.asarray(opt)).all()
        assert np.isfinite(costs).all()
        # monotone non-increasing recorded costs (rejected steps hold)
        assert (np.diff(costs) <= 1e-4 * np.maximum(costs[:-1], 1.0)).all()
