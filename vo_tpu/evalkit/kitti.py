"""KITTI odometry evaluation — metric-compatible with the reference evaluator.

Reimplements (vectorized, no matplotlib/YAML coupling) the exact metric definitions of
the reference's ``KittiEvalOdom`` (plot_utils/kittievalodom.py), including its quirks,
which we must honor to compare against BASELINE.md (SURVEY.md §7 "reference quirks"):

- ATE is the **sum** of per-frame **planar x–z** errors (kittievalodom.py:418-424), not an
  RMSE, and the headline number is that sum divided by total GT distance (:570).
- Translation error ignores the y component (dy forced to 0, kittievalodom.py:161).
- Both trajectories are aligned to the first frame before scoring (:534-539).
- Segment errors use lengths 100..800 m at step 10 frames (:86,:196-232).
- RPE translation is the mean per-frame ratio (local error / local GT distance, :459,:464);
  RPE rotation is reported as the **sum** of per-frame angles in degrees, with the headline
  number divided by total GT distance (:469,:570).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class EvalResult:
    """Everything the reference's eval() returns, plus the intermediate aggregates."""

    ate_over_dist: float          # compute_ATE sum / total RPE distance (kittievalodom.py:570)
    rpe_trans: float              # mean per-frame translation ratio (:464)
    rpe_rot_over_dist: float      # sum of per-frame rot (deg) / total distance (:570)
    total_distance: float         # sum of per-frame GT step distances (:458)
    ate_sum: float                # raw planar ATE sum (:424)
    seg_trans_err_pct: float      # average segment translation error * 100 (:504)
    seg_rot_err_deg_per_100m: float  # average segment rotation error in deg/100m (:505)
    per_length_errors: dict = field(default_factory=dict)

    def as_reference_tuple(self):
        """The exact 4-tuple the reference eval() returns (kittievalodom.py:570)."""
        return (self.ate_over_dist, self.rpe_trans, self.rpe_rot_over_dist, self.total_distance)


def load_poses_txt(path: str) -> dict[int, np.ndarray]:
    """Load KITTI-format pose txt: 12 numbers (3x4 row-major) or idx + 12 numbers per line.

    Same layouts as the reference loader (plot_utils/kittievalodom.py:89-116).
    """
    poses = {}
    cnt = 0
    with open(path) as f:
        for line in f:
            vals = [float(v) for v in line.split() if v]
            if not vals:
                continue  # skip blank lines without shifting frame numbering
            with_idx = len(vals) == 13
            flat = vals[1:13] if with_idx else vals[:12]  # 16-col files: first 12 used, like the reference
            P = np.eye(4)
            P[:3, :4] = np.asarray(flat).reshape(3, 4)
            poses[int(vals[0]) if with_idx else cnt] = P
            cnt += 1
    return poses


def poses_dict_to_array(poses: dict[int, np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    idx = np.asarray(sorted(poses.keys()))
    arr = np.stack([poses[i] for i in idx])
    return idx, arr


class KittiOdomEvaluator:
    """Vectorized reimplementation of the reference metrics. API:

    >>> ev = KittiOdomEvaluator()
    >>> res = ev.evaluate(poses_gt, poses_pred)      # dicts {idx: 4x4} or (N,4,4) arrays
    >>> res.as_reference_tuple()
    """

    lengths = (100, 200, 300, 400, 500, 600, 700, 800)  # kittievalodom.py:86
    step_size = 10                                       # kittievalodom.py:196

    # -- helpers ---------------------------------------------------------------

    @staticmethod
    def _to_dict(poses) -> dict[int, np.ndarray]:
        if isinstance(poses, dict):
            return {int(k): np.asarray(v, dtype=np.float64) for k, v in poses.items()}
        arr = np.asarray(poses, dtype=np.float64)
        return {i: arr[i] for i in range(arr.shape[0])}

    @staticmethod
    def trajectory_distances(poses: dict[int, np.ndarray]) -> np.ndarray:
        """Cumulative per-step distance along the GT trajectory (kittievalodom.py:118-136)."""
        idx = sorted(poses.keys())
        t = np.stack([poses[i][:3, 3] for i in idx])
        step = np.linalg.norm(np.diff(t, axis=0), axis=1)
        return np.concatenate([[0.0], np.cumsum(step)])

    @staticmethod
    def rotation_error(pose_error: np.ndarray) -> float:
        """Angle of the residual rotation (kittievalodom.py:138-150)."""
        d = 0.5 * (pose_error[0, 0] + pose_error[1, 1] + pose_error[2, 2] - 1.0)
        return float(np.arccos(np.clip(d, -1.0, 1.0)))

    @staticmethod
    def translation_error(pose_error: np.ndarray) -> float:
        """Translation magnitude of the residual, with dy forced to 0 (kittievalodom.py:152-164)."""
        dx, dz = pose_error[0, 3], pose_error[2, 3]
        return float(np.sqrt(dx * dx + dz * dz))

    @classmethod
    def _last_frame_from_segment_length(cls, dist, first_frame, length):
        beyond = np.nonzero(dist[first_frame:] > dist[first_frame] + length)[0]
        return int(beyond[0]) + first_frame if beyond.size else -1

    # -- metric blocks ---------------------------------------------------------

    def calc_sequence_errors(self, poses_gt, poses_result):
        """Per-(start, length) segment rotation/translation errors (kittievalodom.py:181-233)."""
        err = []
        dist = self.trajectory_distances(poses_gt)
        for first_frame in range(0, len(poses_gt), self.step_size):
            for length in self.lengths:
                last_frame = self._last_frame_from_segment_length(dist, first_frame, length)
                if last_frame == -1 or last_frame not in poses_result or first_frame not in poses_result:
                    continue
                delta_gt = np.linalg.inv(poses_gt[first_frame]) @ poses_gt[last_frame]
                delta_res = np.linalg.inv(poses_result[first_frame]) @ poses_result[last_frame]
                pose_error = np.linalg.inv(delta_res) @ delta_gt
                err.append((first_frame,
                            self.rotation_error(pose_error) / length,
                            self.translation_error(pose_error) / length,
                            length))
        return err

    def compute_ate(self, gt, pred) -> float:
        """Planar x–z error, summed over frames (kittievalodom.py:392-427)."""
        errors = [
            np.linalg.norm(gt[i][[0, 2], 3] - pred[i][[0, 2], 3]) for i in pred
        ]
        return float(np.sum(errors))

    def compute_rpe(self, gt, pred):
        """Per-frame relative pose error (kittievalodom.py:429-469).

        Returns (mean trans ratio, sum of rot errors in degrees, total GT distance).
        """
        keys = sorted(pred.keys())
        trans_ratios, rot_errs, total_dist = [], [], 0.0
        for i in keys[:-1]:
            if i + 1 not in gt or i + 1 not in pred:
                continue
            gt_rel = np.linalg.inv(gt[i]) @ gt[i + 1]
            pred_rel = np.linalg.inv(pred[i]) @ pred[i + 1]
            rel_err = np.linalg.inv(gt_rel) @ pred_rel
            local_dist = np.linalg.norm(gt_rel[:3, 3])
            total_dist += local_dist
            trans_ratios.append(self.translation_error(rel_err) / max(local_dist, 1e-12))
            rot_errs.append(self.rotation_error(rel_err))
        if not trans_ratios:  # sparse/keyframe-only trajectories: no consecutive pairs
            return 0.0, 0.0, 0.0
        return (float(np.mean(trans_ratios)),
                float(np.sum(rot_errs) * 180.0 / np.pi),
                float(total_dist))

    # -- top level -------------------------------------------------------------

    def evaluate(self, poses_gt, poses_pred, align_first_frame: bool = True) -> EvalResult:
        gt = self._to_dict(poses_gt)
        pred = self._to_dict(poses_pred)

        if align_first_frame:  # kittievalodom.py:534-539
            idx0 = sorted(pred.keys())[0]
            pred_0_inv = np.linalg.inv(pred[idx0])
            gt_0_inv = np.linalg.inv(gt[idx0])
            pred = {i: pred_0_inv @ pred[i] for i in pred}
            gt = {i: gt_0_inv @ gt[i] for i in gt}

        seq_err = self.calc_sequence_errors(gt, pred)
        if seq_err:
            ave_r = float(np.mean([e[1] for e in seq_err]))
            ave_t = float(np.mean([e[2] for e in seq_err]))
        else:
            ave_r = ave_t = 0.0

        per_len = {}
        for length in self.lengths:
            sel = [e for e in seq_err if e[3] == length]
            if sel:
                per_len[length] = (float(np.mean([e[2] for e in sel])),
                                   float(np.mean([e[1] for e in sel])))

        ate_sum = self.compute_ate(gt, pred)
        rpe_trans, rpe_rot_deg_sum, total_dist = self.compute_rpe(gt, pred)

        return EvalResult(
            ate_over_dist=ate_sum / total_dist if total_dist else 0.0,
            rpe_trans=rpe_trans,
            rpe_rot_over_dist=rpe_rot_deg_sum / total_dist if total_dist else 0.0,
            total_distance=total_dist,
            ate_sum=ate_sum,
            seg_trans_err_pct=ave_t * 100.0,
            seg_rot_err_deg_per_100m=ave_r / np.pi * 180.0 * 100.0,
            per_length_errors=per_len,
        )
