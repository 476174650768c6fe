"""Golden-trajectory test: our evaluator must reproduce the reference's numbers.

BASELINE.md was computed by scoring the reference's committed KITTI seq-03 trajectory
(plot_utils/data/global_poses.npy) with the reference's own evaluator
(plot_utils/kittievalodom.py). Our vectorized evaluator must produce the same numbers on
the same data:
  ATE/dist = 11.73, RPE_trans = 0.1466, rot/dist = 0.1668 deg/m, dist = 560.9 m,
  segment trans err = 3.37 %, segment rot err = 1.271 deg/100m.
"""

import os

import numpy as np
import pytest

from vo_tpu.evalkit import KittiOdomEvaluator
from vo_tpu.evalkit.kitti import load_poses_txt
from vo_tpu.io import poses_npy_to_kitti_txt, kitti_gt_to_modified_txt, load_poses_npy

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def golden():
    gt = load_poses_txt(os.path.join(DATA, "03_modified.txt"))
    pred_npy = load_poses_npy(os.path.join(DATA, "global_poses.npy"))
    return gt, pred_npy


class TestGoldenTrajectory:
    def test_reproduces_baseline_numbers(self, golden):
        gt, pred = golden
        res = KittiOdomEvaluator().evaluate(gt, pred)
        assert res.ate_over_dist == pytest.approx(11.73, abs=0.02)
        assert res.rpe_trans == pytest.approx(0.1466, abs=0.001)
        assert res.rpe_rot_over_dist == pytest.approx(0.1668, abs=0.001)
        assert res.total_distance == pytest.approx(560.9, abs=0.5)
        assert res.seg_trans_err_pct == pytest.approx(3.37, abs=0.02)
        assert res.seg_rot_err_deg_per_100m == pytest.approx(1.271, abs=0.005)

    def test_reference_tuple_shape(self, golden):
        gt, pred = golden
        tup = KittiOdomEvaluator().evaluate(gt, pred).as_reference_tuple()
        assert len(tup) == 4

    def test_perfect_trajectory_scores_zero(self, golden):
        gt, _ = golden
        res = KittiOdomEvaluator().evaluate(gt, gt)
        assert res.ate_sum == pytest.approx(0.0, abs=1e-9)
        assert res.rpe_trans == pytest.approx(0.0, abs=1e-9)
        assert res.seg_trans_err_pct == pytest.approx(0.0, abs=1e-9)


class TestPoseIO:
    def test_txt_roundtrip(self, tmp_path, golden):
        _, pred = golden
        npy = tmp_path / "p.npy"
        txt = tmp_path / "p.txt"
        np.save(npy, pred)
        poses_npy_to_kitti_txt(str(npy), str(txt), n_cols=16)
        loaded = load_poses_txt(str(txt))
        arr = np.stack([loaded[i] for i in sorted(loaded)])
        assert np.allclose(arr, pred, atol=1e-6)

    def test_modified_gt_roundtrip(self, tmp_path):
        src = os.path.join(DATA, "03.txt")
        out = kitti_gt_to_modified_txt(src, str(tmp_path / "03_modified.txt"))
        ours = load_poses_txt(out)
        theirs = load_poses_txt(os.path.join(DATA, "03_modified.txt"))
        for i in list(theirs)[:20]:
            assert np.allclose(ours[i], theirs[i], atol=1e-9)
