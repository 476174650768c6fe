from vo_tpu.ba.bundle_adjust import BAProblem, BAConfig, bundle_adjust
from vo_tpu.ba.pose_graph import PoseGraphConfig, optimize_pose_graph
