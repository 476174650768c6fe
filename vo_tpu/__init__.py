"""vo_tpu — a TPU-native visual-odometry / SfM engine.

Built from scratch in JAX/XLA/Pallas. Covers (and extends) the capabilities of the
reference Visual-Odometry-pipeline (see SURVEY.md):

- ``vo_tpu.geometry``   — jittable Lie groups (SO3/SE3), pinhole camera, triangulation,
                          Umeyama alignment (replaces Utils/SE3_utils.py, Utils/geom_utils.py,
                          Camera.py in the reference).
- ``vo_tpu.features``   — batched on-device detectors/descriptors (Harris/FAST + BRIEF-style
                          binary, SIFT-style float) (replaces feature_extractors/{ORB,SIFT,SURF}.py).
- ``vo_tpu.models``     — R2D2-style learned extractor in Flax (replaces R2D2.py + the vendored
                          feature_extractors/r2d2 PyTorch stack).
- ``vo_tpu.matching``   — mutual-NN / ratio / similarity matchers over descriptor GEMMs
                          (replaces R2D2.py:29-66 and the BFMatcher usage in ORB.py:23-32).
- ``vo_tpu.estimation`` — vectorized on-device PnP-RANSAC + refinement (replaces
                          cv2.solvePnPRansac in VisualOdometry_Stereo.py:129).
- ``vo_tpu.engine``     — the keyframe-relative VO state machine as a lax.scan
                          (replaces VisualOdometry_Stereo.py:223-297).
- ``vo_tpu.ba``         — windowed bundle adjustment + pose graph (the reference lacks these).
- ``vo_tpu.parallel``   — mesh/sharding utilities for multi-chip/multi-host execution.
- ``vo_tpu.evalkit``    — KITTI ATE/RPE evaluation, metric-compatible with
                          plot_utils/kittievalodom.py.
- ``vo_tpu.io``         — dataset readers/writers interoperable with the reference formats
                          (*.png + *_depth.npy inputs, global_poses.npy / KITTI txt outputs).
- ``vo_tpu.ops``        — Pallas TPU kernels for the hot paths (descriptor distance + top-2,
                          RANSAC scoring, NMS).
- ``vo_tpu.train``      — R2D2-style self-supervised training (AP loss, peaky/cosim losses,
                          synthetic homography pairs) in JAX.
"""

__version__ = "0.1.0"
