"""Typed configuration + YAML loader.

Reads the same YAML schema as the reference (config/vo_params.yaml:1-26: ``vo_method``,
``feature_extractor``, ``image_path``, ``camera_intrinsic_matrix`` (9 floats),
``output_filename``, ``visualize_results``, ``gt_txt_file_path``, ``poses_file_path``)
so existing configs drop in — but without the reference's import-time side effects
(VisualOdometry_Stereo.py:16-24 reads YAML at module import and star-imports the
extractor; we resolve everything explicitly at call time) and without any eval()-based
configuration (SURVEY.md §5 'Config / flag system').

Extra (optional) keys configure the TPU engine: ``max_keypoints``, ``matcher``,
``ratio``, ``pnp_*`` gates, ``extraction_batch``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import yaml

from vo_tpu.engine.vo import VOConfig
from vo_tpu.estimation.pnp import PnPConfig


@dataclass
class RunConfig:
    vo_method: str = "rgbd"              # 'rgbd' | 'mono' (mono is WIP in the reference too)
    feature_extractor: str = "orb"       # 'orb' | 'sift' | 'surf' | 'r2d2' (ref :19-24;
                                         # surf exists as feature_extractors/SURF.py but
                                         # is not reachable from the reference's switch)
    image_path: str = ""
    camera_intrinsic_matrix: np.ndarray = field(
        default_factory=lambda: np.array(
            [[721.53, 0.0, 609.55], [0.0, 721.53, 172.85], [0.0, 0.0, 1.0]], np.float32))
    output_filename: str = "global_poses"
    visualize_results: bool = False
    gt_txt_file_path: str = ""
    poses_file_path: str = ""

    # TPU engine knobs (defaults mirror the reference's hard-coded constants)
    max_keypoints: int = 2048
    extraction_batch: int = 16   # XLA compile time grows ~linearly with the batched
                                 # extraction graph; 16 keeps first-compile tolerable
                                 # (32 measured ~3 min on a tunneled v5e) while still
                                 # saturating the chip
    octaves: int = 1             # >1: octave-pyramid classic extraction (cv2 ORB/SIFT
                                 # detect over pyramids; features/pyramid.py)
    oriented: bool = False       # gradhist dominant-orientation normalization
    vo: VOConfig = field(default_factory=VOConfig)

    @classmethod
    def from_yaml(cls, path: str) -> "RunConfig":
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        cfg = cls()
        if "vo_method" in raw:
            cfg.vo_method = raw["vo_method"]
        if "feature_extractor" in raw:
            cfg.feature_extractor = raw["feature_extractor"]
        if "image_path" in raw:
            cfg.image_path = raw["image_path"] or ""
        if "camera_intrinsic_matrix" in raw:
            cfg.camera_intrinsic_matrix = np.reshape(
                np.asarray(raw["camera_intrinsic_matrix"], np.float32), (3, 3))
        if "output_filename" in raw:
            cfg.output_filename = raw["output_filename"]
        if "visualize_results" in raw:
            cfg.visualize_results = bool(raw["visualize_results"])
        if "gt_txt_file_path" in raw:
            cfg.gt_txt_file_path = raw["gt_txt_file_path"] or ""
        if "poses_file_path" in raw:
            cfg.poses_file_path = raw["poses_file_path"] or ""
        if "max_keypoints" in raw:
            cfg.max_keypoints = int(raw["max_keypoints"])
        if "extraction_batch" in raw:
            cfg.extraction_batch = int(raw["extraction_batch"])
        if "octaves" in raw:
            cfg.octaves = int(raw["octaves"])
        if "oriented" in raw:
            cfg.oriented = bool(raw["oriented"])

        vo_kwargs = {}
        if cfg.feature_extractor in ("orb",):
            vo_kwargs["matcher"] = "ratio_binary"
            vo_kwargs["ratio"] = 0.85      # ORB.py:28
        elif cfg.feature_extractor in ("sift", "surf"):
            vo_kwargs["matcher"] = "ratio_float"
            vo_kwargs["ratio"] = 0.85      # SIFT.py:27, SURF.py:26
        elif cfg.feature_extractor == "r2d2":
            vo_kwargs["matcher"] = "ratio_mutual_nn"
            vo_kwargs["ratio"] = 0.90      # R2D2.py:53
        for k in ("ratio", "matcher", "min_displacement_px", "max_point_depth",
                  "max_speed", "kf_min_matches", "kf_min_inliers", "bad_pnp_limit"):
            if k in raw:
                vo_kwargs[k] = raw[k]
        pnp_kwargs = {k[4:]: raw[k] for k in raw
                      if k.startswith("pnp_") and k[4:] in PnPConfig.__dataclass_fields__}
        if pnp_kwargs:
            vo_kwargs["pnp"] = PnPConfig(**pnp_kwargs)
        cfg.vo = VOConfig(**vo_kwargs)
        return cfg
