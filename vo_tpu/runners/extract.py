"""Standalone multiscale feature-extraction CLI.

Drop-in counterpart of the reference's ``python extract.py --model ... --images ...``
(feature_extractors/r2d2/extract.py:160-185): reads images (or a ``.txt`` listing one
path per line), runs the full-pyramid R2D2 extractor, and writes ``<image>.<tag>`` npz
files with the reference's keys (imsize, keypoints Nx3, descriptors, scores;
extract.py:150-156). Images sharing a geometry are batched through one jitted pyramid.

    python -m vo_tpu.runners.extract --model faster2d2_WASF_N16 \\
        --images img1.png img2.png --top-k 5000 --tag r2d2
"""

from __future__ import annotations

import argparse
from collections import defaultdict

import numpy as np


def expand_image_list(paths: list[str]) -> list[str]:
    """Flatten ``.txt`` list files into image paths (extract.py:126-130)."""
    out = []
    queue = list(paths)
    while queue:
        p = queue.pop(0)
        if p.endswith(".txt"):
            queue = [l for l in open(p).read().splitlines() if l.strip()] + queue
        else:
            out.append(p)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="faster2d2_WASF_N16",
                    help="pretrained checkpoint name, or a vo_tpu .ckpt path")
    ap.add_argument("--images", nargs="+", required=True,
                    help="image paths and/or .txt list files")
    ap.add_argument("--tag", default="r2d2", help="output suffix (-> <img>.<tag>)")
    ap.add_argument("--top-k", type=int, default=5000)
    ap.add_argument("--scale-f", type=float, default=2 ** 0.25)
    ap.add_argument("--min-size", type=int, default=256)
    ap.add_argument("--max-size", type=int, default=1024)
    ap.add_argument("--min-scale", type=float, default=0.0)
    ap.add_argument("--max-scale", type=float, default=1.0)
    ap.add_argument("--reliability-thr", type=float, default=0.7)
    ap.add_argument("--repeatability-thr", type=float, default=0.7)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--kapture-root", default=None,
                    help="also write kapture-layout binary features under this root "
                         "(reconstruction/{keypoints,descriptors}/<tag>/<image>...)")
    args = ap.parse_args(argv)

    from vo_tpu.io.dataset import _read_png_rgb
    from vo_tpu.models.multiscale import (MultiscaleConfig, extract_multiscale,
                                          save_r2d2_npz)
    from vo_tpu.models.port_weights import load_pretrained

    spec, params = load_pretrained(args.model)
    cfg = MultiscaleConfig(
        scale_f=args.scale_f, min_scale=args.min_scale, max_scale=args.max_scale,
        min_size=args.min_size, max_size=args.max_size, top_k=args.top_k,
        rel_thr=args.reliability_thr, rep_thr=args.repeatability_thr)

    paths = expand_image_list(args.images)
    by_shape: dict[tuple, list[tuple[str, np.ndarray]]] = defaultdict(list)
    for p in paths:
        img = _read_png_rgb(p)
        by_shape[img.shape].append((p, img))

    for shape, group in by_shape.items():
        for s in range(0, len(group), args.batch):
            chunk = group[s:s + args.batch]
            batch = np.stack([im for _, im in chunk])
            feats = extract_multiscale(params, spec, batch, cfg)
            for i, (p, im) in enumerate(chunk):
                out = save_r2d2_npz(f"{p}.{args.tag}", feats,
                                    imsize=(im.shape[1], im.shape[0]), frame=i)
                n = int(np.asarray(feats.valid[i]).sum())
                print(f"Saving {n} keypoints to {out}")
                if args.kapture_root:
                    save_kapture_features(args.kapture_root, args.tag, p, feats, i)
    return 0


def save_kapture_features(root: str, tag: str, image_path: str, feats,
                          frame: int) -> tuple[str, str]:
    """Write one image's features in kapture's binary layout — the reference's
    extract_kapture.py output (reconstruction/keypoints/<type>/<image>.kpt as raw
    float32 Nx3 [x, y, scale], reconstruction/descriptors/<type>/<image>.desc as raw
    float32 NxD), plus the .txt type headers kapture expects."""
    import os

    v = np.asarray(feats.valid[frame])
    kp = np.asarray(feats.kp[frame])[v].astype(np.float32)        # (N, 3) x, y, scale
    desc = np.asarray(feats.desc[frame])[v].astype(np.float32)    # (N, D)

    name = os.path.basename(image_path)
    kdir = os.path.join(root, "reconstruction", "keypoints", tag)
    ddir = os.path.join(root, "reconstruction", "descriptors", tag)
    os.makedirs(kdir, exist_ok=True)
    os.makedirs(ddir, exist_ok=True)
    kpath = os.path.join(kdir, name + ".kpt")
    dpath = os.path.join(ddir, name + ".desc")
    kp.tofile(kpath)
    desc.tofile(dpath)
    # Type headers (kapture 1.x csv format line + dtype/dsize).
    with open(os.path.join(kdir, "keypoints.txt"), "w") as f:
        f.write(f"# kapture format: 1.1\nname={tag}\ndtype=float32\ndsize={kp.shape[1]}\n")
    with open(os.path.join(ddir, "descriptors.txt"), "w") as f:
        f.write(f"# kapture format: 1.1\nname={tag}\nkeypoints_type={tag}\n"
                f"dtype=float32\ndsize={desc.shape[1]}\nmetric_type=L2\n")
    return kpath, dpath


if __name__ == "__main__":
    raise SystemExit(main())
