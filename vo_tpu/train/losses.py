"""R2D2 self-supervised losses in pure JAX.

Reimplements the behavior of the reference's loss stack (same objectives, TPU-shaped
fixed-size sampling; no torch):

- ``cosim_loss``   <- CosimLoss (nets/repeatability_loss.py:13-38): cosine similarity of
  flattened NxN repeatability windows between image 1 and the flow-warped image 2.
- ``peaky_loss``   <- PeakyLoss (nets/repeatability_loss.py:41-61): 1 - (local max -
  local mean) of repeatability windows.
- ``ap_reliability_loss`` <- ReliabilityLoss + PixelAPLoss + quantized AP
  (nets/reliability_loss.py:12-56, nets/ap_loss.py:11-62): histogram-binned
  differentiable Average Precision per query pixel, blended with predicted reliability
  as 1 - (AP * rel + kappa * (1 - rel)). Queries are a strided grid in image 1;
  positives are the descriptors at the ground-truth flow target; negatives are the
  other queries' targets (in-batch distractors, fixed shapes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _avg_pool(x, n):
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, n, n), (1, n, n),
                                 "VALID") / (n * n)


def _max_pool(x, n):
    # Pool a dummy trailing channel dim: the (B, H, W) form differentiates through
    # SelectAndScatter with one inactive dim, which TPU's XLA backend rejects
    # ("less than 2 inactive dims is not implemented"); (B, H, W, 1) lowers fine.
    return jax.lax.reduce_window(x[..., None], -jnp.inf, jax.lax.max,
                                 (1, n, n, 1), (1, n, n, 1), "VALID")[..., 0]


def _bilinear_at(img, xy):
    """Sample (H, W[, C]) at (N, 2) float [x, y]."""
    H, W = img.shape[:2]
    x = jnp.clip(xy[..., 0], 0.0, W - 1.0)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32).clip(0, W - 2)
    y0 = jnp.floor(y).astype(jnp.int32).clip(0, H - 2)
    fx = (x - x0)[..., None] if img.ndim == 3 else (x - x0)
    fy = (y - y0)[..., None] if img.ndim == 3 else (y - y0)
    return ((1 - fy) * ((1 - fx) * img[y0, x0] + fx * img[y0, x0 + 1])
            + fy * ((1 - fx) * img[y0 + 1, x0] + fx * img[y0 + 1, x0 + 1]))


def cosim_loss(rep1: jnp.ndarray, rep2: jnp.ndarray, flow: jnp.ndarray,
               mask: jnp.ndarray, window: int = 16) -> jnp.ndarray:
    """1 - mean cosine similarity of NxN windows of rep1 vs flow-warped rep2."""
    B, H, W = rep1.shape
    # Warp rep2 back onto image-1 coordinates via the flow.
    rep2_w = jax.vmap(lambda r, f: _bilinear_at(r, f.reshape(-1, 2)).reshape(H, W))(
        rep2, flow)
    rep2_w = jnp.where(mask, rep2_w, 0.0)
    rep1m = jnp.where(mask, rep1, 0.0)

    n = window
    Hc, Wc = H // n, W // n
    p1 = rep1m[:, :Hc * n, :Wc * n].reshape(B, Hc, n, Wc, n).transpose(0, 1, 3, 2, 4)
    p2 = rep2_w[:, :Hc * n, :Wc * n].reshape(B, Hc, n, Wc, n).transpose(0, 1, 3, 2, 4)
    f1 = p1.reshape(B, Hc * Wc, n * n)
    f2 = p2.reshape(B, Hc * Wc, n * n)
    cos = jnp.sum(f1 * f2, -1) / (jnp.linalg.norm(f1, axis=-1)
                                  * jnp.linalg.norm(f2, axis=-1)).clip(1e-6)
    return 1.0 - jnp.mean(cos)


def peaky_loss(rep: jnp.ndarray, window: int = 16) -> jnp.ndarray:
    """1 - mean(local max - local mean): encourages peaked repeatability."""
    mx = _max_pool(rep, window)
    av = _avg_pool(rep, window)
    return 1.0 - jnp.mean(mx - av)


def _quantized_ap(sim_pos: jnp.ndarray, sim_neg: jnp.ndarray,
                  n_bins: int = 25) -> jnp.ndarray:
    """Histogram-AP (He et al.): soft-bin similarities in [-1, 1], precision-weighted
    positive mass. sim_pos: (Q, P); sim_neg: (Q, N). Returns (Q,) AP in [0, 1]."""
    centers = jnp.linspace(1.0, -1.0, n_bins)
    delta = 2.0 / (n_bins - 1)

    def soft_hist(s):  # (Q, M) -> (Q, n_bins)
        w = jnp.clip(1.0 - jnp.abs(s[..., None] - centers) / delta, 0.0, 1.0)
        return w.sum(axis=-2)

    hp = soft_hist(sim_pos)
    hn = soft_hist(sim_neg)
    cp = jnp.cumsum(hp, axis=-1)
    cn = jnp.cumsum(hn, axis=-1)
    prec = cp / (cp + cn).clip(1e-8)
    n_pos = hp.sum(axis=-1).clip(1e-8)
    return jnp.sum(prec * hp, axis=-1) / n_pos


def ap_reliability_loss(desc1: jnp.ndarray, desc2: jnp.ndarray, rel1: jnp.ndarray,
                        flow: jnp.ndarray, mask: jnp.ndarray,
                        stride: int = 8, kappa: float = 0.5,
                        n_bins: int = 25) -> jnp.ndarray:
    """Per-image-batch AP-reliability loss.

    Args:
      desc1, desc2: (B, H, W, D) L2-normed dense descriptors.
      rel1: (B, H, W) reliability of image 1.
      flow: (B, H, W, 2) image1 -> image2 ground-truth correspondence.
      mask: (B, H, W) correspondence validity.
    """
    B, H, W, D = desc1.shape
    ys = jnp.arange(stride // 2, H - stride // 2, stride)
    xs = jnp.arange(stride // 2, W - stride // 2, stride)
    gx, gy = jnp.meshgrid(xs, ys)
    q_xy = jnp.stack([gx, gy], -1).reshape(-1, 2)            # (Q, 2) int grid

    def per_image(d1, d2, r1, fl, mk):
        q = d1[q_xy[:, 1], q_xy[:, 0]]                        # (Q, D)
        q_rel = r1[q_xy[:, 1], q_xy[:, 0]]
        q_valid = mk[q_xy[:, 1], q_xy[:, 0]]
        tgt = fl[q_xy[:, 1], q_xy[:, 0]]                      # (Q, 2) in image 2
        pos = _bilinear_at(d2, tgt)                           # (Q, D)
        pos = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True).clip(1e-8)

        sim_all = q @ pos.T                                   # (Q, Q): diag = positives
        sim_pos = jnp.diagonal(sim_all)[:, None]
        neg_mask = 1.0 - jnp.eye(sim_all.shape[0])
        # Exclude near-duplicate targets (within ~stride px) from the negatives.
        d2_t = jnp.sum((tgt[:, None] - tgt[None, :]) ** 2, -1)
        neg_mask = neg_mask * (d2_t > (stride * 0.75) ** 2)
        sim_neg = jnp.where(neg_mask > 0, sim_all, -1.0)

        ap = _quantized_ap(sim_pos, sim_neg, n_bins)
        loss_q = 1.0 - (ap * q_rel + kappa * (1.0 - q_rel))
        w = q_valid.astype(jnp.float32)
        return jnp.sum(loss_q * w) / w.sum().clip(1.0)

    return jnp.mean(jax.vmap(per_image)(desc1, desc2, rel1, flow, mask))


def ngh_ap_reliability_loss(desc1: jnp.ndarray, desc2: jnp.ndarray, rel1: jnp.ndarray,
                            flow: jnp.ndarray, mask: jnp.ndarray,
                            stride: int = 8, kappa: float = 0.5, n_bins: int = 25,
                            pos_d: int = 3, neg_d: tuple[int, int] = (5, 18),
                            distractor_stride: int = 16) -> jnp.ndarray:
    """NghSampler2-style AP-reliability loss (nets/sampler.py:252-382 behavior).

    Differences from ``ap_reliability_loss``: per query, *positives* are a ring of
    sub-pixel offsets within ``pos_d`` px of the ground-truth flow target (the
    reference's ``pos_d`` neighborhood); *negatives* combine (a) a hard-negative ring at
    radius ``neg_d`` around the target — same image, spatially close, so the descriptor
    must discriminate — and (b) a coarse distractor grid over image 2 (the reference's
    ``subd_neg`` distractors), masked of any cell within ``neg_d[0]`` of the target.
    Fixed shapes throughout: every query sees the same positive/negative counts.
    """
    B, H, W, D = desc1.shape

    ys = jnp.arange(stride // 2, H - stride // 2, stride)
    xs = jnp.arange(stride // 2, W - stride // 2, stride)
    gx, gy = jnp.meshgrid(xs, ys)
    q_xy = jnp.stack([gx, gy], -1).reshape(-1, 2)                   # (Q, 2)

    # Positive ring: center + 4 offsets at 0.5*pos_d + 4 at pos_d, covering the full
    # pos_d neighborhood the reference's NghSampler2 implies (sampler.py:262-270).
    r = float(pos_d)
    pos_off = jnp.asarray([[0.0, 0.0], [r * 0.5, 0.0], [-r * 0.5, 0.0],
                           [0.0, r * 0.5], [0.0, -r * 0.5],
                           [r, 0.0], [-r, 0.0], [0.0, r], [0.0, -r]])   # (P, 2)
    # Hard-negative ring: 8 directions at radius in [neg_d0, neg_d1].
    angs = jnp.arange(8) * (2 * jnp.pi / 8)
    rad = 0.5 * (neg_d[0] + neg_d[1])
    neg_off = rad * jnp.stack([jnp.cos(angs), jnp.sin(angs)], -1)   # (R, 2)

    dy = jnp.arange(distractor_stride // 2, H, distractor_stride)
    dx = jnp.arange(distractor_stride // 2, W, distractor_stride)
    dgx, dgy = jnp.meshgrid(dx, dy)
    d_xy = jnp.stack([dgx, dgy], -1).reshape(-1, 2).astype(jnp.float32)   # (G, 2)

    def per_image(d1, d2, r1, fl, mk):
        q = d1[q_xy[:, 1], q_xy[:, 0]]                              # (Q, D)
        q_rel = r1[q_xy[:, 1], q_xy[:, 0]]
        q_valid = mk[q_xy[:, 1], q_xy[:, 0]]
        tgt = fl[q_xy[:, 1], q_xy[:, 0]]                            # (Q, 2)

        def ring(offsets):
            pts = tgt[:, None, :] + offsets[None]                   # (Q, K, 2)
            d = _bilinear_at(d2, pts.reshape(-1, 2)).reshape(
                tgt.shape[0], offsets.shape[0], D)
            return d / jnp.linalg.norm(d, axis=-1, keepdims=True).clip(1e-8)

        pos = ring(pos_off)                                         # (Q, P, D)
        hneg = ring(neg_off)                                        # (Q, R, D)
        sim_pos = jnp.einsum("qd,qpd->qp", q, pos)
        sim_hneg = jnp.einsum("qd,qrd->qr", q, hneg)

        dist_desc = d2[d_xy[:, 1].astype(jnp.int32), d_xy[:, 0].astype(jnp.int32)]
        sim_dist = q @ dist_desc.T                                  # (Q, G)
        d2_t = jnp.sum((tgt[:, None] - d_xy[None]) ** 2, -1)
        sim_dist = jnp.where(d2_t > float(neg_d[0]) ** 2, sim_dist, -1.0)

        sim_neg = jnp.concatenate([sim_hneg, sim_dist], axis=-1)
        ap = _quantized_ap(sim_pos, sim_neg, n_bins)
        loss_q = 1.0 - (ap * q_rel + kappa * (1.0 - q_rel))
        w = q_valid.astype(jnp.float32)
        return jnp.sum(loss_q * w) / w.sum().clip(1.0)

    return jnp.mean(jax.vmap(per_image)(desc1, desc2, rel1, flow, mask))


def r2d2_loss(out1: dict, out2: dict, flow: jnp.ndarray, mask: jnp.ndarray,
              w_cosim: float = 1.0, w_peaky: float = 0.5, w_ap: float = 1.0,
              stride: int = 8, sampler: str = "grid") -> tuple[jnp.ndarray, dict]:
    """Weighted MultiLoss combiner (nets/losses.py:16-50 behavior).

    ``sampler="grid"`` uses in-batch grid negatives; ``sampler="ngh"`` uses the
    NghSampler2-style ring positives/negatives + distractor grid.
    """
    l_cosim = cosim_loss(out1["repeatability"], out2["repeatability"], flow, mask)
    l_peaky = 0.5 * (peaky_loss(out1["repeatability"]) + peaky_loss(out2["repeatability"]))
    ap_fn = ngh_ap_reliability_loss if sampler == "ngh" else ap_reliability_loss
    l_ap = ap_fn(out1["descriptors"], out2["descriptors"],
                 out1["reliability"], flow, mask, stride=stride)
    total = w_cosim * l_cosim + w_peaky * l_peaky + w_ap * l_ap
    return total, {"cosim": l_cosim, "peaky": l_peaky, "ap": l_ap, "total": total}
