"""R2D2 training loop: optax AdamW, dp-sharded batches, NaN guard, npz checkpoints.

Counterpart of the reference's trainer (tools/trainer.py:13-72 + train.py:59-136) with
the TPU idioms: the whole step (pair synthesis -> two forwards -> losses -> grads ->
update) is one jitted function; batches shard over the ``data`` mesh axis via input
sharding (GSPMD inserts the gradient all-reduce); checkpoints carry params + optimizer
state + step so runs resume exactly (the reference saves weights only, train.py:136,
and cannot resume).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vo_tpu.models.patchnet import (
    PatchNetSpec,
    apply_patchnet,
    init_patchnet_params,
    update_bn_running_stats,
)
from vo_tpu.train.losses import r2d2_loss
from vo_tpu.train.pairs import synthetic_pair_batch

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclass(frozen=True)
class TrainConfig:
    batch: int = 8
    height: int = 192
    width: int = 192
    lr: float = 1e-4            # train.py:124 (Adam 1e-4, wd 5e-4)
    weight_decay: float = 5e-4
    w_cosim: float = 1.0
    w_peaky: float = 0.5
    w_ap: float = 1.0
    sample_stride: int = 8
    bn_momentum: float = 0.9
    seed: int = 8214
    photometric: bool = False   # gain/bias/gamma/pixel-noise jitter on the warped view
                                # (the reference's ColorJitter/PixelNoise transforms)
    sampler: str = "grid"       # "grid" (in-batch negatives) or "ngh" (NghSampler2-style
                                # ring positives/negatives + distractors, sampler.py:252-382)
    lr_schedule: str = "const"  # "const" (reference behavior, train.py:124) or
                                # "cosine" (warmup + cosine decay to 5% — longer
                                # retrain-parity schedules plateau under constant lr)
    total_steps: int = 0        # cosine decay horizon (required for lr_schedule="cosine")
    warmup_steps: int = 0

    def __hash__(self):
        return hash((self.batch, self.height, self.width, self.lr, self.weight_decay,
                     self.w_cosim, self.w_peaky, self.w_ap, self.sample_stride,
                     self.bn_momentum, self.seed, self.photometric, self.sampler,
                     self.lr_schedule, self.total_steps, self.warmup_steps))


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: TrainConfig):
    if cfg.lr_schedule == "cosine" and cfg.total_steps > 0:
        sched = optax.warmup_cosine_decay_schedule(
            init_value=cfg.lr * (0.0 if cfg.warmup_steps else 1.0),
            peak_value=cfg.lr, warmup_steps=max(cfg.warmup_steps, 1),
            decay_steps=cfg.total_steps, end_value=cfg.lr * 0.05)
        return optax.adamw(sched, weight_decay=cfg.weight_decay)
    return optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)


def create_train_state(spec: PatchNetSpec, cfg: TrainConfig,
                       params=None) -> TrainState:
    if params is None:
        params = init_patchnet_params(jax.random.key(cfg.seed), spec)
    opt = make_optimizer(cfg)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.zeros((), jnp.int32))


def _normalize(img):
    x = img[..., None].repeat(3, axis=-1) / 255.0
    return (x - _IMAGENET_MEAN) / _IMAGENET_STD


@partial(jax.jit, static_argnames=("spec", "cfg"), donate_argnums=(0,))
def train_step(state: TrainState, key, spec: PatchNetSpec, cfg: TrainConfig):
    """One full step: synthesize pairs on device, forward both, loss, grads, update.

    Returns (new_state, metrics). NaN-guarded: a non-finite loss skips the update
    (the reference's trainer asserts and dies, tools/trainer.py:55; we hold instead).
    """
    batch = synthetic_pair_batch(key, cfg.batch, cfg.height, cfg.width,
                                 cfg.photometric)
    return train_step_batch(state, batch, spec, cfg)


@partial(jax.jit, static_argnames=("spec", "cfg"))
def train_step_batch(state: TrainState, batch, spec: PatchNetSpec, cfg: TrainConfig):
    """One step on an explicit (img1, img2, flow, mask) batch.

    This is the data-parallel entry point: place the batch with a NamedSharding over
    the ``data`` mesh axis (params replicated) and GSPMD partitions the two forwards /
    loss over devices with one gradient all-reduce — asserted by the multichip dryrun
    (__graft_entry__.dryrun_multichip checks the compiled HLO and shard shapes).
    """
    img1, img2, flow, mask = batch

    def loss_fn(params):
        out1 = apply_patchnet(params, spec, _normalize(img1), train=True)
        out2 = apply_patchnet(params, spec, _normalize(img2), train=True)
        total, metrics = r2d2_loss(out1, out2, flow, mask, w_cosim=cfg.w_cosim,
                                   w_peaky=cfg.w_peaky, w_ap=cfg.w_ap,
                                   stride=cfg.sample_stride, sampler=cfg.sampler)
        return total, (metrics, out1["bn_stats"])

    (loss, (metrics, bn_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)

    opt = make_optimizer(cfg)
    updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_params = update_bn_running_stats(new_params, bn_stats, cfg.bn_momentum)

    ok = jnp.isfinite(loss)
    params_out = jax.tree.map(lambda new, old: jnp.where(ok, new, old),
                              new_params, state.params)
    opt_out = jax.tree.map(lambda new, old: jnp.where(ok, new, old),
                           new_opt_state, state.opt_state)
    new_state = TrainState(params=params_out, opt_state=opt_out, step=state.step + 1)
    metrics = dict(metrics, skipped=jnp.logical_not(ok))
    return new_state, metrics


def save_checkpoint(path: str, state: TrainState, spec_name: str) -> None:
    """Checkpoint the full train state (params + optimizer + step) as one npz.

    Pickle-free by construction: leaves are stored as indexed npz arrays and the tree
    structure as a JSON sidecar entry, so loading never executes stored code (the
    reference ``eval()``s an architecture string out of its .pt files, R2D2.py:71)."""
    import json

    flat, treedef = jax.tree.flatten(state)
    meta = json.dumps({"spec": spec_name, "step": int(state.step),
                       "treedef": str(treedef), "n_leaves": len(flat)})
    arrays = {f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(flat)}
    with open(path, "wb") as f:  # exact path (np.savez would append .npz)
        np.savez(f, __meta__=np.frombuffer(meta.encode(), np.uint8), **arrays)


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    """Load a ``save_checkpoint`` npz. The template supplies the tree structure and is
    validated against the saved treedef — a mismatched optimizer/model raises instead
    of silently mis-assigning leaves."""
    import json

    with open(path, "rb") as f:
        blob = np.load(f)
        meta = json.loads(bytes(blob["__meta__"].tobytes()).decode())
        flat_t, treedef = jax.tree.flatten(template)
        if meta["treedef"] != str(treedef) or meta["n_leaves"] != len(flat_t):
            raise ValueError(
                f"checkpoint tree mismatch: saved {meta['n_leaves']} leaves / "
                f"{meta['treedef'][:120]}..., template has {len(flat_t)}")
        flat = [jnp.asarray(blob[f"leaf_{i:05d}"]) for i in range(meta["n_leaves"])]
    return jax.tree.unflatten(treedef, flat)
