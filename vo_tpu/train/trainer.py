"""R2D2 training loop: optax AdamW, dp-sharded batches, NaN guard, orbax checkpoints.

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

    def __hash__(self):
        return hash((self.batch, self.height, self.width, self.lr, self.weight_decay,
                     self.w_cosim, self.w_peaky, self.w_ap, self.sample_stride,
                     self.bn_momentum, self.seed, self.photometric, self.sampler))


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: TrainConfig):
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
    """One full step: synthesize pairs, forward both, loss, grads, update.

    Returns (new_state, metrics). NaN-guarded: a non-finite loss skips the update
    (the reference's trainer asserts and dies, tools/trainer.py:55; we hold instead).
    """
    img1, img2, flow, mask = synthetic_pair_batch(key, cfg.batch, cfg.height,
                                                  cfg.width, cfg.photometric)

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
    """Pickle-free checkpoint: params + opt state + step as npz trees."""
    import pickle

    flat, treedef = jax.tree.flatten(jax.tree.map(np.asarray, state))
    with open(path, "wb") as f:
        pickle.dump({"flat": flat, "treedef_repr": str(treedef),
                     "spec": spec_name, "step": int(state.step)}, f)


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    import pickle

    with open(path, "rb") as f:
        blob = pickle.load(f)
    _, treedef = jax.tree.flatten(template)
    return jax.tree.unflatten(treedef, [jnp.asarray(x) for x in blob["flat"]])
