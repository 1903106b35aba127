"""Optimizers and schedules (optax), replicating the reference's knobs.

- LARS: layer-wise adaptive rate scaling exactly as
  /root/reference/moco_pretraining/moco/moco/optimizer.py — weight decay
  and trust scaling applied ONLY to params with ndim > 1, momentum buffer
  ``mu = mu*momentum + update; p -= lr*mu``.
- SGD / Adam / AdamW selections of the three mains (pretrain :334-345,
  finetune :386-397).
- LR schedules: pretrain per-iteration cosine with linear warmup
  (pretrain :608-624), finetune/fusion per-epoch cosine without warmup or
  milestone step decay (finetune :870-881), with the reference batch-size
  scaling rules (pretrain ``lr*bs/4`` :288, finetune/fusion ``lr*bs/8``
  :345/:398).
- MoCo momentum cosine ramp m -> 1 (pretrain :626-629).
- Linear-probe freezing as an optax mask (the functional version of
  ``requires_grad=False`` on all but the head — finetune :283-287).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax


# ------------------------------------------------------------------ LARS

def lars(learning_rate, weight_decay: float = 0.0, momentum: float = 0.9,
         trust_coefficient: float = 0.001) -> optax.GradientTransformation:
    """Reference-exact LARS (moco/optimizer.py:10-43).

    For each param with ndim > 1: ``dp = g + wd*p`` then
    ``dp *= trust_coefficient * ||p|| / ||dp||`` (1.0 where either norm is
    0). For ndim <= 1 (biases, norm scales): plain gradient. Then heavy-ball
    momentum and the (possibly scheduled) learning rate.
    """

    def init_fn(params):
        return {"mu": jax.tree.map(jnp.zeros_like, params),
                "count": jnp.zeros([], jnp.int32)}

    def scale_one(g, p):
        if p.ndim <= 1:
            return g
        dp = g + weight_decay * p
        pn = jnp.linalg.norm(p)
        un = jnp.linalg.norm(dp)
        q = jnp.where(pn > 0.0, jnp.where(un > 0.0,
                                          trust_coefficient * pn / un, 1.0), 1.0)
        return dp * q

    def update_fn(updates, state, params=None):
        assert params is not None, "LARS requires params"
        dp = jax.tree.map(scale_one, updates, params)
        mu = jax.tree.map(lambda m, d: m * momentum + d, state["mu"], dp)
        lr = learning_rate(state["count"]) if callable(learning_rate) else learning_rate
        out = jax.tree.map(lambda m: -lr * m, mu)
        return out, {"mu": mu, "count": state["count"] + 1}

    return optax.GradientTransformation(init_fn, update_fn)


# -------------------------------------------------------------- schedules

def scaled_init_lr(lr: float, batch_size: int, *, cos: bool,
                   entry: str) -> float:
    """The reference's batch-size LR scaling, applied only in cosine mode.

    entry='pretrain' -> lr*bs/4 (pretrain main :288);
    entry in ('finetune','fusion') -> lr*bs/8 (:345/:398)."""
    if not cos:
        return lr
    div = 4.0 if entry == "pretrain" else 8.0
    return lr * batch_size / div


def pretrain_cosine_lr(init_lr: float, epochs: int, warmup_epochs: int,
                       steps_per_epoch: int) -> Callable:
    """Per-iteration schedule: linear warmup then half-cycle cosine over
    FRACTIONAL epochs (pretrain :514 computes epoch + i/iters)."""

    def sched(step):
        e = step / steps_per_epoch
        warm = init_lr * e / max(warmup_epochs, 1e-8)
        # max(..., 1e-8): epochs == warmup_epochs would divide by zero —
        # eager ZeroDivisionError, or silent NaN lr under jit (jnp.where
        # evaluates both branches)
        cos = init_lr * 0.5 * (
            1.0 + jnp.cos(jnp.pi * (e - warmup_epochs)
                          / max(epochs - warmup_epochs, 1e-8)))
        return jnp.where(e < warmup_epochs, warm, cos)

    return sched


def finetune_lr(init_lr: float, epochs: int, *, cos: bool,
                schedule: Sequence[int] = (),
                steps_per_epoch: int = 1) -> Callable:
    """Per-EPOCH schedule evaluated from the step count: cosine
    ``init_lr * 0.5*(1+cos(pi*epoch/epochs))`` or milestone 0.1x decay
    (finetune :870-881). Epoch is integer (floor), matching the reference's
    per-epoch adjustment."""

    milestones = jnp.asarray(list(schedule), jnp.float32) if len(schedule) else None

    def sched(step):
        e = jnp.floor(step / steps_per_epoch)
        if cos:
            return init_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * e / epochs))
        if milestones is None:
            return jnp.asarray(init_lr, jnp.float32)
        k = jnp.sum(e >= milestones)
        return init_lr * 0.1 ** k

    return sched


def moco_momentum(epoch_frac, m0: float, epochs: int):
    """Cosine ramp of the EMA momentum toward 1 (pretrain :626-629).

    Host-side numpy on purpose: this is evaluated per step in the
    pretrain hot loop on python scalars, and a jnp formulation would
    dispatch (and synchronously fetch) a device computation every
    iteration."""
    return 1.0 - 0.5 * (1.0 + np.cos(np.pi * epoch_frac / epochs)) * (1.0 - m0)


# -------------------------------------------------------------- builders

def build_optimizer(name: str, lr: Callable | float, *,
                    weight_decay: float = 0.0, momentum: float = 0.9,
                    trainable_mask: Optional[Any] = None
                    ) -> optax.GradientTransformation:
    """sgd | adam | adamw | lars, with an optional trainable mask.

    ``trainable_mask`` is a pytree of bools (True = trainable) mirroring the
    params; frozen leaves get zero updates — the linear-probe protocol
    (finetune :283-287) without any optimizer state for frozen params.
    """
    name = name.lower()
    if name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.sgd(lr, momentum=momentum),
        )
    elif name == "adam":
        tx = optax.adam(lr)
    elif name == "adamw":
        tx = optax.adamw(lr, weight_decay=weight_decay)
    elif name == "lars":
        tx = lars(lr, weight_decay=weight_decay, momentum=momentum)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if trainable_mask is not None:
        frozen = jax.tree.map(lambda b: not b, trainable_mask)
        # Zero the FINAL update on frozen leaves (after any decoupled weight
        # decay) so frozen params stay bit-identical — the property the
        # reference's sanity_check() asserts (finetune :841-866).
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen))
    return tx


def head_only_mask(params: Any, head_key: str = "head") -> Any:
    """True only on the classifier-head subtree — LP freeze-all-but-head."""

    def walk(tree, under_head):
        if isinstance(tree, dict):
            return {k: walk(v, under_head or k == head_key) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            t = [walk(v, under_head) for v in tree]
            return type(tree)(t) if not isinstance(tree, tuple) else tuple(t)
        return under_head

    return walk(params, False)
