"""Optimizer zoo.

The reference hard-codes Adam(lr=1e-4) in every train loop (base.py:35,
vanilla_vit.py:221) and searches {Adam, SGD, RMSprop} in its (broken) HPO
objective (utils/optimization.py:26-33). Same surface here via optax, plus
the fused-update extras that matter on TPU: weight decay and gradient
clipping as chain links, all running inside the jitted step.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax


class FusedAdam(NamedTuple):
    """optax-shaped Adam(W) whose ``fused_apply`` runs the whole update —
    moments, bias correction, weight decay, AND the parameter add — as one
    Pallas memory pass per leaf (ops/fused_adam.py). TrainState
    .apply_gradients dispatches to ``fused_apply`` when present; the plain
    ``update`` path stays optax-compatible for chained/inspection use.
    Opt-in only — see make_optimizer for the measured rejection."""

    init: Callable
    update: Callable
    fused_apply: Callable


def _fused_adam(learning_rate: Union[float, Callable], b1=0.9, b2=0.999,
                eps=1e-8, weight_decay=0.0) -> FusedAdam:
    from vision_transformers_tpu.ops.fused_adam import fused_adam_update

    def _lr(count_inc):
        if callable(learning_rate):
            # schedules are 0-based on the pre-update count (optax semantics)
            return learning_rate(count_inc - 1)
        return learning_rate

    def init(params):
        zeros = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=zeros,
            nu=jax.tree.map(jnp.copy, zeros))

    def update(grads, state, params=None):
        # optax-contract fallback (returns updates): jnp math, same result
        if weight_decay and params is None:
            # match optax.adamw: decoupled weight decay needs the params
            raise ValueError(
                "FusedAdam with weight_decay != 0 requires params in "
                "update() (optax.adamw contract)")
        count_inc = state.count + 1
        t = count_inc.astype(jnp.float32)
        c1 = 1.0 / (1.0 - jnp.power(b1, t))
        c2 = 1.0 / (1.0 - jnp.power(b2, t))
        mu = jax.tree.map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1.0 - b2) * (g * g), state.nu, grads)
        lr = _lr(t)

        def upd(m, v, p):
            base = (m * c1) / (jnp.sqrt(v * c2) + eps)
            if weight_decay:
                base = base + weight_decay * p
            return -lr * base

        if params is None:
            updates = jax.tree.map(
                lambda m, v: upd(m, v, None), mu, nu)
        else:
            updates = jax.tree.map(upd, mu, nu, params)
        return updates, optax.ScaleByAdamState(
            count=count_inc, mu=mu, nu=nu)

    def fused_apply(params, grads, state):
        count_inc = state.count + 1
        new_p, new_m, new_v = fused_adam_update(
            params, state.mu, state.nu, grads,
            count_inc, _lr(count_inc.astype(jnp.float32)),
            b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
        return new_p, optax.ScaleByAdamState(
            count=count_inc, mu=new_m, nu=new_v)

    return FusedAdam(init=init, update=update, fused_apply=fused_apply)


def make_optimizer(
    name: str = "adam",
    lr: float = 1e-4,
    *,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    grad_clip_norm: Optional[float] = None,
    schedule=None,
    accumulate_steps: int = 1,
    fused: Optional[bool] = None,
) -> optax.GradientTransformation:
    """``fused=True`` selects the single-pass Pallas Adam(W) update
    (ops/fused_adam.py). Default is OFF: measured on v5e at ViT-B/16
    (PERFORMANCE.md "fused Adam" entry), the per-leaf kernel dispatch
    (~52 us x ~50 leaves over the axon tunnel) costs more than the
    ~1.4 ms of HBM traffic it saves — XLA's own Adam fusion under the
    64 MB scoped-VMEM compile option already runs at ~4.4 ms vs the
    2.96 ms roofline. The kernel stays available for param trees with
    few large leaves, where the arithmetic flips."""
    learning_rate = schedule if schedule is not None else lr
    name = name.lower()
    if fused is None:
        fused = False
    if fused and name in ("adam", "adamw"):
        if grad_clip_norm is not None or accumulate_steps > 1:
            raise ValueError(
                "fused adam does not compose with grad_clip_norm or "
                "gradient accumulation; pass fused=False")
        return _fused_adam(learning_rate, weight_decay=weight_decay)
    if name == "adam":
        tx = (
            optax.adamw(learning_rate, weight_decay=weight_decay)
            if weight_decay
            else optax.adam(learning_rate)
        )
    elif name == "adamw":
        tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    elif name == "sgd":
        tx = optax.sgd(learning_rate, momentum=momentum)
    elif name == "rmsprop":
        tx = optax.rmsprop(learning_rate, momentum=momentum)
    else:
        raise ValueError(f"Unknown optimizer: {name}")
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    if accumulate_steps > 1:
        # gradient accumulation: apply every N steps with the mean gradient
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def cosine_schedule(base_lr: float, total_steps: int, warmup_steps: int = 0):
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
    )
