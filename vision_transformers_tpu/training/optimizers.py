"""Optimizer zoo.

The reference hard-codes Adam(lr=1e-4) in every train loop (base.py:35,
vanilla_vit.py:221) and searches {Adam, SGD, RMSprop} in its (broken) HPO
objective (utils/optimization.py:26-33). Same surface here via optax, plus
the fused-update extras that matter on TPU: weight decay and gradient
clipping as chain links, all running inside the jitted step.
"""

from __future__ import annotations

from typing import Optional

import optax


def make_optimizer(
    name: str = "adam",
    lr: float = 1e-4,
    *,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    grad_clip_norm: Optional[float] = None,
    schedule=None,
    accumulate_steps: int = 1,
) -> optax.GradientTransformation:
    learning_rate = schedule if schedule is not None else lr
    name = name.lower()
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
