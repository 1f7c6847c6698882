"""Knowledge-distillation loss (DeiT-style).

Functional jnp core mirroring the semantics of the reference's vendored
DistillationLoss (utils/distillation_loss.py:14-75):
- ``soft``: KL(log_softmax(student_kd/τ) ‖ log_softmax(teacher/τ)) · τ² / numel
  (the "legacy PyTorch" numel normalization, distillation_loss.py:55-67)
- ``hard``: CE(student_kd, argmax(teacher)) (distillation_loss.py:71-72)
- blend: base·(1−α) + distill·α (distillation_loss.py:74)

The teacher forward runs outside the loss under ``stop_gradient`` /
no-grad semantics — in the jitted train step the teacher's params simply are
not differentiated (they are closure constants), replacing the reference's
``torch.no_grad`` (distillation_loss.py:52-53).

A thin class wrapper keeps the reference's call surface
``DistillationLoss(base_criterion, teacher_model, distillation_type, alpha,
tau)(inputs, outputs, labels)``.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import optax


def soft_distillation(student_kd: jax.Array, teacher_logits: jax.Array,
                      tau: float) -> jax.Array:
    t = tau
    log_p = jax.nn.log_softmax(student_kd.astype(jnp.float32) / t, axis=1)
    log_q = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / t, axis=1)
    # KL(q ‖ p) summed, scaled τ², divided by student numel (legacy behavior)
    kl = jnp.sum(jnp.exp(log_q) * (log_q - log_p))
    return kl * (t * t) / student_kd.size


def hard_distillation(student_kd: jax.Array, teacher_logits: jax.Array) -> jax.Array:
    hard_labels = jnp.argmax(teacher_logits, axis=1)
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(
            student_kd.astype(jnp.float32), hard_labels
        )
    )


def distillation_loss(
    base_loss: jax.Array,
    student_kd: Optional[jax.Array],
    teacher_logits: Optional[jax.Array],
    distillation_type: str = "hard",
    alpha: float = 0.5,
    tau: float = 5.0,
) -> jax.Array:
    assert distillation_type in ("none", "soft", "hard")
    if distillation_type == "none":
        return base_loss
    if student_kd is None:
        raise ValueError(
            "When knowledge distillation is enabled, the model is expected "
            "to return a Tuple[cls_logits, dist_logits]"
        )
    teacher_logits = jax.lax.stop_gradient(teacher_logits)
    if distillation_type == "soft":
        dist = soft_distillation(student_kd, teacher_logits, tau)
    else:
        dist = hard_distillation(student_kd, teacher_logits)
    return base_loss * (1.0 - alpha) + dist * alpha


class DistillationLoss:
    """Reference-call-surface wrapper. ``teacher_model`` is a callable
    images → logits (e.g. ``lambda x: model.apply(vars, x)``)."""

    def __init__(self, base_criterion: Callable, teacher_model: Callable,
                 distillation_type: str, alpha: float, tau: float):
        assert distillation_type in ("none", "soft", "hard")
        self.base_criterion = base_criterion
        self.teacher_model = teacher_model
        self.distillation_type = distillation_type
        self.alpha = alpha
        self.tau = tau

    def __call__(self, inputs, outputs, labels):
        outputs_kd = None
        if isinstance(outputs, (tuple, list)):
            outputs, outputs_kd = outputs
        base = self.base_criterion(outputs, labels)
        if self.distillation_type == "none":
            return base
        teacher_logits = self.teacher_model(inputs)
        return distillation_loss(
            base, outputs_kd, teacher_logits,
            self.distillation_type, self.alpha, self.tau,
        )
