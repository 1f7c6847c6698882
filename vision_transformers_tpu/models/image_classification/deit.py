"""DeiT: Data-efficient image Transformer with knowledge distillation.

The reference outsources the distilled architecture to timm's
``VisionTransformerDistilled`` and uses a pretrained regnety_160 teacher
(deit.py:32-45); there is no timm (and no pretrained-weight egress) on TPU,
so the distilled ViT is implemented natively (SURVEY.md §7 step 7): class
token + distillation token, dual heads, ``set_distilled_training(True)``
semantics — training forward returns (cls_logits, dist_logits), eval forward
returns their mean (timm's deit eval behavior).

``train_model_with_distillation`` mirrors the reference loop (deit.py:36-137):
hard distillation by default (α=0.5, τ=5, deit.py:48-49), per-batch teacher
forward under stop-gradient, val/test phases with plain CE on the fused
logits. The teacher is injected — any (model, variables) pair or callable
images→logits — replacing the unavailable pretrained regnety
(SURVEY.md §7 hard parts: "checkpoint-injected teachers").
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from vision_transformers_tpu.core.initializers import (
    normal_init,
    trunc_normal_init,
    zeros_init,
)
from vision_transformers_tpu.models.image_classification.base import TrainableModel
from vision_transformers_tpu.models.image_classification.vanilla_vit import EncoderBlock
from vision_transformers_tpu.ops.patch_embed import PatchEmbed
from vision_transformers_tpu.utils.distillation_loss import distillation_loss


class DeiT(nn.Module, TrainableModel):
    """Distilled ViT. With ``distilled_training=True`` the forward returns
    (cls_logits, dist_logits); otherwise the averaged logits."""

    image_size: int
    patch_size: int
    num_layers: int
    num_heads: int
    embed_dim: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attention_dropout: float = 0.0
    num_classes: int = 100
    distilled_training: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # DeiT pads indivisible inputs up to the next patch multiple (the
        # reference feeds 32px into patch 16 via timm's dynamic padding).
        grid = -(-self.image_size // self.patch_size)
        self.num_patches = grid * grid
        self.patch_embed = PatchEmbed(
            self.embed_dim, self.patch_size, dtype=self.dtype
        )
        self.cls_token = self.param(
            "cls_token", trunc_normal_init(0.02), (1, 1, self.embed_dim)
        )
        self.dist_token = self.param(
            "dist_token", trunc_normal_init(0.02), (1, 1, self.embed_dim)
        )
        self.pos_embed = self.param(
            "pos_embed", trunc_normal_init(0.02),
            (1, self.num_patches + 2, self.embed_dim),
        )
        self.pos_drop = nn.Dropout(self.dropout)
        self.blocks = [
            EncoderBlock(
                self.num_heads, self.embed_dim,
                int(self.embed_dim * self.mlp_ratio),
                self.dropout, self.attention_dropout,
                dtype=self.dtype, name=f"block{i}",
            )
            for i in range(self.num_layers)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_f")
        self.head = nn.Dense(
            self.num_classes, kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="head",
        )
        self.head_dist = nn.Dense(
            self.num_classes, kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="head_dist",
        )

    def forward_features(self, images, *, deterministic: bool = True):
        n, h, w, c = images.shape
        p = self.patch_size
        if h % p or w % p:
            images = jnp.pad(
                images, ((0, 0), (0, (-h) % p), (0, (-w) % p), (0, 0))
            )
        tokens, _ = self.patch_embed(images)
        cls = jnp.broadcast_to(
            self.cls_token.astype(tokens.dtype), (n, 1, self.embed_dim))
        dist = jnp.broadcast_to(
            self.dist_token.astype(tokens.dtype), (n, 1, self.embed_dim))
        tokens = jnp.concatenate([cls, dist, tokens], axis=1)
        tokens = tokens + self.pos_embed.astype(tokens.dtype)
        tokens = self.pos_drop(tokens, deterministic=deterministic)
        for block in self.blocks:
            tokens = block(tokens, deterministic=deterministic)
        return self.norm(tokens)

    def __call__(self, images, *, deterministic: bool = True):
        feats = self.forward_features(images, deterministic=deterministic)
        cls_logits = self.head(feats[:, 0])
        dist_logits = self.head_dist(feats[:, 1])
        if self.distilled_training and not deterministic:
            return cls_logits, dist_logits
        return (cls_logits + dist_logits) / 2.0

    # ------------------------------------------------------------------
    def train_model_with_distillation(
        self,
        train_loader,
        test_loader,
        epochs: int,
        val_loader=None,
        *,
        teacher: Union[Tuple, Callable, None] = None,
        distillation_type: str = "hard",
        alpha: float = 0.5,
        tau: float = 5.0,
        lr: float = 1e-4,
        seed: int = 0,
        verbose: bool = True,
    ):
        """Reference-parity distillation loop returning the same metrics
        dict (deit.py:133-137). ``teacher``: (model, variables) or callable
        images→logits; must be supplied (no pretrained zoo on TPU)."""
        from vision_transformers_tpu.training import trainer as T

        if teacher is None:
            raise ValueError(
                "DeiT distillation needs an injected teacher: pass "
                "teacher=(model, variables) or a callable images->logits "
                "(no pretrained regnety available in a TPU-clean env)"
            )
        if callable(teacher) and not isinstance(teacher, tuple):
            teacher_fn = teacher
        else:
            t_model, t_vars = teacher
            teacher_fn = lambda x: t_model.apply(t_vars, x)

        normalize = getattr(train_loader, "normalize", None)
        rng = jax.random.PRNGKey(seed)

        first = next(iter(train_loader))
        images0 = T._as_nhwc(T._to_numpy(first[0]))
        batch_size = images0.shape[0]
        state = T.make_train_state(self, rng, jnp.asarray(images0[:1]), lr=lr)

        def train_step(state, images, labels, weights, rng):
            drop_rng = jax.random.fold_in(rng, state.step)
            x = T._default_preprocess(images, normalize)
            teacher_logits = jax.lax.stop_gradient(teacher_fn(x))

            def loss_fn(params):
                cls_logits, dist_logits = self.apply(
                    {"params": params}, x,
                    deterministic=False, rngs={"dropout": drop_rng},
                )
                base = T.cross_entropy_with_weights(cls_logits, labels, weights)
                loss = distillation_loss(
                    base, dist_logits, teacher_logits,
                    distillation_type, alpha, tau,
                )
                return loss, cls_logits

            (loss, cls_logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            state = state.apply_gradients(grads=grads)
            pred = jnp.argmax(cls_logits, axis=-1)
            correct = jnp.sum((pred == labels) * weights)
            n = jnp.sum(weights)
            return state, loss * n, correct, n

        train_step = jax.jit(train_step, donate_argnums=0)
        eval_step = jax.jit(T.eval_step_fn(self, normalize))

        history = {
            "train_loss": [], "val_loss": [] if val_loader else None,
            "test_loss": [],
            "train_accuracy": [], "val_accuracy": [] if val_loader else None,
            "test_accuracy": [],
        }

        def run_eval(params, loader):
            ls = jnp.float32(0); cs = jnp.float32(0); ns = jnp.float32(0)
            for images, labels in loader:
                images = T._as_nhwc(T._to_numpy(images))
                labels = T._to_numpy(labels)
                images, labels, weights = T._pad_batch(images, labels, batch_size)
                l, c, n = eval_step(params, jnp.asarray(images),
                                    jnp.asarray(labels), jnp.asarray(weights))
                ls += l; cs += c; ns += n
            ns = jnp.maximum(ns, 1.0)
            return float(ls / ns), float(cs / ns)

        step_rng = jax.random.fold_in(rng, 1)
        for epoch in range(epochs):
            ls = jnp.float32(0); cs = jnp.float32(0); ns = jnp.float32(0)
            it = tqdm(train_loader, desc=f"Epoch {epoch + 1}/{epochs}",
                      unit="batch", disable=not verbose)
            for images, labels in it:
                images = T._as_nhwc(T._to_numpy(images))
                labels = T._to_numpy(labels)
                images, labels, weights = T._pad_batch(images, labels, batch_size)
                state, l, c, n = train_step(
                    state, jnp.asarray(images), jnp.asarray(labels),
                    jnp.asarray(weights), step_rng,
                )
                ls += l; cs += c; ns += n
            ns = jnp.maximum(ns, 1.0)
            history["train_loss"].append(float(ls / ns))
            history["train_accuracy"].append(float(cs / ns))
            if val_loader is not None:
                vl, va = run_eval(state.params, val_loader)
                history["val_loss"].append(vl)
                history["val_accuracy"].append(va)
            tl, ta = run_eval(state.params, test_loader)
            history["test_loss"].append(tl)
            history["test_accuracy"].append(ta)
            if verbose:
                tqdm.write(
                    f"Epoch {epoch + 1}/{epochs} - "
                    f"Train Loss: {history['train_loss'][-1]:.4f}, "
                    f"Train Acc: {history['train_accuracy'][-1]:.4f}, "
                    f"Test Loss: {tl:.4f}, Test Acc: {ta:.4f}"
                )

        history["final_state"] = state
        return history


if __name__ == "__main__":
    # Distilled training needs an injected teacher (no pretrained zoo on
    # TPU); the plain variant trains via the shared loop:
    from vision_transformers_tpu.cli import run_reference_main

    run_reference_main("deit_tiny_cifar100")
