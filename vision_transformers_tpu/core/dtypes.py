"""Dtype policy: fp32 params, bf16 compute on TPU.

The reference trains everything in fp32 (PyTorch default). On TPU the MXU's
native input precision is bfloat16; fp32 master weights with bf16 activations
is the idiomatic policy and what the roofline target assumes. Softmax and
normalization statistics stay fp32 for stability.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Mixed-precision policy threaded through every model."""

    param_dtype: Any = jnp.float32   # master weights
    compute_dtype: Any = jnp.bfloat16  # matmul/activation dtype
    # softmax / layernorm statistics always accumulate in fp32 inside the ops.

    def cast_to_compute(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def default_policy() -> Policy:
    """bf16 compute on TPU; fp32 everywhere on CPU (test/oracle runs)."""
    if on_tpu():
        return Policy()
    return Policy(compute_dtype=jnp.float32)
