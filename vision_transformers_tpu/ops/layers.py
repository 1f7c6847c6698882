"""Small shared layers: LayerNorm (eps=1e-6 default like the reference),
DropPath / stochastic depth (Swin swin_transformer.py:217, PVT pvt.py:149),
and Identity."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def LayerNorm(epsilon: float = 1e-6, name=None, dtype=jnp.float32):
    return nn.LayerNorm(epsilon=epsilon, name=name, dtype=dtype)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, *args, **kwargs):
        return x


class DropPath(nn.Module):
    """Per-sample stochastic depth: drop the whole residual branch with
    probability ``rate``, rescale survivors by 1/(1-rate)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def drop_path(x, rate, rng, deterministic):
    if rate == 0.0 or deterministic:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
