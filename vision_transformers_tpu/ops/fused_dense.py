"""Fused LayerNorm + Dense (+ activation) Pallas kernel.

Why (measured on v5e, benchmarks/vit_residue.py): in the pre-LN encoder
block (reference vanilla_vit.py:73-83) every LayerNorm's normalized output
is written to HBM and immediately re-read by the adjacent projection — at
ViT-B/16 batch 256 that is ~154 MB of avoidable traffic per LN per layer
(~0.19 ms at the 819 GB/s roofline, ~4.5 ms over 12 layers for ln_1+ln_2).
XLA does not fuse the normalize into the dot's operand read, so the fusion
has to be a kernel: this one computes the row statistics in fp32 on the
VPU and feeds the normalized rows straight into the MXU matmul from VMEM,
with the weight block resident across row steps. The optional activation
(GELU) runs on the output block before the store, preserving the epilogue
fusion XLA would otherwise have given the plain matmul.

Backward is a jnp recompute (custom_vjp): LN + matmul gradients are plain
MXU/VPU work XLA already runs at roofline, and recompute keeps the
normalized activations out of HBM in the forward.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-program VMEM budget. Mosaic double-buffers blocks (including
# constant-index weight blocks — measured r2), so blocks count twice.
import os as _os

_VMEM_TARGET = int(_os.environ.get("LN_DENSE_VMEM", 13 * 1024 * 1024))
_FORCE_BR = int(_os.environ.get("LN_DENSE_BR", 0))
_FORCE_BN = int(_os.environ.get("LN_DENSE_BN", 0))


def _act_fn(activation: Optional[str]):
    if activation is None:
        return None
    if activation == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if activation == "gelu_erf":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(f"unknown activation: {activation}")


def _plan(r: int, d: int, n: int, itemsize: int):
    """Pick (block_rows, block_cols): weight block (d, BN) held across row
    steps, x row block (BR, d), out (BR, BN); fp32 LN temporaries ~3 x-block
    sized buffers."""
    if _FORCE_BR and _FORCE_BN:  # manual override (both must be set)
        return _FORCE_BR, _FORCE_BN
    for bn in (n, *(n // k for k in (2, 3, 4, 6, 8) if n % k == 0)):
        if bn % 128 and bn != n:
            continue
        for br in (512, 384, 256, 128):
            blocks = 2 * (br * d + br * bn + d * bn) * itemsize
            temps = 3 * br * d * 4 + br * bn * 4
            if blocks + temps <= _VMEM_TARGET:
                return br, bn
    # Fallback: bn MUST divide n (the grid is n // bn — a non-divisor would
    # silently leave trailing output columns unwritten). Largest divisor of
    # n that is a lane-aligned multiple of 128 and <= 512, else n itself.
    for k in range(1, n + 1):
        if n % k == 0 and (n // k) <= 512 and (n // k) % 128 == 0:
            return 128, n // k
    return 128, n


def _ln_dense_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref,
                     *, eps, activation):
    xf = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * g_ref[...] + b_ref[...]).astype(x_ref.dtype)
    y = jnp.dot(xn, w_ref[...], preferred_element_type=jnp.float32)
    if bias_ref is not None:
        y = y + bias_ref[...]
    act = _act_fn(activation)
    if act is not None:
        y = act(y)
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_dense_fwd_pallas(x2d, gamma, beta, w, bias, eps, activation):
    r, d = x2d.shape
    n = w.shape[1]
    br, bn = _plan(r, d, n, x2d.dtype.itemsize)
    grid = (pl.cdiv(r, br), n // bn)

    in_specs = [
        pl.BlockSpec((br, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [x2d, gamma.reshape(1, d).astype(jnp.float32),
            beta.reshape(1, d).astype(jnp.float32), w]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(bias.reshape(1, n).astype(jnp.float32))

    def kernel(*refs):
        if bias is not None:
            x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref = refs
        else:
            x_ref, g_ref, b_ref, w_ref, o_ref = refs
            bias_ref = None
        _ln_dense_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref,
                         eps=eps, activation=activation)

    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, n), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * d * n,
            bytes_accessed=(r * d + r * n + d * n) * x2d.dtype.itemsize,
            transcendentals=r * n if activation else 0,
        ),
    )(*args)


def _ln_dense_ref(x2d, gamma, beta, w, bias, eps, activation):
    """jnp twin: unit-test oracle and the recompute backward."""
    xf = x2d.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * gamma.astype(jnp.float32)
          + beta.astype(jnp.float32)).astype(x2d.dtype)
    y = jnp.dot(xn, w, preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    act = _act_fn(activation)
    if act is not None:
        y = act(y)
    return y.astype(x2d.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _ln_dense(x2d, gamma, beta, w, bias, eps, activation):
    return _ln_dense_fwd_pallas(x2d, gamma, beta, w, bias, eps, activation)


def _ln_dense_fwd_rule(x2d, gamma, beta, w, bias, eps, activation):
    out = _ln_dense_fwd_pallas(x2d, gamma, beta, w, bias, eps, activation)
    return out, (x2d, gamma, beta, w, bias)


def _ln_dense_bwd_rule(eps, activation, res, dy):
    x2d, gamma, beta, w, bias = res
    if bias is None:
        _, vjp = jax.vjp(
            lambda x, g, b, wk: _ln_dense_ref(x, g, b, wk, None, eps,
                                              activation),
            x2d, gamma, beta, w)
        return vjp(dy) + (None,)
    _, vjp = jax.vjp(
        lambda x, g, b, wk, bb: _ln_dense_ref(x, g, b, wk, bb, eps,
                                              activation),
        x2d, gamma, beta, w, bias)
    return vjp(dy)


_ln_dense.defvjp(_ln_dense_fwd_rule, _ln_dense_bwd_rule)


def ln_dense(x, gamma, beta, w, bias=None, *, eps: float = 1e-6,
             activation: Optional[str] = None):
    """act((LN(x) * gamma + beta) @ w + bias) without materializing the
    normalized activations in HBM.

    x: (..., D); gamma/beta: (D,); w: (D, N); bias: (N,) or None.
    activation: None | 'gelu_tanh' | 'gelu_erf'. Returns (..., N) in
    x.dtype. LN statistics and the matmul accumulate in fp32.
    """
    d = x.shape[-1]
    lead = x.shape[:-1]
    out = _ln_dense(x.reshape(-1, d), gamma, beta, w, bias,
                    float(eps), activation)
    return out.reshape(*lead, w.shape[1])
