"""Fused Adam/AdamW update as a single Pallas pass per parameter leaf.

Status: built, validated, and MEASURED SLOWER than XLA's fusion at
ViT-B/16 on v5e — opt-in only (``make_optimizer(..., fused=True)``).
The motivating measurement (5.8 ms optax Adam, ~50% of the 2.96 ms HBM
roofline for 2.4 GB of state traffic) predated the 64 MB scoped-VMEM
compile option now set by the trainer; under it XLA's own update costs
~4.4 ms, and this kernel's ~50 per-leaf dispatches (~52 us each over the
axon tunnel) exceed the remaining ~1.4 ms of headroom. Kept because the
arithmetic flips for trees with few large leaves (e.g. fused/stacked
param layouts). The reference pays the analogous cost inside torch's
``optimizer.step()`` (vanilla_vit.py:239). The kernel reads (p, m, v, g)
once, computes the full Adam(+weight-decay) update in fp32 on the VPU,
and writes (p', m', v') once — 7 streams ≈ 2.4 GB at the memory
roofline, with ``input_output_aliases`` making it in-place.

Math matches ``optax.adam``/``adamw`` (scale_by_adam → add_decayed_weights
→ scale(-lr)): bias corrections are folded into two scalars computed at
trace time from the step count and passed through SMEM.

Leaves smaller than ``_MIN_FUSED_SIZE`` stay on plain jnp math — their
traffic is negligible and per-leaf kernel dispatch would dominate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MIN_FUSED_SIZE = 65536
_BLOCK_ELEMS = 131072  # 512 KB fp32 blocks; 7 live streams ≈ 7 MB VMEM


def _adam_kernel(sc_ref, p_ref, m_ref, v_ref, g_ref,
                 po_ref, mo_ref, vo_ref):
    b1 = sc_ref[0]
    b2 = sc_ref[1]
    c1 = sc_ref[2]          # 1/(1 - b1^t)
    c2 = sc_ref[3]          # 1/(1 - b2^t)
    neg_lr = sc_ref[4]
    wd = sc_ref[5]
    eps = sc_ref[6]
    g = g_ref[...]
    m = b1 * m_ref[...] + (1.0 - b1) * g
    v = b2 * v_ref[...] + (1.0 - b2) * (g * g)
    mhat = m * c1
    vhat = v * c2
    p = p_ref[...]
    upd = mhat / (jnp.sqrt(vhat) + eps) + wd * p
    po_ref[...] = p + neg_lr * upd
    mo_ref[...] = m
    vo_ref[...] = v


def _leaf_2d(x):
    if x.ndim >= 2:
        return x.reshape(-1, x.shape[-1])
    return x.reshape(1, -1)


def _fused_leaf(p, m, v, g, scalars, interpret):
    shape = p.shape
    p2, m2, v2, g2 = (_leaf_2d(a) for a in (p, m, v, g))
    r, c = p2.shape
    br = max(8, min(r, _BLOCK_ELEMS // max(c, 1) // 8 * 8))
    if r % br:
        # ragged row edge: fall back to whole-array rows if small enough,
        # else the largest divisor block (elementwise, any split is valid)
        br = r if r * c <= 4 * _BLOCK_ELEMS else br
        while r % br:
            br -= 8 if br > 8 else 1
        br = max(br, 1)
    grid = (r // br,)
    spec = pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _adam_kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((r, c), p2.dtype),
            jax.ShapeDtypeStruct((r, c), m2.dtype),
            jax.ShapeDtypeStruct((r, c), v2.dtype),
        ),
        input_output_aliases={1: 0, 2: 1, 3: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=12 * r * c,
            bytes_accessed=7 * r * c * p2.dtype.itemsize,
            transcendentals=r * c,
        ),
    )(scalars, p2, m2, v2, g2)
    return tuple(o.reshape(shape) for o in out)


def _jnp_leaf(p, m, v, g, b1, b2, c1, c2, neg_lr, wd, eps):
    # fp32 math, but preserve the incoming leaf dtypes on the way out —
    # promoting a bf16 param leaf to fp32 would change the state pytree and
    # force a recompile under jit after one step (ADVICE r3).
    g32 = g.astype(jnp.float32)
    p32 = p.astype(jnp.float32)
    m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
    v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * (g32 * g32)
    upd = (m32 * c1) / (jnp.sqrt(v32 * c2) + eps) + wd * p32
    return ((p32 + neg_lr * upd).astype(p.dtype),
            m32.astype(m.dtype), v32.astype(v.dtype))


def fused_adam_update(params, mu, nu, grads, count_inc, lr,
                      b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0):
    """One Adam(W) step over a param pytree; returns (params', mu', nu').

    ``count_inc``: the 1-based step number (traced int32 ok). ``lr`` may be
    a python float or a traced scalar (schedule value). Large leaves run
    the fused Pallas kernel; small leaves use equivalent jnp math.
    """
    count_inc = jnp.asarray(count_inc, jnp.float32)
    c1 = 1.0 / (1.0 - jnp.power(b1, count_inc))
    c2 = 1.0 / (1.0 - jnp.power(b2, count_inc))
    neg_lr = -jnp.asarray(lr, jnp.float32)
    scalars = jnp.stack([
        jnp.float32(b1), jnp.float32(b2), c1, c2, neg_lr,
        jnp.float32(weight_decay), jnp.float32(eps),
    ])
    interpret = jax.default_backend() != "tpu"

    flat_p, treedef = jax.tree.flatten(params)
    flat_m = treedef.flatten_up_to(mu)
    flat_v = treedef.flatten_up_to(nu)
    flat_g = treedef.flatten_up_to(grads)
    new_p, new_m, new_v = [], [], []
    for p, m, v, g in zip(flat_p, flat_m, flat_v, flat_g):
        if p.size >= _MIN_FUSED_SIZE and p.dtype == jnp.float32:
            po, mo, vo = _fused_leaf(p, m, v, g, scalars, interpret)
        else:
            po, mo, vo = _jnp_leaf(p, m, v, g, scalars[0], scalars[1],
                                   scalars[2], scalars[3], scalars[4],
                                   scalars[5], scalars[6])
        new_p.append(po)
        new_m.append(mo)
        new_v.append(vo)
    return (treedef.unflatten(new_p), treedef.unflatten(new_m),
            treedef.unflatten(new_v))
