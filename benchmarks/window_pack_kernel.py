"""Prototype: multi-window Pallas kernel with block-diagonal MXU packing.

Small-window attention (Swin N=49, dh=32) issues tens of thousands of
(49,32) matmuls — ~4% of roofline. This kernel packs P=4 windows per MXU
op:

  scores: q_bd (P·N, P·dh=128) block-diagonal  ·contract 128 lanes·
          k_cat (N, 128) with window p's k at lanes 32p..32(p+1)
          → (P·N, N): row-block p = q_p @ k_p^T, FULL 128-deep contraction
  PV:     probs (P·N, N) @ v_cat (N, 128) → (P·N, 128); window p's output
          sits at (rows pN.., lanes 32p..) — extract the diagonal blocks.

Everything (block-diag build, softmax, extraction) stays in VMEM.

Run on the real chip: python benchmarks/window_pack_kernel.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vision_transformers_tpu.ops.attention import dot_product_attention

B_IMG, NW, H, N, DH = 128, 64, 3, 49, 32   # Swin-T stage 1 @ 224
P = 4                                       # windows per MXU pack
G = B_IMG * NW                              # total windows


def window_pack_kernel(qkv_ref, bias_ref, o_ref, *, heads, dh, p, n, scale):
    """qkv_ref: (Gb*P, N, 3*H*dh). bias_ref: (H, P*N, N) — the packed
    rel-pos bias (+shift mask) for this pack's windows. o_ref: like qkv's
    first H*dh lanes."""
    hd = heads * dh
    gbp = qkv_ref.shape[0]
    gb = gbp // p

    for h in range(heads):
        q = qkv_ref[:, :, h * dh:(h + 1) * dh]            # (Gb*P, N, dh)
        k = qkv_ref[:, :, hd + h * dh:hd + (h + 1) * dh]
        v = qkv_ref[:, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh]

        q4 = q.reshape(gb, p, n, dh)
        # block-diagonal Q: (Gb, P*N, P*dh); window i occupies rows
        # iN..(i+1)N and lanes i*dh..(i+1)*dh
        q_bd = jnp.concatenate([
            jnp.pad(q4[:, i], ((0, 0), (0, 0), (i * dh, (p - 1 - i) * dh)))
            for i in range(p)
        ], axis=1)                                        # (Gb, P*N, P*dh)
        k_cat = jnp.concatenate([
            k.reshape(gb, p, n, dh)[:, i] for i in range(p)
        ], axis=2)                                        # (Gb, N, P*dh)
        s = jax.lax.dot_general(
            q_bd, k_cat,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                         # (Gb, P*N, N)
        s = s + bias_ref[h][None]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        probs = (e / denom).astype(v.dtype)

        v_cat = jnp.concatenate([
            v.reshape(gb, p, n, dh)[:, i] for i in range(p)
        ], axis=2)                                        # (Gb, N, P*dh)
        o_all = jax.lax.dot_general(
            probs, v_cat,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                 # (Gb, P*N, P*dh)
        o = jnp.concatenate([
            o_all[:, i * n:(i + 1) * n, i * dh:(i + 1) * dh][:, None]
            for i in range(p)
        ], axis=1).reshape(gbp, n, dh)                    # diagonal blocks
        o_ref[:, :, h * dh:(h + 1) * dh] = o.astype(o_ref.dtype)


def window_pack_attention(qkv, bias_packed, heads=H, dh=DH, p=P,
                          g_blk=8, scale=None):
    g, n, three_hd = qkv.shape
    hd = three_hd // 3
    if scale is None:
        scale = 1.0 / dh ** 0.5
    blk = g_blk * p
    return pl.pallas_call(
        functools.partial(window_pack_kernel, heads=heads, dh=dh, p=p,
                          n=n, scale=scale),
        grid=(g // blk,),
        in_specs=[
            pl.BlockSpec((blk, n, three_hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, p * n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, n, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * heads * n * n * dh,
            bytes_accessed=4 * g * n * hd * qkv.dtype.itemsize,
            transcendentals=g * heads * n * n,
        ),
    )(qkv, bias_packed)


def t(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(G, N, 3 * H * DH) * 0.5, jnp.bfloat16)
    rel_bias = jnp.asarray(rng.randn(H, N, N) * 0.02, jnp.float32)
    # same bias for every window here; packed = tiled P times on sublanes
    bias_packed = jnp.tile(rel_bias, (1, P, 1))

    # oracle: current dispatcher path on the split-head layout
    hd = H * DH
    q, k, v = jnp.split(qkv, 3, axis=-1)
    spl = lambda a: a.reshape(G, N, H, DH).transpose(0, 2, 1, 3)
    ref = dot_product_attention(spl(q), spl(k), spl(v), bias=rel_bias[None])
    ref = ref.transpose(0, 2, 1, 3).reshape(G, N, hd)

    got = window_pack_attention(qkv, bias_packed)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"numerics: max abs err = {err:.2e}")

    cur = jax.jit(lambda q, k, v: dot_product_attention(
        q, k, v, bias=rel_bias[None]))
    ms0 = t(cur, spl(q), spl(k), spl(v))
    print(f"current core (split-head): {ms0:.2f} ms")
    for gb in (4, 8, 16):
        try:
            f = jax.jit(functools.partial(window_pack_attention, g_blk=gb))
            ms = t(f, qkv, bias_packed)
            print(f"window-pack kernel g_blk={gb}: {ms:.2f} ms "
                  f"({(ms0 - ms) / ms0 * 100:+.0f}%)")
        except Exception as ex:
            print(f"g_blk={gb}: FAILED {type(ex).__name__}: {ex}")


if __name__ == "__main__":
    main()
