"""QKV-projection + attention fused kernel experiment.

The r2 fused-everything block kernel (attn_fused_block.py) lost in context
because it also swallowed LN and the out projection — stages XLA fuses
into neighboring ops for free — and its per-program VPU phases stopped
Mosaic from overlapping anything. This narrower cut fuses ONLY the QKV
matmul into the attention kernel:

    current:  xn --XLA matmul--> qkv (232 MB HBM write)
              qkv --packed kernel--> o   (232 MB HBM read)
    fused:    xn --one kernel (qkv matmul + per-head attention)--> o

dropping the 464 MB/layer qkv round trip (~0.57 ms at v5e HBM bandwidth)
while leaving LN / bias / residual / out-proj in XLA where they fuse.

Measures the isolated sub-block AND a 12-layer in-context chain with the
real encoder structure (LN -> attn sub-block -> out+residual -> LN -> MLP
-> residual) since the r2 experiment proved isolated wins don't transfer.

Run on the real chip: python benchmarks/attn_qkv_fused.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vision_transformers_tpu.ops.flash_attention import packed_flash_attention

B, H, S, D = 256, 12, 197, 64
HD = H * D
MLP_DIM = 3072
SCALE = 1.0 / D ** 0.5
ITERS = 20
LAYERS = 12


def qkv_fused_kernel(xn_ref, wqkv_ref, bqkv_ref, o_ref, *, heads, dh, scale):
    xn = xn_ref[...]                                   # (b_blk, S, HD)
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(xn.dtype)

    hd = heads * dh
    for h in range(heads):
        q = qkv[:, :, h * dh:(h + 1) * dh]
        k = qkv[:, :, hd + h * dh:hd + (h + 1) * dh]
        v = qkv[:, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, h * dh:(h + 1) * dh] = (o / denom).astype(o_ref.dtype)


def qkv_fused_attention(xn, wqkv, bqkv, b_blk, heads=H, dh=D, scale=SCALE):
    b, s, hd = xn.shape
    const = lambda i: (0, 0)
    return pl.pallas_call(
        functools.partial(qkv_fused_kernel, heads=heads, dh=dh, scale=scale),
        grid=(b // b_blk,),
        in_specs=[
            pl.BlockSpec((b_blk, s, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, 3 * hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hd), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_blk, s, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, hd), xn.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * hd * 3 * hd + 4 * b * heads * s * s * dh,
            bytes_accessed=2 * b * s * hd * xn.dtype.itemsize,
            transcendentals=b * heads * s * s,
        ),
    )(xn, wqkv, bqkv)


def ln(x, gamma, beta, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * gamma + beta)


def layer_current(x, w):
    xn = ln(x, w["g1"], w["b1"]).astype(x.dtype)
    qkv = xn @ w["wqkv"] + w["bqkv"]
    attn = packed_flash_attention(qkv, H, SCALE)
    x = x + (attn @ w["wout"] + w["bout"]).astype(x.dtype)
    yn = ln(x, w["g2"], w["b2"]).astype(x.dtype)
    y = jax.nn.gelu(yn @ w["wfc1"] + w["bfc1"], approximate=True)
    return x + (y @ w["wfc2"] + w["bfc2"]).astype(x.dtype)


def layer_fused(x, w, b_blk):
    xn = ln(x, w["g1"], w["b1"]).astype(x.dtype)
    attn = qkv_fused_attention(xn, w["wqkv"], w["bqkv2d"], b_blk)
    x = x + (attn @ w["wout"] + w["bout"]).astype(x.dtype)
    yn = ln(x, w["g2"], w["b2"]).astype(x.dtype)
    y = jax.nn.gelu(yn @ w["wfc1"] + w["bfc1"], approximate=True)
    return x + (y @ w["wfc2"] + w["bfc2"]).astype(x.dtype)


def make_weights(key):
    ks = jax.random.split(key, 8)
    n = lambda k, sh, s=0.02: (jax.random.normal(k, sh, jnp.bfloat16) * s)
    return {
        "wqkv": n(ks[0], (HD, 3 * HD)),
        "bqkv": n(ks[1], (3 * HD,)),
        "bqkv2d": None,  # filled below
        "wout": n(ks[2], (HD, HD)),
        "bout": n(ks[3], (HD,)),
        "wfc1": n(ks[4], (HD, MLP_DIM)),
        "bfc1": n(ks[5], (MLP_DIM,)),
        "wfc2": n(ks[6], (MLP_DIM, HD)),
        "bfc2": n(ks[7], (HD,)),
        "g1": jnp.ones((HD,), jnp.float32),
        "b1": jnp.zeros((HD,), jnp.float32),
        "g2": jnp.ones((HD,), jnp.float32),
        "b2": jnp.zeros((HD,), jnp.float32),
    }


def bench_chain(name, layer_fn, x, w):
    @jax.jit
    def chained(x, w):
        def body(i, acc):
            return layer_fn(acc, w).astype(x.dtype)

        return jax.lax.fori_loop(0, LAYERS, body, x)

    out = chained(x, w)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = chained(x, w)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS / LAYERS * 1e3
    print(f"{name:>22}: {dt:7.3f} ms/layer "
          f"({dt * LAYERS:6.1f} ms / {LAYERS} layers)")
    return dt


def check_numerics(b_blk=2):
    key = jax.random.PRNGKey(3)
    xn = jax.random.normal(jax.random.PRNGKey(9), (4, S, HD), jnp.bfloat16)
    w = make_weights(key)
    w["bqkv2d"] = w["bqkv"][None, :]
    ref = packed_flash_attention(xn @ w["wqkv"] + w["bqkv"], H, SCALE)
    got = qkv_fused_attention(xn, w["wqkv"], w["bqkv2d"], b_blk)
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"numerics (bf16, b_blk={b_blk}): max abs err = {err:.2e}")
    assert err < 5e-2, err


def main():
    check_numerics()
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, HD), jnp.bfloat16)
    w = make_weights(jax.random.PRNGKey(1))
    w["bqkv2d"] = w["bqkv"][None, :]

    qkv_flops = 2 * B * S * HD * 3 * HD
    attn_flops = 4 * B * H * S * S * D
    mlp_flops = 2 * 2 * B * S * HD * MLP_DIM
    out_flops = 2 * B * S * HD * HD
    roof = (qkv_flops + attn_flops + mlp_flops + out_flops) / 197e12 * 1e3
    print(f"B={B} H={H} S={S} D={D} bf16; full encoder layer")
    print(f"FLOP roofline: {roof:.3f} ms/layer")

    base = bench_chain("current(r2)", layer_current, x, w)
    for b_blk in (1, 2, 4):
        try:
            dt = bench_chain(
                f"qkv-fused@{b_blk}",
                lambda acc, ww, bb=b_blk: layer_fused(acc, ww, bb), x, w)
            print(f"    vs current: {(base - dt) / base * 100:+.1f}%")
        except Exception as ex:
            print(f"qkv-fused@{b_blk}: FAILED {type(ex).__name__}: {ex}")


if __name__ == "__main__":
    main()
