"""Per-phase breakdown of the Pallas attention kernel at ViT-B/16 shapes.

VERDICT r1: the measured core (~45 ms / 12 layers) sits 8-10x above the
shape-adjusted bound (~0.4 ms matmul + ~0.4 ms HBM per layer); the claimed
"30-38% MXU ceiling" did not reconcile. This script isolates each phase by
running ablated kernels with identical grids/blockspecs:

  copy      — load q/kt/v, store o (HBM pipeline + launch only)
  mm1       — + QK^T matmul
  mm1mm2    — + AV matmul (softmax replaced by a cast)
  noexp     — full softmax minus the exp (max/sub/sum/div passes)
  full      — the production kernel

Timing: queue ITERS iterations, sync once via a device->host transfer
(jax.block_until_ready is a no-op over the axon tunnel).

Run: python benchmarks/attn_ablation.py  (foreground, on the TPU)
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, S, D = 256, 12, 197, 64
G = B * H
G_BLK = 12
SCALE = 1.0 / D ** 0.5
ITERS = 30


def _specs(g_blk, s, d):
    return dict(
        in_specs=[
            pl.BlockSpec((g_blk, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_blk, d, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_blk, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g_blk, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, s, d), jnp.bfloat16),
        grid=(G // g_blk,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )


def k_copy(q_ref, kt_ref, v_ref, o_ref):
    o_ref[...] = q_ref[...] + v_ref[...] + kt_ref[...].swapaxes(1, 2) * 0


def k_copy_noT(q_ref, kt_ref, v_ref, o_ref):
    del kt_ref
    o_ref[...] = q_ref[...] + v_ref[...]


BMM = lambda a, b: jax.lax.dot_general(
    a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
    preferred_element_type=jnp.float32)


def k_mm1(q_ref, kt_ref, v_ref, o_ref):
    s = BMM(q_ref[...], kt_ref[...]) * SCALE
    # fold S×S → S×D cheaply so mm2 cost isn't included
    o_ref[...] = (s[:, :, :D] + v_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def k_mm1mm2(q_ref, kt_ref, v_ref, o_ref):
    s = BMM(q_ref[...], kt_ref[...]) * SCALE
    o_ref[...] = BMM(s.astype(jnp.bfloat16), v_ref[...]).astype(o_ref.dtype)


def k_noexp(q_ref, kt_ref, v_ref, o_ref):
    s = BMM(q_ref[...], kt_ref[...]) * SCALE
    m = jnp.max(s, axis=-1, keepdims=True)
    e = s - m  # exp elided
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e * pl.reciprocal(denom, approx=False)
    o_ref[...] = BMM(p.astype(jnp.bfloat16), v_ref[...]).astype(o_ref.dtype)


def k_full(q_ref, kt_ref, v_ref, o_ref):
    s = BMM(q_ref[...], kt_ref[...]) * SCALE
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e * pl.reciprocal(denom, approx=False)
    o_ref[...] = BMM(p.astype(jnp.bfloat16), v_ref[...]).astype(o_ref.dtype)


def k_exponly(q_ref, kt_ref, v_ref, o_ref):
    s = BMM(q_ref[...], kt_ref[...]) * SCALE
    e = jnp.exp(s)
    o_ref[...] = BMM(e.astype(jnp.bfloat16), v_ref[...]).astype(o_ref.dtype)


def k_onescol(q_ref, kt_ref, v_ref, o_ref):
    """Candidate: max + exp only on S², sum via the AV matmul's ones column,
    divide on the S×D output instead of the S×S probs."""
    s = BMM(q_ref[...], kt_ref[...]) * SCALE
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m).astype(jnp.bfloat16)
    v = v_ref[...]
    ones = jnp.ones(v.shape[:2] + (8,), v.dtype)  # lane-tile-wide ones col
    vx = jnp.concatenate([v, ones], axis=-1)
    ox = BMM(e, vx)
    denom = ox[:, :, D:D + 1]
    o_ref[...] = (ox[:, :, :D] / jnp.maximum(denom, 1e-30)).astype(o_ref.dtype)


LAYERS = 12  # chain N kernels inside ONE jit — per-call tunnel dispatch
             # (~3 ms) otherwise swamps the measurement entirely.


def bench(name, kernel, g_blk=G_BLK, q=None, kt=None, v=None):
    kw = _specs(g_blk, S, D)
    call = pl.pallas_call(kernel, **kw)

    @jax.jit
    def chained(q, kt, v):
        def body(i, acc):
            # data-dependent chain: out feeds the next q, so layers serialize
            return call(acc, kt, v)
        return jax.lax.fori_loop(0, LAYERS, body, q)

    out = chained(q, kt, v)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = chained(q, kt, v)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS / LAYERS * 1e3
    print(f"{name:>10}: {dt:7.3f} ms/layer   ({dt/(G//g_blk)*1e3:6.2f} us/program, grid={G//g_blk})")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (G, S, D), jnp.bfloat16)
    k = jax.random.normal(kk, (G, S, D), jnp.bfloat16)
    v = jax.random.normal(kv, (G, S, D), jnp.bfloat16)
    kt = jnp.asarray(k.swapaxes(1, 2))
    q, kt, v = map(jnp.asarray, (q, kt, v))

    print(f"shapes: G={G} S={S} D={D} bf16, G_BLK={G_BLK}")
    print(f"rooflines: matmul {4*G*S*S*D/197e12*1e3:.3f} ms @peak, "
          f"HBM {(3*G*S*D*2 + G*S*D*2)/8.19e11*1e3:.3f} ms")
    r = {}
    r["copy_noT"] = bench("copy_noT", k_copy_noT, q=q, kt=kt, v=v)
    r["copy"] = bench("copy", k_copy, q=q, kt=kt, v=v)
    r["mm1"] = bench("mm1", k_mm1, q=q, kt=kt, v=v)
    r["mm1mm2"] = bench("mm1mm2", k_mm1mm2, q=q, kt=kt, v=v)
    r["noexp"] = bench("noexp", k_noexp, q=q, kt=kt, v=v)
    r["exponly"] = bench("exponly", k_exponly, q=q, kt=kt, v=v)
    r["full"] = bench("full", k_full, q=q, kt=kt, v=v)
    r["onescol"] = bench("onescol", k_onescol, q=q, kt=kt, v=v)
    # block-size sensitivity on the full kernel
    for blk in (6, 24):
        if G % blk == 0:
            bench(f"full@{blk}", k_full, g_blk=blk, q=q, kt=kt, v=v)

    print("\nphase attribution (ms):")
    print(f"  launch+HBM pipeline : {r['copy']:.3f}")
    print(f"  QK^T matmul         : {r['mm1'] - r['copy']:.3f}")
    print(f"  AV matmul           : {r['mm1mm2'] - r['mm1']:.3f}")
    print(f"  softmax sans exp    : {r['noexp'] - r['mm1mm2']:.3f}")
    print(f"  exp                 : {r['full'] - r['noexp']:.3f}")
    print(f"  full                : {r['full']:.3f}")
    print(f"  onescol candidate   : {r['onescol']:.3f}")


if __name__ == "__main__":
    main()
