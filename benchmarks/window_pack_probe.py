"""Block-diagonal window-packing probe for small-window attention.

Swin stage-1 attention runs at ~4% of roofline: (49, 32) per-window
matmuls waste 3/4 of the MXU's 128-deep contraction and issue 24k tiny
ops. Trick: for a group of P windows, stack K along the contraction dim
(P·dh = 128 for P=4, dh=32) and lay Q out block-diagonally

    Q_bd (P·N, P·dh) = diag(q_0 … q_{P-1});  K_cat (P·dh, N) rows 32i..
    S = Q_bd @ K_cat  →  row-block i = q_i @ k_i^T   (P windows, 1 matmul)

full 128-deep contraction, matmul count / P. Same shape trick for PV with
the probabilities block-diagonal. This probe checks numerics + speed of
the scores matmul formulation in XLA before committing to a kernel.

Run: python benchmarks/window_pack_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

G, H, N, DH = 128 * 64, 3, 49, 32  # Swin-T stage 1 @224, batch 128
P = 4                               # windows per packed matmul


def t(fn, iters=20):
    out = fn()
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    b = G * H
    q = jax.random.normal(jax.random.PRNGKey(0), (b, N, DH), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, N, DH), jnp.bfloat16)

    # baseline: b tiny batched matmuls
    base = jax.jit(lambda: jnp.einsum(
        "bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32))
    ms_base = t(base)
    print(f"baseline batched ({b}x ({N},{DH})@({DH},{N})): {ms_base:.2f} ms")

    # packed: block-diag Q (P*N, P*DH), K stacked on contraction
    nb = b // P
    q4 = q.reshape(nb, P, N, DH)
    k4 = k.reshape(nb, P, N, DH)

    def packed():
        # Q_bd: (nb, P*N, P*DH) block-diagonal
        eye = jnp.eye(P, dtype=q.dtype)                      # (P, P)
        q_bd = jnp.einsum("gpnd,pq->gpnqd", q4, eye)         # (nb,P,N,P,DH)
        q_bd = q_bd.reshape(nb, P * N, P * DH)
        k_cat = k4.transpose(0, 1, 3, 2).reshape(nb, P * DH, N)
        s = jax.lax.dot_general(
            q_bd, k_cat,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (nb, P*N, N)
        return s

    ms_pack = t(jax.jit(packed))
    print(f"packed P={P} ({nb}x ({P*N},{P*DH})@({P*DH},{N})): {ms_pack:.2f} ms")

    # numerics
    s_ref = np.asarray(base())
    s_pack = np.asarray(packed()).reshape(nb, P, N, N).reshape(b, N, N)
    err = np.abs(s_ref - s_pack).max()
    print(f"max abs err: {err:.2e}")


if __name__ == "__main__":
    main()
