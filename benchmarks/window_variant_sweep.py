"""Adjudicate the batched-window variant (VERDICT r4 #5) — end to end.

window_pack_sweep_r04.json showed a bias-free "batched32" kernel beating
the pack kernel at Swin stage-1/2 op shapes (4.66 vs 5.01 ms, 2.56 vs
2.61). That comparison was incomplete twice over: it had no relative-
position bias (production windows always carry one), and it omitted the
candidate production actually routes to at those stages — the fused NHWC
kernel, which folds roll/partition/reverse into its DMA and therefore
can only be compared END TO END from the dense map.

This sweep times the full dense-map -> attention-output path (everything
between the qkv projection and the output projection) at every Swin-T
@224 batch-128 stage, shifted and unshifted, with the real combined bias:

  pack       window_partition -> multi-window pack kernel -> reverse
  batched    window_partition -> per-head batched kernel (WITH bias,
             grid-modulo indexed like the pack kernel) -> reverse
  fused      fused NHWC kernel (slab or flat plan, production routing)
  xla        window_partition -> split-head jnp attention -> reverse

Also re-runs the r4 sweep's HTTP-500 cell (batched128 @ s2) implicitly:
batched runs at blk 32 and 128 where divisibility allows.

Writes benchmarks/window_variant_sweep_r05.json.
Run: python benchmarks/window_variant_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.ops.flash_attention import (
    fused_window_attention,
    window_fused_flat_plan,
    window_fused_plan,
    window_pack_plan,
    window_packed_attention,
)
from vision_transformers_tpu.ops.attention import dot_product_attention
from vision_transformers_tpu.ops.windows import (
    relative_position_index,
    shift_attn_mask,
    window_partition,
    window_reverse,
)

B = int(os.environ.get("SWEEP_B", 128))
WH = WW = 7
# Swin-T @224 stages: (name, map_side, channels, heads)
STAGES = [
    ("s1", 56, 96, 3),
    ("s2", 28, 192, 6),
    ("s3", 14, 384, 12),
    ("s4", 7, 768, 24),
]


def timed(fn, x, iters=8, chain=8):
    def chained(x):
        out = None
        for _ in range(chain):
            out = fn(x)
            x = x.at[..., : out.shape[-1]].add(out * 1e-6)
        return x

    g = jax.jit(chained)
    g = g.lower(x).compile(
        compiler_options={"xla_tpu_scoped_vmem_limit_kib": "32768"})
    out = g(x)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(x)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters / chain * 1e3


def batched_attention(qkv, bias, heads, scale, blk):
    """The r5-adopted production kernel (flash_attention._window_batched);
    the sweep measures exactly what ships."""
    from vision_transformers_tpu.ops.flash_attention import _window_batched
    return _window_batched(qkv, bias, heads, scale, blk)


def full_model_rows(rows, out_path):
    """End-to-end adjudication (VERDICT r4 #5): full-model inference with
    the adopted batched routing vs the pre-adoption routing, for the three
    windowed families. Uses hier_bench's builders so the numbers are
    directly comparable to the hier receipts."""
    import vision_transformers_tpu.ops.windows as W
    from hier_bench import build, time_model

    done = {r.get("model") for r in rows if r.get("stage") == "full_model"}
    for name in ("swint_224", "swinv2t_224", "twins_svts224"):
        if name in done:
            continue
        model, margs = build(name)
        image = margs.get("image_size") or margs.get("img_size")
        row = {"stage": "full_model", "model": name, "B": B, "image": image}
        for key, force in (("batched_routed_ms", None),
                           ("no_batched_ms", False)):
            W.FORCE_BATCHED_WINDOW = force
            try:
                row[key] = round(time_model(model, B, image), 3)
            except Exception as e:  # noqa: BLE001
                row[key] = str(e)[:80]
            finally:
                W.FORCE_BATCHED_WINDOW = None
            print(json.dumps({k: row.get(k) for k in
                              ("model", "batched_routed_ms",
                               "no_batched_ms")}), flush=True)
        if (isinstance(row.get("batched_routed_ms"), float)
                and isinstance(row.get("no_batched_ms"), float)):
            row["speedup"] = round(
                row["no_batched_ms"] / row["batched_routed_ms"], 4)
            row["img_per_s"] = round(B / row["batched_routed_ms"] * 1e3, 1)
        rows.append(row)
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rows, f, indent=1)
        os.replace(tmp, out_path)


def main():
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "window_variant_sweep_r05.json")
    rows = []
    if os.path.exists(out_path):  # resume: keep completed op-level cells
        with open(out_path) as f:
            rows = [r for r in json.load(f) if isinstance(r, dict)]
    op_done = {(r["stage"], r["shifted"]) for r in rows
               if "shifted" in r and not any(
                   isinstance(v, str) and v for k, v in r.items()
                   if k in ("pack", "xla", "batched32", "batched128",
                            "fused"))}
    rng = np.random.RandomState(0)
    for name, side, c, heads in STAGES:
        dh = c // heads
        n = WH * WW
        n_win = (side // WH) * (side // WW)
        for shifted in (False, True):
            shift = (WH // 2, WW // 2) if shifted else (0, 0)
            if side <= WH and shifted:
                continue  # shift zeroed when window covers the map
            if (name, shifted) in op_done:
                continue  # resume: cell already measured cleanly
            rows = [r for r in rows
                    if (r.get("stage"), r.get("shifted")) != (name, shifted)]
            # combined bias: rel-pos (+ shift mask)
            table = rng.randn((2 * WH - 1) * (2 * WW - 1), heads) * 0.02
            idx = relative_position_index(WH, WW)
            rel = table[idx].reshape(n, n, heads).transpose(2, 0, 1)
            bias = rel[None]  # (1, H, N, N)
            nwp = 1
            if shifted:
                m = shift_attn_mask(side, side, (WH, WW), shift)
                bias = bias + jnp.asarray(m)[:, None]
                nwp = n_win
            bias = jnp.broadcast_to(
                jnp.asarray(bias, jnp.float32), (nwp, heads, n, n))
            row = {"stage": name, "shifted": shifted, "B": B, "C": c,
                   "heads": heads, "n_win": n_win}

            def record(key, fn, x):
                try:
                    row[key] = round(timed(fn, x), 3)
                except Exception as e:  # noqa: BLE001
                    row[key] = str(e)[:80]
                tmp = out_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(rows + [row], f, indent=1)
                os.replace(tmp, out_path)
                print(json.dumps({key: row[key], "stage": name,
                                  "shifted": shifted}), flush=True)

            scale = 1.0 / dh ** 0.5
            xmap = jnp.asarray(
                rng.randn(B, side, side, 3 * c), jnp.bfloat16)

            def packed_path(attn, xm):
                y = xm
                if shifted:
                    y = jnp.roll(y, (-shift[0], -shift[1]), (1, 2))
                qkv = window_partition(y, WH, WW)
                o = attn(qkv)
                o = window_reverse(o, WH, WW, side, side)
                if shifted:
                    o = jnp.roll(o, shift, (1, 2))
                return o

            plan = window_pack_plan(B * n_win, n, heads, dh, nwp, 2)
            if plan:
                record("pack", lambda xm: packed_path(
                    lambda q: window_packed_attention(
                        q, bias, heads, scale=scale, plan=plan), xm), xmap)

            def split_head(qkv):
                g = qkv.shape[0]
                qkv5 = qkv.reshape(g, n, 3, heads, dh).transpose(2, 0, 3, 1, 4)
                o = dot_product_attention(
                    qkv5[0], qkv5[1], qkv5[2],
                    bias=bias, scale=scale, backend="cpu")
                return o.transpose(0, 2, 1, 3).reshape(g, n, c)

            record("xla", lambda xm: packed_path(split_head, xm), xmap)

            for blk in (32, 128):
                if (B * n_win) % blk or (nwp != 1 and nwp % blk):
                    continue
                record(f"batched{blk}", lambda xm, b=blk: packed_path(
                    lambda q: batched_attention(q, bias, heads, scale, b),
                    xm), xmap)

            # fused production candidate: lane-padded sections off the
            # dense map, roll folded into kernel DMA
            sec = -(-c // 128) * 128
            fplan = window_fused_plan(B, side, side, WH, WW, heads, dh,
                                      nwp, 2)
            if fplan is None:
                fplan = window_fused_flat_plan(B, side, side, WH, WW,
                                               heads, dh, nwp, 2)
            if fplan is not None:
                if sec == c:
                    xsec = xmap
                else:
                    xsec = jnp.concatenate([
                        jnp.pad(t, ((0, 0),) * 3 + ((0, sec - c),))
                        for t in jnp.split(xmap, 3, axis=-1)], axis=-1)
                record("fused", lambda xm: fused_window_attention(
                    xm, bias, heads, (WH, WW), shift, dh=dh,
                    scale=scale, plan=fplan)[..., :c], xsec)
            else:
                row["fused"] = "no plan"
            rows.append(row)
            tmp = out_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(rows, f, indent=1)
            os.replace(tmp, out_path)

    full_model_rows(rows, out_path)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
