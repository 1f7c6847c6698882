"""SwinV2 fused-vs-pack routing ablation.

hier_bench r04 → r04b shows SwinV2-T/224 regressing 48.5 → 66.5 ms after
the fused NHWC window kernel landed, with stages 2-3 doubling, while
Swin-T improved. SwinV2 (window 8) rides the SLAB fused kernel on every
stage; its distinguishing features vs Swin-T are cosine attention
(logit_scale path in ops/windows.py) and edge padding on stages 2-4
(28->32, 14->16, 7->8), which puts a per-window bias (nwp = n_win) on
EVERY block, not just shifted ones.

This measures SwinV2-T (and Swin-T as control) full-model + per-stage
under FORCE_FUSED_WINDOW in {True, False} so the routing decision in
ops/windows.py:198 is made on receipts, not the single-op microbench
(which only covered stage-1 shapes).

Writes benchmarks/swinv2_fused_ablation_r04.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.hier_bench import bench_model  # noqa: E402
import vision_transformers_tpu.ops.windows as windows  # noqa: E402


def main():
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        os.environ.get("ABLATION_OUT", "swinv2_fused_ablation_r04.json"))
    results = {}
    for fused in (True, False):
        windows.FORCE_FUSED_WINDOW = fused
        key = "fused" if fused else "pack"
        results[key] = {}
        for name in ("swinv2t_224", "swint_224"):
            row = bench_model(name, batch=128, per_stage=True, iters=20)
            results[key][name] = row
            print(key, json.dumps(row), flush=True)
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
