"""Diagnose the hard-distill late-training collapse (VERDICT r4 weak #3).

distill_r04.json: the hard-distill student collapses late (test acc
0.974 -> 0.854/0.90 at epochs 27-29, train loss 0.009 -> 0.17) and
finishes -1.4pt under control. Hypothesis: not a loss-blend bug but an
optimization instability — constant Adam lr=1e-3 with a near-zero loss
late in training (the reference recipe pairs distillation with a cosine
schedule; its plain loops use lr=1e-4 — deit.py:36-137, base.py:35).

Three identical hard-distill students (same data/teacher/seed as the r4
run): the repro arm (constant 1e-3), a cosine-decayed 1e-3, and a
constant 1e-4. If only the repro arm collapses, the formula is fine and
the collapse is the lr.

Writes benchmarks/distill_collapse_diag.json.
Run: python benchmarks/distill_collapse_diag.py
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import jax
import optax

from distill_soak import NORM, ArrayLoader, hard_dataset

STUDENT_EPOCHS = int(os.environ.get("DISTILL_EPOCHS", "30"))
TEACHER_EPOCHS = int(os.environ.get("TEACHER_EPOCHS", "80"))


def main():
    from vision_transformers_tpu.models.image_classification import DeiT, ViT
    from vision_transformers_tpu.training.device_data import fit_on_device
    from vision_transformers_tpu.training.trainer import fit
    from vision_transformers_tpu.utils.args import get_args

    train, test = hard_dataset()
    results = {"dataset": "procedural-hard 100c 8k/2k 32px (+noise 40)",
               "backend": jax.default_backend(),
               "teacher_epochs": TEACHER_EPOCHS,
               "student_epochs": STUDENT_EPOCHS,
               "arms": {}}

    teacher = ViT(**get_args("vit_tiny_cifar100"))
    t_hist = fit_on_device(
        teacher, train, test, TEACHER_EPOCHS, batch_size=256,
        normalize=NORM, augment=True, lr=1e-3, optimizer="adam",
        seed=0, verbose=False)
    t_params = t_hist["final_state"].params
    results["teacher_test_acc"] = round(t_hist["test_accuracy"][-1], 4)
    print("teacher test acc:", results["teacher_test_acc"], flush=True)

    def teacher_fn(x):
        return teacher.apply({"params": t_params}, x, deterministic=True)

    d_args = get_args("deit_tinydistil_cifar100")
    tr = ArrayLoader(*train)
    te = ArrayLoader(*test)
    steps_per_epoch = len(tr)
    out = os.path.join(_HERE, "distill_collapse_diag.json")
    for name, kwargs in (
        ("repro_const_1e-3", {"lr": 1e-3}),
        ("cosine_1e-3", {"lr": 1e-3, "schedule": optax.cosine_decay_schedule(
            1e-3, STUDENT_EPOCHS * steps_per_epoch)}),
        ("const_1e-4", {"lr": 1e-4}),
    ):
        model = DeiT(**dict(d_args))
        t0 = time.time()
        hist = fit(model, tr, te, STUDENT_EPOCHS,
                   steps_per_call=8, verbose=False, seed=1,
                   teacher_fn=teacher_fn, distill=("hard", 0.5, 5.0),
                   **kwargs)
        acc = [round(float(v), 4) for v in hist["test_accuracy"]]
        losses = [round(float(v), 4) for v in hist["train_loss"]]
        # collapse = any late epoch dropping >0.04 below the running best
        best = 0.0
        collapse = False
        for a in acc:
            collapse = collapse or (best - a > 0.04)
            best = max(best, a)
        results["arms"][name] = {
            "test_accuracy": acc, "train_loss": losses,
            "final_test_acc": acc[-1], "best_test_acc": max(acc),
            "collapsed": collapse,
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"{name}: final {acc[-1]} best {max(acc)} "
              f"collapsed={collapse}", flush=True)
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
