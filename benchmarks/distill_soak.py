"""Distillation convergence soak (r3, VERDICT #8).

Demonstrates that ``fit(teacher_fn=..., distill=...)`` actually improves a
student over no-teacher training — the capability the reference gets from
a pretrained regnety teacher (deit.py:32-49, α=0.5/τ=5) that this
environment cannot download.

Protocol: a HARDER variant of the procedural dataset (fewer samples, more
noise, so test accuracy does not saturate), a self-trained ViT-tiny
teacher (strong: 80 on-device epochs), then three DeiT-tiny students on
identical budgets: no-teacher control, hard distillation, soft
distillation (reference α=0.5, τ=5).

Writes benchmarks/distill_r04.json. Run: python benchmarks/distill_soak.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from convergence_soak import make_procedural_dataset

NORM = ((0.5071, 0.4865, 0.4409), (0.2673, 0.2564, 0.2762))
STUDENT_EPOCHS = int(os.environ.get("DISTILL_EPOCHS", "30"))
TEACHER_EPOCHS = int(os.environ.get("TEACHER_EPOCHS", "80"))


class ArrayLoader:
    def __init__(self, x, y, batch=256):
        self.x, self.y, self.batch = x, y, batch
        self.normalize = NORM

    def __iter__(self):
        for i in range(0, len(self.y), self.batch):
            yield self.x[i:i + self.batch], self.y[i:i + self.batch]

    def __len__(self):
        return -(-len(self.y) // self.batch)


def hard_dataset():
    (tr_x, tr_y), (te_x, te_y) = make_procedural_dataset(
        n_train=8_000, n_test=2_000, classes=100, seed=3)
    rng = np.random.RandomState(7)  # extra noise: keep the task unsaturated
    tr_x = np.clip(tr_x.astype(np.float32)
                   + rng.normal(0, 40, tr_x.shape), 0, 255).astype(np.uint8)
    te_x = np.clip(te_x.astype(np.float32)
                   + rng.normal(0, 40, te_x.shape), 0, 255).astype(np.uint8)
    return (tr_x, tr_y), (te_x, te_y)


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
               "recipe": "adam lr=1e-3, batch 256, alpha=0.5 tau=5.0"}

    # --- teacher: ViT-tiny, on-device epochs --------------------------------
    t_args = get_args("vit_tiny_cifar100")
    teacher = ViT(**t_args)
    t0 = time.time()
    t_hist = fit_on_device(
        teacher, train, test, TEACHER_EPOCHS, batch_size=256,
        normalize=NORM, augment=True, lr=1e-3, optimizer="adam",
        seed=0, verbose=False)
    t_params = t_hist["final_state"].params
    results["teacher"] = {
        "test_accuracy": round(t_hist["test_accuracy"][-1], 4),
        "wall_s": round(time.time() - t0, 1),
    }
    print("teacher test acc:", results["teacher"]["test_accuracy"],
          flush=True)

    def teacher_fn(x):  # x arrives normalized, same as the student sees
        return teacher.apply({"params": t_params}, x, deterministic=True)

    # --- students: identical budget, three recipes --------------------------
    d_args = get_args("deit_tinydistil_cifar100")
    tr = ArrayLoader(*train)
    te = ArrayLoader(*test)
    # DISTILL_OUT lets an insurance CPU run (tunnel outage) write to a side
    # file so it can never race with / clobber the supervisor's chip artifact.
    out = os.environ.get("DISTILL_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "distill_r04.json")
    for name, kwargs in (
        ("control_no_teacher", {}),
        ("hard_distill", {"teacher_fn": teacher_fn,
                          "distill": ("hard", 0.5, 5.0)}),
        ("soft_distill", {"teacher_fn": teacher_fn,
                          "distill": ("soft", 0.5, 5.0)}),
    ):
        args = dict(d_args)
        args["distilled_training"] = bool(kwargs)
        model = DeiT(**args)
        t0 = time.time()
        hist = fit(model, tr, te, STUDENT_EPOCHS, lr=1e-3,
                   steps_per_call=8, verbose=False, seed=1, **kwargs)
        results[name] = {
            "test_accuracy": [round(float(v), 4)
                              for v in hist["test_accuracy"]],
            "train_loss": [round(float(v), 4) for v in hist["train_loss"]],
            "final_test_acc": round(float(hist["test_accuracy"][-1]), 4),
            "best_test_acc": round(float(max(hist["test_accuracy"])), 4),
            "wall_s": round(time.time() - t0, 1),
        }
        print(name, "final test acc:",
              results[name]["final_test_acc"], flush=True)
        with open(out, "w") as f:
            json.dump(results, f, indent=1)

    delta_hard = (results["hard_distill"]["best_test_acc"]
                  - results["control_no_teacher"]["best_test_acc"])
    delta_soft = (results["soft_distill"]["best_test_acc"]
                  - results["control_no_teacher"]["best_test_acc"])
    results["distillation_delta"] = {
        "hard": round(delta_hard, 4), "soft": round(delta_soft, 4)}
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("deltas:", results["distillation_delta"])
    print("wrote", out)


if __name__ == "__main__":
    main()
