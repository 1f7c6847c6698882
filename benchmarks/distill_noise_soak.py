"""Distillation under label noise (r4 follow-up to distill_soak.py).

The first soak's task was too learnable: the no-teacher control saturated
(0.988) so distillation had nothing to add (distill_r04.json deltas ~0).
This soak recreates the regime where the reference's pretrained-teacher
recipe (deit.py:32-49) actually pays: the TRAIN labels are 40% corrupted,
the teacher was trained on clean labels (standing in for "pretrained on
more data"), and three identical-budget DeiT students train on the noisy
set. The control memorizes noise; the distilled students inherit the
teacher's clean decision function through its logits.

Arms (all on the noisy train set, clean test set):
- control_no_teacher: CE on the noisy hard labels
- hard_distill:       reference hard recipe, alpha=0.5 tau=5
- soft_distill:       reference soft recipe, alpha=0.5 tau=5

Writes benchmarks/distill_noise_r04.json (DISTILL_NOISE_OUT overrides).
Run: python benchmarks/distill_noise_soak.py
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
TEACHER_EPOCHS = int(os.environ.get("TEACHER_EPOCHS", "60"))
NOISE_FRAC = float(os.environ.get("LABEL_NOISE", "0.4"))


class ArrayLoader:
    def __init__(self, x, y, batch=256):
        self.x, self.y, self.batch = x, y, batch
        self.normalize = NORM

    def __iter__(self):
        for i in range(0, len(self.y), self.batch):
            yield self.x[i:i + self.batch], self.y[i:i + self.batch]

    def __len__(self):
        return -(-len(self.y) // self.batch)


def main():
    from vision_transformers_tpu.models.image_classification import DeiT, ViT
    from vision_transformers_tpu.training.device_data import fit_on_device
    from vision_transformers_tpu.training.trainer import fit
    from vision_transformers_tpu.utils.args import get_args

    (tr_x, tr_y), (te_x, te_y) = make_procedural_dataset(
        n_train=20_000, n_test=4_000, classes=100, seed=5)
    rng = np.random.RandomState(11)
    flip = rng.rand(len(tr_y)) < NOISE_FRAC
    noisy_y = tr_y.copy()
    noisy_y[flip] = rng.randint(0, 100, flip.sum()).astype(tr_y.dtype)
    actually_flipped = float(np.mean(noisy_y != tr_y))

    results = {
        "dataset": "procedural 100c 20k/4k 32px",
        "label_noise": {"requested": NOISE_FRAC,
                        "actual_flip_rate": round(actually_flipped, 4)},
        "backend": jax.default_backend(),
        "teacher_epochs": TEACHER_EPOCHS,
        "student_epochs": STUDENT_EPOCHS,
        "recipe": "adam lr=1e-3, batch 256, alpha=0.5 tau=5.0",
    }

    # --- teacher: ViT-tiny on the CLEAN labels ("pretrained" stand-in) ----
    teacher = ViT(**get_args("vit_tiny_cifar100"))
    t0 = time.time()
    t_hist = fit_on_device(
        teacher, (tr_x, tr_y), (te_x, te_y), TEACHER_EPOCHS, batch_size=256,
        normalize=NORM, augment=True, lr=1e-3, optimizer="adam",
        seed=0, verbose=False)
    t_params = t_hist["final_state"].params
    results["teacher"] = {
        "test_accuracy": round(t_hist["test_accuracy"][-1], 4),
        "wall_s": round(time.time() - t0, 1),
    }
    print("teacher (clean labels) test acc:",
          results["teacher"]["test_accuracy"], flush=True)

    def teacher_fn(x):
        return teacher.apply({"params": t_params}, x, deterministic=True)

    d_args = get_args("deit_tinydistil_cifar100")
    tr = ArrayLoader(tr_x, noisy_y)
    te = ArrayLoader(te_x, te_y)
    out = os.environ.get("DISTILL_NOISE_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "distill_noise_r04.json")
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

    ctrl = results["control_no_teacher"]
    results["distillation_delta"] = {
        "hard_final": round(results["hard_distill"]["final_test_acc"]
                            - ctrl["final_test_acc"], 4),
        "soft_final": round(results["soft_distill"]["final_test_acc"]
                            - ctrl["final_test_acc"], 4),
        "hard_best": round(results["hard_distill"]["best_test_acc"]
                           - ctrl["best_test_acc"], 4),
        "soft_best": round(results["soft_distill"]["best_test_acc"]
                           - ctrl["best_test_acc"], 4),
    }
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("deltas:", results["distillation_delta"])
    print("wrote", out)


if __name__ == "__main__":
    main()
