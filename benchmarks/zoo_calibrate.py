"""Calibration probe for the de-saturated procedural dataset (v2).

VERDICT r4 #4: the v1 zoo soak saturates (every model 0.9997-1.0), so it
cannot order models. This probe trains ViT-tiny and Swin-tiny on the
reference 100-epoch recipe over candidate make_procedural_dataset_v2
settings and reports final test accuracy; the goal is a setting where the
zoo lands in a ~0.4-0.8 band (reference CIFAR-100 anchors live at
0.33-0.54 — vanilla_vit.py:312-314, swin_transformer.py:400-402).

Run: python benchmarks/zoo_calibrate.py  (CAL_* env knobs)
Writes/updates benchmarks/zoo_calibration.json keyed by setting.
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from convergence_soak import make_procedural_dataset_v2  # noqa: E402

NORM = ((0.5071, 0.4865, 0.4409), (0.2673, 0.2564, 0.2762))


def main():
    import jax

    from vision_transformers_tpu.models.image_classification import (
        SwinTransformer, ViT,
    )
    from vision_transformers_tpu.training.device_data import fit_on_device
    from vision_transformers_tpu.utils.args import get_args

    epochs = int(os.environ.get("CAL_EPOCHS", "100"))
    n_train = int(os.environ.get("CAL_NTRAIN", "10000"))
    noise = float(os.environ.get("CAL_NOISE", "40"))
    occl = int(os.environ.get("CAL_OCCL", "3"))
    models = os.environ.get("CAL_MODELS", "vit,swin").split(",")

    key = f"n{n_train}_noise{noise:g}_occl{occl}_e{epochs}"
    out = os.path.join(_HERE, "zoo_calibration.json")
    results = {}
    if os.path.exists(out):
        with open(out) as f:
            results = json.load(f)
    entry = results.setdefault(key, {"backend": jax.default_backend()})

    train, test = make_procedural_dataset_v2(
        n_train=n_train, n_test=5000, noise=noise, occlusion=occl)

    zoo = {
        "vit": lambda: ViT(**get_args("vit_tiny_cifar100")),
        "swin": lambda: SwinTransformer(**get_args("swin_tiny_cifar100")),
    }
    for name in models:
        t0 = time.time()
        hist = fit_on_device(
            zoo[name](), train, test, epochs, batch_size=256,
            normalize=NORM, augment=True, lr=1e-4, optimizer="adam",
            seed=0, verbose=False)
        entry[name] = {
            "final_test_acc": round(float(hist["test_accuracy"][-1]), 4),
            "final_train_acc": round(float(hist["train_accuracy"][-1]), 4),
            "test_curve_every10": [round(float(v), 4)
                                   for v in hist["test_accuracy"][::10]],
            "wall_s": round(time.time() - t0, 1),
        }
        print(key, name, entry[name]["final_test_acc"],
              "(train", entry[name]["final_train_acc"], ")", flush=True)
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
