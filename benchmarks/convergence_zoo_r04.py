"""Round-4 convergence soak: the rest of the model zoo.

Round 2 soaked ViT/Swin/CPVT on the 100-epoch reference recipe
(convergence_r02.json); VERDICT r3 "next" #6 asks for the remaining
families — PVT, Twins-SVT, TNT, T2T-ViT, CPE-ViT, CPVT-GAP, DeiT (plain;
distilled DeiT is distill_soak.py) — which have never run a long horizon
anywhere. Same recipe as convergence_soak.py: Adam lr=1e-4, batch 256,
crop4+hflip+brightness, 100 epochs, procedural CIFAR-100-shaped data
(no real CIFAR exists in this environment — BASELINE.md anchors).

Configs are the reference CIFAR-scale defaults: TNT outer512/inner48 L7
(reference tnt.py:351 recorded run), PVT 32px/p4 with default dims
(reference pvt.py __main__), Twins defaults (reference twin-svt.py:360 —
crashes there; ours is the fixed intent), T2T/CPE/CPVT-GAP on the
vit_tiny preset (reference __main__ blocks reuse it).

Writes benchmarks/convergence_zoo_r04.json incrementally (a crash keeps
prior runs). Run: python benchmarks/convergence_zoo_r04.py
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import numpy as np

from convergence_soak import make_procedural_dataset  # noqa: E402


def build_models():
    from vision_transformers_tpu.models.image_classification import (
        CPEViT, CPVTGAP, DeiT, PVT, T2T_ViT, TNT, TwinSVT,
    )
    from vision_transformers_tpu.utils.args import get_args

    tiny = get_args("vit_tiny_cifar100")
    deit_args = get_args("deit_tiny_cifar100")
    deit_args.pop("distilled_training", None)
    return {
        "cpe_vit_tiny_cifar100": lambda: CPEViT(**tiny),
        "cpvt_gap_tiny_cifar100": lambda: CPVTGAP(**tiny),
        "t2t_vit_tiny_cifar100": lambda: T2T_ViT(**tiny),
        "deit_tiny_plain_cifar100": lambda: DeiT(**deit_args),
        "pvt_cifar100": lambda: PVT(
            image_size=32, patch_size=4, num_classes=100),
        "twins_svt_cifar100": lambda: TwinSVT(img_size=32, num_classes=100),
        "tnt_default_cifar100": lambda: TNT(
            image_size=32, patch_size=8, num_classes=100),
    }


def main():
    from vision_transformers_tpu.training.device_data import fit_on_device

    epochs = int(os.environ.get("SOAK_EPOCHS", "100"))
    only = os.environ.get("SOAK_ONLY", "")
    n_train = int(os.environ.get("SOAK_NTRAIN", "50000"))
    n_test = int(os.environ.get("SOAK_NTEST", "10000"))
    batch = int(os.environ.get("SOAK_BATCH", "256"))
    train, test = make_procedural_dataset(n_train=n_train, n_test=n_test)
    normalize = ((0.5071, 0.4865, 0.4409), (0.2673, 0.2564, 0.2762))

    import jax

    # ZOO_OUT lets an insurance CPU run (tunnel outage) write to a side file:
    # zoo_done() in the queue supervisor doesn't check backend, so a CPU run
    # landing in the main artifact would wrongly mark the chip step complete.
    out = os.environ.get("ZOO_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "convergence_zoo_r04.json")
    results = {"recipe": {
        "optimizer": "adam", "lr": 1e-4, "batch": batch, "epochs": epochs,
        "augment": "crop4+hflip+brightness (reference load_data.py:52)",
        "dataset": (f"procedural 100-class {n_train//1000}k/{n_test//1000}k "
                    "32px (convergence_soak.py)"),
        "backend": jax.default_backend(),
    }, "runs": {}}
    if os.path.exists(out):  # resume: keep finished runs
        with open(out) as f:
            prior = json.load(f)
        results["runs"].update(prior.get("runs", {}))

    for name, ctor in build_models().items():
        if only and only not in name:
            continue
        if name in results["runs"]:
            print(f"{name}: already done, skipping", flush=True)
            continue
        t0 = time.time()
        try:
            model = ctor()
            hist = fit_on_device(
                model, train, test, epochs,
                batch_size=batch, normalize=normalize, augment=True,
                lr=1e-4, optimizer="adam", seed=0, verbose=False)
        except Exception as e:  # unattended queue: record, move on
            import traceback
            traceback.print_exc()
            results["runs"][name] = {"error": f"{type(e).__name__}: {e}"}
            with open(out, "w") as f:
                json.dump(results, f, indent=1)
            continue
        wall = time.time() - t0
        run = {
            "wall_s": round(wall, 1),
            "epochs": epochs,
            "train_loss": [round(float(v), 4) for v in hist["train_loss"]],
            "train_accuracy": [round(float(v), 4)
                               for v in hist["train_accuracy"]],
            "test_loss": [round(float(v), 4) for v in hist["test_loss"]],
            "test_accuracy": [round(float(v), 4)
                              for v in hist["test_accuracy"]],
            "stable": bool(all(np.isfinite(hist["train_loss"]))),
        }
        results["runs"][name] = run
        print(f"{name}: {epochs} epochs in {wall:.0f}s — "
              f"train acc {run['train_accuracy'][-1]:.3f}, "
              f"test acc {run['test_accuracy'][-1]:.3f}, "
              f"stable={run['stable']}", flush=True)
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
