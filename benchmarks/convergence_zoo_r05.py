"""Round-5 convergence soak: the FULL model zoo on the de-saturated task.

VERDICT r4 missing #1/#4: the v1 procedural task is so learnable that
every model finishes at 0.9997-1.0 test accuracy (convergence_zoo_r04),
so it cannot detect a wrong residual or a mis-scaled attention anywhere,
let alone reproduce the reference's model ordering. This soak re-runs
ALL TEN families on make_procedural_dataset_v2 (texture-composition
classes, sample-complexity-limited — convergence_soak.py) with the
setting zoo_calibrate.py landed in the discriminative band, on the same
reference recipe (Adam lr=1e-4, batch 256, crop4+hflip+brightness,
100 epochs — reference load_data.py:52, base.py:35).

Reference anchors to compare the ORDERING against (real CIFAR-100 runs
recorded in the reference __main__ blocks): Swin 0.5377
(swin_transformer.py:400-402) > CPVT 0.47 (cpvt.py:292-294) > ViT 0.4081
(vanilla_vit.py:312-314) ≈ CPE-ViT; TNT 0.3457 val (tnt.py:351-353);
DeiT-distilled 0.33 test (deit.py:156-158).

Writes benchmarks/convergence_zoo_r05.json incrementally (a crash keeps
prior runs; re-run resumes). Run: python benchmarks/convergence_zoo_r05.py
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import numpy as np

from convergence_soak import make_procedural_dataset_v2  # noqa: E402


def pick_calibration():
    """The calibrated v2 setting: both probe models inside [0.3, 0.85],
    mean closest to 0.6. Falls back to the authored default if no
    calibration artifact exists (ZOO_* env vars override either way)."""
    default = {"n_train": 10_000, "noise": 40.0, "occlusion": 3}
    try:
        with open(os.path.join(_HERE, "zoo_calibration.json")) as f:
            cal = json.load(f)
    except OSError:
        return default, "default (no calibration artifact)"
    def parse(key):
        # key format: n{n_train}_noise{noise:g}_occl{occl}_e{epochs}
        toks = key.split("_")
        return {"n_train": int(toks[0][1:]),
                "noise": float(toks[1][5:]),
                "occlusion": int(toks[2][4:])}

    best, best_key, best_d = None, None, 9.0
    near, near_key, near_d = None, None, 9.0
    for key, entry in cal.items():
        accs = [m["final_test_acc"] for m in entry.values()
                if isinstance(m, dict) and "final_test_acc" in m]
        if len(accs) < 2:
            continue
        d = abs(float(np.mean(accs)) - 0.6)
        if all(0.3 <= a <= 0.85 for a in accs):
            if d < best_d:
                best, best_key, best_d = parse(key), key, d
        elif d < near_d:
            near, near_key, near_d = parse(key), key, d
    if best is not None:
        return best, f"calibrated ({best_key})"
    if near is not None:
        # no rung fully in band — the measured setting nearest the band
        # still beats the known-saturated default (n10000 probed at
        # vit .928 / swin .961)
        return near, f"nearest-band ({near_key})"
    return default, "default (no calibration measurements)"


def build_models():
    from vision_transformers_tpu.models.image_classification import (
        CPEViT, CPVT, CPVTGAP, DeiT, PVT, SwinTransformer, T2T_ViT, TNT,
        TwinSVT, ViT,
    )
    from vision_transformers_tpu.utils.args import get_args

    tiny = get_args("vit_tiny_cifar100")
    swin = get_args("swin_tiny_cifar100")
    deit_args = get_args("deit_tiny_cifar100")
    deit_args.pop("distilled_training", None)
    return {
        "vit_tiny_cifar100": lambda: ViT(**tiny),
        "swin_tiny_cifar100": lambda: SwinTransformer(**swin),
        "cpvt_tiny_cifar100": lambda: CPVT(**tiny),
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

    setting, source = pick_calibration()
    epochs = int(os.environ.get("SOAK_EPOCHS", "100"))
    only = os.environ.get("SOAK_ONLY", "")
    n_train = int(os.environ.get("ZOO_NTRAIN", setting["n_train"]))
    noise = float(os.environ.get("ZOO_NOISE", setting["noise"]))
    occl = int(os.environ.get("ZOO_OCCL", setting["occlusion"]))
    batch = int(os.environ.get("SOAK_BATCH", "256"))
    train, test = make_procedural_dataset_v2(
        n_train=n_train, n_test=5_000, noise=noise, occlusion=occl)
    normalize = ((0.5071, 0.4865, 0.4409), (0.2673, 0.2564, 0.2762))

    import jax

    out = os.environ.get("ZOO_OUT") or os.path.join(
        _HERE, "convergence_zoo_r05.json")
    results = {"recipe": {
        "optimizer": "adam", "lr": 1e-4, "batch": batch, "epochs": epochs,
        "augment": "crop4+hflip+brightness (reference load_data.py:52)",
        "dataset": (f"procedural-v2 100-class {n_train // 1000}k/5k 32px "
                    f"noise={noise:g} occl={occl} [{source}]"),
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
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=1)
        os.replace(tmp, out)
    print("wrote", out)


if __name__ == "__main__":
    main()
