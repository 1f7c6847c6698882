"""Calibration ladder for the de-saturated procedural dataset (v2).

VERDICT r4 #4: the v1 zoo soak saturates (every model 0.9997-1.0), so it
cannot order models. Round-5 attempt 1 (n10000/noise40/occl3) STILL
saturated: ViT 0.928 / Swin 0.961 — 100 samples/class is enough for
tiny transformers to beat the noise. This retry probes an adaptive
ladder of harder settings (sample complexity down, noise/occlusion up),
training ViT-tiny and Swin-tiny on the reference 100-epoch recipe, until
both land in the discriminative band [0.3, 0.85] (reference CIFAR-100
anchors live at 0.33-0.54 — vanilla_vit.py:312-314,
swin_transformer.py:400-402).

When a setting lands in the band, the SAME invocation chains into the
full 10-model soak (convergence_zoo_r05.py picks the banded setting from
the calibration artifact, resumes across runs) so the supervisor window
is not wasted waiting for a by-hand queue append.

Run: python benchmarks/zoo_calibrate.py  (CAL_* env knobs)
Writes/updates benchmarks/zoo_calibration.json keyed by setting.
"""

import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from convergence_soak import make_procedural_dataset_v2  # noqa: E402

NORM = ((0.5071, 0.4865, 0.4409), (0.2673, 0.2564, 0.2762))
BAND = (0.3, 0.85)
# (n_train, noise, occlusion), easy -> hard. Attempt 1 measured
# (10000, 40, 3) at vit .928 / swin .961; sample complexity is the
# designed desaturator (30 -> 20 -> 12 samples/class), noise/occlusion
# raise the floor of irreducible error.
LADDER = [
    (3000, 60.0, 4),
    (2000, 70.0, 5),
    (1200, 80.0, 6),
]


def probe(setting, epochs, results, out):
    import jax

    from vision_transformers_tpu.models.image_classification import (
        SwinTransformer, ViT,
    )
    from vision_transformers_tpu.training.device_data import fit_on_device
    from vision_transformers_tpu.utils.args import get_args

    n_train, noise, occl = setting
    key = f"n{n_train}_noise{noise:g}_occl{occl}_e{epochs}"
    entry = results.setdefault(key, {"backend": jax.default_backend()})
    train, test = make_procedural_dataset_v2(
        n_train=n_train, n_test=5000, noise=noise, occlusion=occl)
    zoo = {
        "vit": lambda: ViT(**get_args("vit_tiny_cifar100")),
        "swin": lambda: SwinTransformer(**get_args("swin_tiny_cifar100")),
    }
    accs = []
    for name, ctor in zoo.items():
        if name in entry and "final_test_acc" in entry[name]:
            accs.append(entry[name]["final_test_acc"])
            continue
        t0 = time.time()
        hist = fit_on_device(
            ctor(), train, test, epochs, batch_size=256,
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
        accs.append(entry[name]["final_test_acc"])
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    return accs


def main():
    epochs = int(os.environ.get("CAL_EPOCHS", "100"))
    out = os.path.join(_HERE, "zoo_calibration.json")
    results = {}
    if os.path.exists(out):
        with open(out) as f:
            results = json.load(f)

    banded = None
    for setting in LADDER:
        accs = probe(setting, epochs, results, out)
        if all(BAND[0] <= a <= BAND[1] for a in accs):
            banded = setting
            print(f"banded setting: {setting} accs={accs}", flush=True)
            break
        if any(a < BAND[0] for a in accs):
            # overshot — harder rungs would only be worse; stop and let
            # the artifact show the bracketing pair
            print(f"overshot at {setting} accs={accs}; stopping ladder",
                  flush=True)
            break
        print(f"still saturated at {setting} accs={accs}", flush=True)

    if banded is None:
        print("no banded setting found; not chaining the zoo soak")
        return 1

    # Chain the full 10-model soak in this same supervisor window
    # (convergence_zoo_r05.pick_calibration reads the artifact we just
    # wrote; the soak resumes if a timeout cuts it short).
    print("chaining convergence_zoo_r05.py ...", flush=True)
    rc = subprocess.call(
        [sys.executable, os.path.join(_HERE, "convergence_zoo_r05.py")],
        cwd=os.path.dirname(_HERE))
    print("zoo soak rc", rc, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
