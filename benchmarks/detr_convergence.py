"""DETR detection-stack convergence soak on a learnable synthetic task.

The reference's detection stack never ran (detr.py is incomplete —
SURVEY §2.9.2), so there is no accuracy anchor; and no COCO data exists
in this environment. This soak proves the authored stack — COCO data
pipeline, DETR, auction Hungarian matching, set criterion, PostProcess,
home-grown COCOeval — actually LEARNS end to end on the real TPU: images
contain 1–3 solid colored rectangles (class = color) on a noisy
background, a task DETR must localize + classify, and mAP must climb
from ~0 to a clearly non-trivial value.

r5 (VERDICT #2): the r04 run restarted from scratch and was killed at 20
epochs — strictly weaker evidence than r02's 150-epoch 0.239-and-climbing.
The soak now checkpoints the TrainState to disk after every chunk and
RESUMES from it on restart (epoch history reloaded from the artifact), so
a tunnel wedge or round boundary costs one chunk, never the run. Runs to
the plateau-stop or SOAK_EPOCHS, whichever first.

Writes benchmarks/detr_convergence_r05.json.
Run: python benchmarks/detr_convergence.py  (SOAK_EPOCHS=N to override)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

COLORS = [(220, 40, 40), (40, 200, 60), (60, 80, 230), (230, 210, 40)]


def write_synthetic_coco(root, n_images=80, size=96, seed=0):
    from PIL import Image

    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    aid = 1
    for i in range(1, n_images + 1):
        img = rng.randint(90, 130, (size, size, 3)).astype(np.uint8)
        for _ in range(rng.randint(1, 4)):
            cat = int(rng.randint(0, len(COLORS)))
            bw, bh = (int(v) for v in rng.randint(14, 36, 2))
            x = int(rng.randint(0, size - bw))
            y = int(rng.randint(0, size - bh))
            img[y:y + bh, x:x + bw] = COLORS[cat]
            annotations.append({
                "id": aid, "image_id": i, "category_id": cat + 1,
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
                "segmentation": [[x, y, x + bw, y, x + bw, y + bh,
                                  x, y + bh]],
            })
            aid += 1
        Image.fromarray(img).save(
            os.path.join(img_dir, f"{i:012d}.jpg"))
        images.append({"id": i, "file_name": f"{i:012d}.jpg",
                       "height": size, "width": size})
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": c + 1, "name": str(c)}
                          for c in range(len(COLORS))]}
    ann_file = os.path.join(root, "ann.json")
    with open(ann_file, "w") as f:
        json.dump(ann, f)
    return img_dir, ann_file


def main():
    import tempfile

    import jax

    # fit_detection re-traces its per-call train_step closure each chunk;
    # a persistent compilation cache turns the per-chunk recompile into a
    # disk hit (the executable is identical — same HLO, same donations)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "logs", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vision_transformers_tpu.models.object_detection import Detr
    from vision_transformers_tpu.models.object_detection.criterion import (
        SetCriterion,
    )
    from vision_transformers_tpu.training.detection import (
        DetectionLoader, fit_detection,
    )
    from vision_transformers_tpu.utils.coco.build_coco import CocoDetection
    from vision_transformers_tpu.utils.coco import transforms as T

    epochs = int(os.environ.get("SOAK_EPOCHS", "500"))
    lr_drop = int(os.environ.get("SOAK_LR_DROP", "400"))
    tr = T.Compose([
        T.RandomResize([96]),
        T.ToTensor(),
        T.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    ])

    with tempfile.TemporaryDirectory() as td:
        img_dir, ann_file = write_synthetic_coco(td)
        train_ds = CocoDetection(img_dir, ann_file, transforms=tr)
        val_ds = CocoDetection(img_dir, ann_file, transforms=tr)
        train = DetectionLoader(train_ds, batch_size=8, shuffle=True,
                                size_bucket=96)
        val = DetectionLoader(val_ds, batch_size=8, size_bucket=96)

        model = Detr(num_classes=len(COLORS) + 1, num_queries=16,
                     hidden_dim=64, nheads=4, num_encoder_layers=2,
                     num_decoder_layers=2, dim_feedforward=128,
                     dropout=0.0, backbone_norm="group", aux_loss=True)
        crit = SetCriterion(num_classes=len(COLORS) + 1)

        # Chunked training with incremental artifact writes AND an on-disk
        # state checkpoint: a tunnel wedge (or round boundary) mid-soak
        # costs one chunk, not the run — on restart the soak resumes from
        # the last chunk's TrainState + the artifact's epoch history
        # (VERDICT r4 #2: the r04 soak restarted from scratch). The carried
        # state keeps the optimizer step count, so the lr_drop boundary
        # (schedule over optimizer steps) is chunking-invariant.
        import flax.serialization

        bdir = os.path.dirname(os.path.abspath(__file__))
        path = os.path.join(bdir, "detr_convergence_r05.json")
        ckpt = os.path.join(bdir, "logs", "detr_soak_state_r05.msgpack")
        chunk = int(os.environ.get("SOAK_CHUNK", "10"))
        losses, maps, prior_wall = [], [], 0.0
        state = None
        if os.path.exists(ckpt) and os.path.exists(path):
            with open(path) as f:
                prev = json.load(f)
            losses = list(prev["loss"])
            # mAP history is (epoch, mAP) points; migrate the dense
            # per-epoch list the pre-sparse-eval artifact carried
            maps = ([list(p) for p in prev["map_points"]]
                    if "map_points" in prev else
                    [[i + 1, m]
                     for i, m in enumerate(prev["map_per_epoch"])])
            prior_wall = float(prev.get("wall_s", 0.0))
            skeleton = fit_detection(
                model, train, 0, val_loader=None,
                num_classes=len(COLORS) + 1, max_targets=8, criterion=crit,
                lr=2e-4, lr_drop=lr_drop, seed=0, verbose=False,
            )["final_state"]
            with open(ckpt, "rb") as f:
                state = flax.serialization.from_bytes(skeleton, f.read())
            print(f"resumed at epoch {len(losses)} "
                  f"(step {int(state.step)})", flush=True)
        # One persistent jitted predict reused across chunks (a per-chunk
        # closure would re-trace + re-compile through the tunnel each
        # time); eval runs once per CHUNK, not per epoch — at 80 imgs the
        # per-epoch eval + per-step loss syncs were ~90% of the 33 s/epoch
        # the r04/early-r05 soaks paid.
        from vision_transformers_tpu.training.detection import (
            evaluate_model,
        )
        from vision_transformers_tpu.models.object_detection.detr import (
            PostProcess,
        )

        predict = jax.jit(
            lambda p, im, m: model.apply({"params": p}, im, m))
        post = PostProcess()

        t0 = time.time()
        out = None
        while len(losses) < epochs:
            n = min(chunk, epochs - len(losses))
            hist = fit_detection(
                model, train, n, val_loader=None,
                num_classes=len(COLORS) + 1, max_targets=8, criterion=crit,
                lr=2e-4, lr_drop=lr_drop, seed=0, verbose=False,
                state=state)
            state = hist["final_state"]
            losses += [round(float(v), 4) for v in hist["loss"]]
            m = evaluate_model(
                lambda im, msk: predict(state.params, im, msk), val, post)
            maps.append([len(losses),
                         round(float(m.get("AP", m.get("mAP", 0.0))), 4)])
            mvals = [p[1] for p in maps]
            out = {
                "task": ("synthetic color-rectangles "
                         "(1-3 objects, 4 classes, 96px)"),
                "epochs": len(losses), "lr_drop": lr_drop,
                "eval_every_epochs": chunk,
                "wall_s": round(prior_wall + time.time() - t0, 1),
                "loss": losses, "map_points": maps,
                "final_map": mvals[-1] if mvals else None,
                "best_map": max(mvals) if mvals else None,
            }
            tmp = ckpt + ".tmp"
            with open(tmp, "wb") as f:
                f.write(flax.serialization.to_bytes(
                    jax.device_get(state)))
            os.replace(tmp, ckpt)
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(out, f, indent=1)
            os.replace(tmp, path)
            print(f"epoch {len(losses)}: loss {losses[-1]} "
                  f"mAP {maps[-1][1]} (best {max(mvals)})", flush=True)
            # plateau stop: past the lr drop and no meaningful
            # improvement across the last 100 epochs' eval points
            tail = [v for e, v in maps if e > len(losses) - 100]
            head = [v for e, v in maps if e <= len(losses) - 100]
            if (len(losses) >= max(200, lr_drop + 60)
                    and head and max(tail) < max(head) + 0.005):
                out["stopped"] = "plateau"
                with open(path, "w") as f:
                    json.dump(out, f, indent=1)
                break

    if out is None:  # resumed past the target epoch count: nothing to do
        print(f"already at {len(losses)} epochs; artifact is complete")
        return
    print(f"{out['epochs']} epochs in {out['wall_s']:.0f}s — loss "
          f"{losses[0]} -> {losses[-1]}, mAP {maps[0][1]} -> {maps[-1][1]} "
          f"(best {out['best_map']})")
    print("wrote", path)


if __name__ == "__main__":
    main()
