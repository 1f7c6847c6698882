import numpy as np
import jax.numpy as jnp

from vision_transformers_tpu.utils.load_data import (
    ImageFolderLoader,
    _list_imagefolder,
)
from vision_transformers_tpu.models.object_detection.detr import PostProcess


def _write_imagefolder(tmp_path, classes=("cat", "dog"), per_class=3):
    from PIL import Image

    rng = np.random.RandomState(0)
    for c in classes:
        d = tmp_path / "train" / c
        d.mkdir(parents=True)
        for i in range(per_class):
            Image.fromarray(
                rng.randint(0, 255, (48, 64, 3), np.uint8)
            ).save(d / f"{i}.jpg")
    return str(tmp_path / "train")


def test_list_imagefolder(tmp_path):
    root = _write_imagefolder(tmp_path)
    paths, labels, classes = _list_imagefolder(root)
    assert classes == ["cat", "dog"]
    assert len(paths) == 6
    assert sorted(set(labels.tolist())) == [0, 1]


def test_imagefolder_loader_train_and_eval(tmp_path):
    root = _write_imagefolder(tmp_path)
    paths, labels, _ = _list_imagefolder(root)

    train = ImageFolderLoader(paths, labels, batch_size=4, shuffle=True,
                              train=True, normalize=((0.5,) * 3, (0.25,) * 3),
                              image_size=32, num_workers=2)
    batches = list(train)
    assert sum(len(b[1]) for b in batches) == 6
    assert batches[0][0].shape[1:] == (32, 32, 3)
    assert batches[0][0].dtype == np.uint8

    ev = ImageFolderLoader(paths, labels, batch_size=4, shuffle=False,
                           train=False, normalize=((0.5,) * 3, (0.25,) * 3),
                           image_size=32, num_workers=2)
    e1 = np.concatenate([b[1] for b in ev])
    e2 = np.concatenate([b[1] for b in ev])
    np.testing.assert_array_equal(e1, e2)  # eval order deterministic


def test_postprocess_scales_boxes_to_image():
    q, c = 3, 4
    logits = jnp.zeros((1, q, c + 1)).at[0, 0, 1].set(8.0)  # query 0: class 1
    boxes = jnp.asarray([[[0.5, 0.5, 0.2, 0.4],
                          [0.25, 0.25, 0.1, 0.1],
                          [0.75, 0.75, 0.5, 0.5]]])
    sizes = jnp.asarray([[200.0, 100.0]])  # (h, w)
    out = PostProcess()({"pred_logits": logits, "pred_boxes": boxes}, sizes)[0]
    assert int(out["labels"][0]) == 1
    assert float(out["scores"][0]) > 0.9
    # cxcywh (0.5, 0.5, 0.2, 0.4) on 100x200 → xyxy (40, 60, 60, 140)
    np.testing.assert_allclose(
        np.asarray(out["boxes"][0]), [40.0, 60.0, 60.0, 140.0], atol=1e-4)
