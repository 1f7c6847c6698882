import json

import numpy as np
import jax.numpy as jnp
import pytest

from vision_transformers_tpu.utils.coco import transforms as T
from vision_transformers_tpu.utils.coco.build_coco import (
    CocoDetection,
    ConvertCocoPolysToMask,
    _counts_to_mask,
    build,
    make_coco_transforms,
    polygons_to_mask,
)
from vision_transformers_tpu.utils.coco.util.box_ops import (
    box_cxcywh_to_xyxy,
    box_iou,
    box_xyxy_to_cxcywh,
    generalized_box_iou,
    masks_to_boxes,
)
from vision_transformers_tpu.utils.coco.util.misc import (
    NestedTensor,
    collate_fn,
    nested_tensor_from_tensor_list,
)


# ------------------------------------------------------------------ box ops

def test_box_conversions_roundtrip():
    b = jnp.asarray([[10.0, 20.0, 30.0, 60.0], [0, 0, 5, 5]])
    np.testing.assert_allclose(
        np.asarray(box_cxcywh_to_xyxy(box_xyxy_to_cxcywh(b))), np.asarray(b),
        atol=1e-5,
    )


def test_box_iou_known_values():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    b = jnp.asarray([[5.0, 5, 15, 15], [0, 0, 10, 10], [20, 20, 30, 30]])
    iou, union = box_iou(a, b)
    np.testing.assert_allclose(
        np.asarray(iou)[0], [25 / 175, 1.0, 0.0], atol=1e-6)


def test_generalized_box_iou_properties():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    # identical boxes: GIoU = 1; disjoint distant boxes: GIoU < 0
    g = generalized_box_iou(a, jnp.asarray([[0.0, 0, 10, 10], [30, 30, 40, 40]]))
    np.testing.assert_allclose(float(g[0, 0]), 1.0, atol=1e-6)
    assert float(g[0, 1]) < 0
    # symmetric
    b = jnp.asarray([[2.0, 2, 8, 12]])
    np.testing.assert_allclose(
        float(generalized_box_iou(a, b)[0, 0]),
        float(generalized_box_iou(b, a)[0, 0]), atol=1e-6)


def test_masks_to_boxes():
    m = np.zeros((2, 10, 10), bool)
    m[0, 2:5, 3:7] = True
    m[1, 0:1, 0:1] = True
    boxes = np.asarray(masks_to_boxes(jnp.asarray(m)))
    np.testing.assert_allclose(boxes[0], [3, 2, 6, 4])
    np.testing.assert_allclose(boxes[1], [0, 0, 0, 0])


# --------------------------------------------------------------- transforms

def _target(boxes, h=100, w=100):
    boxes = np.asarray(boxes, np.float32)
    return {
        "boxes": boxes,
        "labels": np.arange(len(boxes), dtype=np.int64),
        "area": (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]),
        "iscrowd": np.zeros(len(boxes), np.int64),
        "orig_size": np.asarray([h, w]),
        "size": np.asarray([h, w]),
    }


def test_hflip_boxes():
    img = np.zeros((100, 200, 3), np.uint8)
    t = _target([[10, 20, 50, 60]], 100, 200)
    img2, t2 = T.hflip(img, t)
    np.testing.assert_allclose(t2["boxes"][0], [150, 20, 190, 60])
    # involution
    _, t3 = T.hflip(img2, t2)
    np.testing.assert_allclose(t3["boxes"], t["boxes"])


def test_resize_scales_boxes_and_area():
    img = np.zeros((100, 200, 3), np.uint8)
    t = _target([[10, 20, 50, 60]], 100, 200)
    img2, t2 = T.resize(img, t, 50)  # min side 100→50, ratio preserved
    assert img2.shape[:2] == (50, 100)
    np.testing.assert_allclose(t2["boxes"][0], [5, 10, 25, 30])
    np.testing.assert_allclose(t2["area"][0], t["area"][0] * 0.25)


def test_resize_max_size_cap():
    img = np.zeros((100, 400, 3), np.uint8)
    img2, _ = T.resize(img, None, 300, max_size=600)
    assert max(img2.shape[:2]) <= 600


def test_crop_clamps_and_filters():
    img = np.zeros((100, 100, 3), np.uint8)
    t = _target([[10, 10, 30, 30], [80, 80, 95, 95]])
    img2, t2 = T.crop(img, t, (0, 0, 50, 50))
    assert img2.shape[:2] == (50, 50)
    assert len(t2["boxes"]) == 1  # second box fell outside
    np.testing.assert_allclose(t2["boxes"][0], [10, 10, 30, 30])


def test_normalize_converts_boxes_to_rel_cxcywh():
    img = np.zeros((3, 100, 200), np.float32)  # CHW after ToTensor
    t = _target([[20, 10, 60, 50]], 100, 200)
    _, t2 = T.Normalize([0.5] * 3, [0.25] * 3)(img, t)
    np.testing.assert_allclose(t2["boxes"][0], [0.2, 0.3, 0.2, 0.4], atol=1e-6)


def test_make_coco_transforms_pipeline_runs():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (480, 640, 3), np.uint8)
    t = _target([[50, 50, 200, 200], [10, 400, 100, 470]], 480, 640)
    tr = make_coco_transforms("train")
    out_img, out_t = tr(img, t, rng)
    assert out_img.ndim == 3 and out_img.shape[0] == 3  # CHW float
    assert out_img.dtype == np.float32
    if len(out_t["boxes"]):
        assert np.all(out_t["boxes"] >= 0) and np.all(out_t["boxes"] <= 1)


# ------------------------------------------------------------- coco dataset

def _write_tiny_coco(tmp_path, n_images=3):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(1, n_images + 1):
        w, h = 64, 48
        Image.fromarray(
            rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            img_dir / f"{i:012d}.jpg")
        images.append({"id": i, "file_name": f"{i:012d}.jpg",
                       "height": h, "width": w})
        for _ in range(2):
            x, y = (int(v) for v in rng.randint(0, 30, 2))
            bw, bh = (int(v) for v in rng.randint(5, 20, 2))
            annotations.append({
                "id": aid, "image_id": i, "category_id": int(rng.randint(1, 5)),
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
                "segmentation": [[x, y, x + bw, y, x + bw, y + bh, x, y + bh]],
            })
            aid += 1
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": c, "name": str(c)} for c in range(1, 5)]}
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return str(img_dir), str(ann_file)


def test_coco_detection_dataset(tmp_path):
    img_dir, ann_file = _write_tiny_coco(tmp_path)
    ds = CocoDetection(img_dir, ann_file,
                       transforms=make_coco_transforms("val"))
    assert len(ds) == 3
    img, target = ds[0]
    assert img.shape[0] == 3  # CHW
    assert target["boxes"].shape[1] == 4
    assert len(target["labels"]) == len(target["boxes"])
    assert target["image_id"][0] == 1


def test_coco_detection_with_masks(tmp_path):
    img_dir, ann_file = _write_tiny_coco(tmp_path)
    ds = CocoDetection(img_dir, ann_file, return_masks=True)
    _, target = ds[0]
    assert "masks" in target
    assert target["masks"].shape[0] == len(target["boxes"])
    assert target["masks"].any()


def test_rle_decode_uncompressed():
    # 2x3 mask, column-major counts: [1, 2, 3] -> 0 then 1,1 then 0,0,0? no:
    # counts alternate starting with zeros: [1,5] = one 0 then five 1s
    m = _counts_to_mask([1, 5], 2, 3)
    assert m.shape == (2, 3)
    assert m.sum() == 5
    assert m[0, 0] == 0  # first element (column-major) is background


def test_polygons_to_mask_square():
    m = polygons_to_mask([[1, 1, 4, 1, 4, 4, 1, 4]], 6, 6)
    assert m[2, 2] == 1 and m[0, 0] == 0
    assert m.sum() >= 9


# ------------------------------------------------------------ NestedTensor

def test_nested_tensor_bucketing_and_mask():
    imgs = [np.ones((3, 100, 150), np.float32),
            np.ones((3, 120, 90), np.float32)]
    nt = nested_tensor_from_tensor_list(imgs, size_bucket=64)
    assert nt.tensors.shape == (2, 128, 192, 3)  # bucketed to 64-multiples
    assert nt.mask.shape == (2, 128, 192)
    assert not nt.mask[0, :100, :150].any()
    assert nt.mask[0, 100:, :].all()
    assert not nt.mask[1, :120, :90].any()


def test_collate_fn():
    imgs = [np.zeros((3, 50, 60), np.float32), np.zeros((3, 40, 70), np.float32)]
    targets = [{"labels": np.asarray([1])}, {"labels": np.asarray([2])}]
    nt, ts = collate_fn(list(zip(imgs, targets)))
    assert isinstance(nt, NestedTensor)
    assert len(ts) == 2
