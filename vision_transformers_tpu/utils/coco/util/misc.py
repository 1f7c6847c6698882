"""Detection misc: padded batching (NestedTensor) + surface re-exports.

The reference's misc.py is a vendored grab-bag (utils/coco/util/misc.py):
metrics/logging, distributed helpers, the NestedTensor padded-batch
abstraction, collate_fn, accuracy@k, interpolate. Here the metric and
distributed pieces live in first-class modules (utils.metrics,
parallel.distributed) and are re-exported for surface parity; this module
owns what is detection-specific:

- ``NestedTensor``: (B, H, W, C) padded batch + (B, H, W) bool mask, True on
  padding (misc.py:284-329 semantics, NHWC for TPU).
- ``nested_tensor_from_tensor_list`` / ``collate_fn`` with **shape
  bucketing**: padded sizes are rounded up to a coarse grid so the 11-scale
  COCO augmentation (480..800, max 1333) maps to a handful of static XLA
  shapes instead of recompiling per batch (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

# surface parity re-exports -------------------------------------------------
from vision_transformers_tpu.parallel.distributed import (  # noqa: F401
    all_gather_objects as all_gather,
    get_rank,
    get_world_size,
    init_distributed_mode,
    is_main_process,
    save_on_master,
)
from vision_transformers_tpu.utils.metrics import (  # noqa: F401
    MetricLogger,
    SmoothedValue,
    accuracy_topk as accuracy,
    get_sha,
)


def reduce_dict(input_dict: dict, average: bool = True) -> dict:
    """All-reduce a dict of scalars across hosts (misc.py:132-156).

    Inside a jitted step prefer jax.lax.pmean; this host-level variant
    serves logging, mirroring the reference's post-step reduce."""
    import jax

    if jax.process_count() == 1:
        return dict(input_dict)
    from jax.experimental import multihost_utils

    keys = sorted(input_dict)
    vals = np.asarray([float(input_dict[k]) for k in keys], np.float64)
    summed = multihost_utils.process_allgather(vals).sum(axis=0)
    if average:
        summed = summed / jax.process_count()
    return {k: float(v) for k, v in zip(keys, summed)}


def interpolate(array, size=None, scale_factor=None, mode="nearest"):
    """Version-portable resize (misc.py:451-468 surface): (N, H, W, C) or
    (N, C, H, W) jnp arrays via jax.image.resize."""
    import jax
    import jax.numpy as jnp

    array = jnp.asarray(array)
    nchw = array.shape[1] <= 4 < array.shape[-1] or array.shape[1] < array.shape[-1] // 8
    if size is None:
        h, w = array.shape[2:] if nchw else array.shape[1:3]
        size = (int(h * scale_factor), int(w * scale_factor))
    if nchw:
        shape = (*array.shape[:2], *size)
    else:
        shape = (array.shape[0], *size, array.shape[-1])
    method = {"nearest": "nearest", "bilinear": "linear"}.get(mode, mode)
    return jax.image.resize(array, shape, method=method)


# ------------------------------------------------------------- NestedTensor

SIZE_BUCKET = 128  # pad H/W up to multiples of this → few static shapes


def bucket_size(x: int, bucket: int = SIZE_BUCKET, max_size: int = 1344) -> int:
    return min(-(-x // bucket) * bucket, max_size)


@dataclass
class NestedTensor:
    """Padded image batch (NHWC) + padding mask (True = padded)."""

    tensors: np.ndarray  # (B, H, W, C) float32 (or jnp array on device)
    mask: np.ndarray     # (B, H, W) bool

    def decompose(self):
        return self.tensors, self.mask

    @property
    def shape(self):
        return self.tensors.shape

    def to_device(self, sharding=None):
        import jax

        t = jax.device_put(self.tensors, sharding)
        m = jax.device_put(self.mask, sharding)
        return NestedTensor(t, m)


def _as_hwc(img: np.ndarray) -> np.ndarray:
    if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
        return np.ascontiguousarray(img.transpose(1, 2, 0))
    return img


def nested_tensor_from_tensor_list(
    images: Sequence[np.ndarray],
    size_bucket: int = SIZE_BUCKET,
) -> NestedTensor:
    """Pad a list of HWC/CHW float images to the bucketed batch max
    (misc.py:307-329 semantics + static-shape bucketing)."""
    images = [_as_hwc(np.asarray(im)) for im in images]
    max_h = max(im.shape[0] for im in images)
    max_w = max(im.shape[1] for im in images)
    H = bucket_size(max_h, size_bucket)
    W = bucket_size(max_w, size_bucket)
    c = images[0].shape[2]
    b = len(images)

    out = np.zeros((b, H, W, c), np.float32)
    mask = np.ones((b, H, W), bool)
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        out[i, :h, :w] = im
        mask[i, :h, :w] = False
    return NestedTensor(out, mask)


def collate_fn(batch) -> Tuple[NestedTensor, tuple]:
    """DETR collate (misc.py:269-272): batch list of (image, target) →
    (NestedTensor, targets)."""
    images, targets = list(zip(*batch))
    return nested_tensor_from_tensor_list(images), targets
