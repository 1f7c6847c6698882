"""Native fused augmentation vs the numpy reference pipeline."""

import numpy as np
import pytest

from vision_transformers_tpu import native
from vision_transformers_tpu.utils import load_data as ld


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_native_matches_numpy_pipeline(lib_available):
    rng_data = np.random.RandomState(0)
    x = rng_data.randint(0, 256, (16, 32, 32, 3), dtype=np.uint8)

    out_native = native.fused_augment(x, np.random.RandomState(42))

    rng = np.random.RandomState(42)
    ref = ld.random_crop_batch(x, rng)
    ref = ld.random_hflip_batch(ref, rng)
    ref = ld.brightness_jitter_batch(ref, rng)

    np.testing.assert_array_equal(out_native, ref)


def test_native_handles_edge_crops(lib_available):
    """All-corner crop offsets: padding zeros must land exactly."""
    x = np.full((4, 8, 8, 3), 200, np.uint8)

    class FixedRng:
        def __init__(self):
            self.calls = 0
        def randint(self, lo, hi, n):
            self.calls += 1
            return np.zeros(n, np.int64) if self.calls == 1 \
                else np.full(n, 8, np.int64)  # ys=0 (top), xs=8 (right)
        def rand(self, n):
            return np.ones(n)  # no flips (p=0.5 → 1.0 >= p)
        def uniform(self, lo, hi, n):
            return np.ones(n)  # no jitter

    out = native.fused_augment(x, FixedRng(), pad=4)
    # ys=0 → rows shifted: first 4 output rows come from padding (zeros)
    assert (out[:, :4, :, :] == 0).all()
    # xs=8 → last 4 output cols are padding
    assert (out[:, :, -4:, :] == 0).all()
    assert (out[:, 4:, :4, :] == 200).all()


def test_array_loader_uses_native_when_available(lib_available):
    x = np.random.RandomState(0).randint(0, 256, (32, 32, 32, 3), np.uint8)
    y = np.arange(32, dtype=np.int32)
    loader = ld.ArrayLoader(x, y, 16, shuffle=False, augment=True,
                            normalize=((0.5,) * 3, (0.25,) * 3), seed=7)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0][0].dtype == np.uint8
