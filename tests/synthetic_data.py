"""Synthetic in-memory loaders for tests (no dataset downloads in CI)."""

import numpy as np


class SyntheticLoader:
    """Re-iterable loader of (images NHWC uint8, labels) with a learnable
    class→color mapping so tiny models can overfit in a few steps."""

    def __init__(self, num_samples=64, batch_size=16, image_size=32,
                 num_classes=4, seed=0, dtype=np.uint8):
        rng = np.random.RandomState(seed)
        self.labels = rng.randint(0, num_classes, size=num_samples).astype(np.int32)
        base = rng.randint(0, 255, size=(num_classes, 3))
        imgs = base[self.labels][:, None, None, :] * np.ones(
            (1, image_size, image_size, 1)
        )
        noise = rng.randint(-20, 20, size=(num_samples, image_size, image_size, 3))
        self.images = np.clip(imgs + noise, 0, 255).astype(dtype)
        self.batch_size = batch_size
        self.normalize = ((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))

    def __iter__(self):
        for i in range(0, len(self.labels), self.batch_size):
            yield (
                self.images[i:i + self.batch_size],
                self.labels[i:i + self.batch_size],
            )

    def __len__(self):
        return (len(self.labels) + self.batch_size - 1) // self.batch_size
