"""Weight initializers mirroring the reference's init scheme.

Reference init recipe (implemented intent, not ported code):
- patch-embed conv: trunc_normal(std=sqrt(1/fan_in)), zero bias
  (vanilla_vit.py:143-147)
- MLP linears: xavier_uniform weight, bias ~ N(0, 1e-6) (vanilla_vit.py:52-56)
- positional embedding: N(0, 0.02) (vanilla_vit.py:93, "from BERT")
- classifier head: zeros (vanilla_vit.py:149-151)
- class token: zeros (vanilla_vit.py:132)
- PVT/Twins/TNT: trunc_normal(std=0.02) for linears (pvt.py:180-181)
"""

from __future__ import annotations

import math

from jax.nn import initializers as jinit

# flax passes (key, shape, dtype) to initializers.

trunc_normal_init = lambda std=0.02: jinit.truncated_normal(stddev=std)
xavier_uniform_init = jinit.xavier_uniform
zeros_init = jinit.zeros
normal_init = lambda std=0.02: jinit.normal(stddev=std)


def tiny_normal_init(std: float = 1e-6):
    """Bias init ~ N(0, 1e-6) used by the reference MLP blocks."""
    return jinit.normal(stddev=std)


def conv_patch_init(patch_size: int, in_channels: int = 3):
    """trunc_normal(std=sqrt(1/fan_in)) for the patch-embedding projection.

    fan_in = in_channels * patch_size**2 regardless of whether the projection
    is expressed as a conv (reference) or a flattened-patch matmul (here).
    """
    fan_in = in_channels * patch_size * patch_size
    return jinit.truncated_normal(stddev=math.sqrt(1.0 / fan_in))


def lecun_conv_init():
    """Default conv init (lecun normal), used where the reference keeps
    PyTorch's default Conv2d init (kaiming-uniform); exact RNG parity is not
    required — parity is same-math-same-weights (SURVEY.md §7)."""
    return jinit.lecun_normal()
