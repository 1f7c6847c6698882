from vision_transformers_tpu.ops.attention import (
    dot_product_attention,
    mha_reference,
    SelfAttention,
)
from vision_transformers_tpu.ops.mlp import MLPBlock, Mlp
from vision_transformers_tpu.ops.patch_embed import PatchEmbed, patchify
from vision_transformers_tpu.ops.layers import DropPath, Identity, LayerNorm
