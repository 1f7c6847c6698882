from vision_transformers_tpu.core.dtypes import Policy, default_policy
from vision_transformers_tpu.core.initializers import (
    trunc_normal_init,
    conv_patch_init,
    xavier_uniform_init,
    tiny_normal_init,
    zeros_init,
)
