from vision_transformers_tpu.models.image_classification.vanilla_vit import ViT
from vision_transformers_tpu.models.image_classification.cpe_vit import CPEViT
from vision_transformers_tpu.models.image_classification.cpvt import CPVT, CPVTGAP
from vision_transformers_tpu.models.image_classification.swin_transformer import (
    SwinTransformer,
)
