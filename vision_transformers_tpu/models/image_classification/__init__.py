from vision_transformers_tpu.models.image_classification.vanilla_vit import ViT
from vision_transformers_tpu.models.image_classification.cpe_vit import CPEViT
from vision_transformers_tpu.models.image_classification.cpvt import CPVT, CPVTGAP
from vision_transformers_tpu.models.image_classification.swin_transformer import (
    SwinTransformer,
    SwinTransformerV2,
)
from vision_transformers_tpu.models.image_classification.pvt import PVT
from vision_transformers_tpu.models.image_classification.twins_svt import TwinSVT
from vision_transformers_tpu.models.image_classification.t2t_vit import T2T_ViT
from vision_transformers_tpu.models.image_classification.tnt import TNT
from vision_transformers_tpu.models.image_classification.deit import DeiT
