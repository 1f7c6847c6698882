from vision_transformers_tpu.parallel.mesh import (
    make_mesh,
    shard_params,
    batch_sharding,
    replicated,
    param_partition_spec,
)
from vision_transformers_tpu.parallel.distributed import (
    init_distributed_mode,
    is_main_process,
    get_rank,
    get_world_size,
    all_gather_objects,
    save_on_master,
)
from vision_transformers_tpu.parallel.mesh import audit_tp_coverage
from vision_transformers_tpu.parallel.sequence import (
    ring_attention_local,
    sequence_parallel_attention,
    sequence_sharding,
)
from vision_transformers_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_local,
    vit_pipeline_forward,
)
from vision_transformers_tpu.parallel.expert import (
    expert_parallel_mlp,
    moe_mlp_reference,
)
