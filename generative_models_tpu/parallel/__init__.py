from generative_models_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    SEQ_AXIS,
    batch_sharding,
    constrain,
    constrain_batch,
    fsdp_place,
    get_mesh,
    make_mesh,
    maybe_initialize_distributed,
    parse_mesh_spec,
    replicate,
    replicated,
    set_mesh,
    shard_batch,
    shard_by_rules,
)
from generative_models_tpu.parallel.pipeline import PIPE_AXIS, pipeline_apply
