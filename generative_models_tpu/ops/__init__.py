from generative_models_tpu.ops.common import on_tpu
from generative_models_tpu.ops.masked_dense import masked_dense
