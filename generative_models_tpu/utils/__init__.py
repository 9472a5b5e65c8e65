from generative_models_tpu.utils.config import (
    AttrDict,
    args_type,
    dump_hps,
    global_defaults,
    parse_args,
    prefix_dict,
)
from generative_models_tpu.utils.logger import (
    combine_imgs,
    count_vars,
    dump_logger,
    grid_image,
    make_logger,
    to_numpy,
    write_grid,
    write_gridvid,
    write_image,
)
from generative_models_tpu.utils.metrics import (
    compute_fid,
    frechet_distance,
    precision_recall_f1,
)
from generative_models_tpu.utils.registry import discover_models, register
