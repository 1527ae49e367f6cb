from .mesh import make_mesh, stack_shards
from .dp import build_dp_train_step, shard_params_for_model_parallel
