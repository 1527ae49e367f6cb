from .mesh import make_mesh, stack_shards
from .dp import build_dp_train_step, shard_params_for_model_parallel
from .zero import (Zero1State, build_zero1_train_step, init_zero1_state)
