from .distributed import global_mesh, host_batch_slice, initialize
from .mesh import make_mesh, MeshConfig
from .sharding import t3_param_specs, decode_state_specs, shard_params
