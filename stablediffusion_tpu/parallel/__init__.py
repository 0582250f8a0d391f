from stablediffusion_tpu.parallel.mesh import (
    MeshSpec,
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
)
from stablediffusion_tpu.parallel.mesh import maybe_initialize_distributed

