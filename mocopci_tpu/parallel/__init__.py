from mocopci_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_mesh_for_batch,
    replicated,
    shard_batch,
)
from mocopci_tpu.parallel.sp import chamfer_distance_sp
from mocopci_tpu.parallel.sp_forward import eval_forward_sp
