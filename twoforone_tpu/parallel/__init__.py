from twoforone_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    shard_batch,
    replicate,
)
