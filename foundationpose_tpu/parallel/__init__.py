from foundationpose_tpu.parallel import multihost  # noqa: F401
from foundationpose_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    make_device_mesh,
    replicate,
    shard_batch,
)
