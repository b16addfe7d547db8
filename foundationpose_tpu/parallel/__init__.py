from foundationpose_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    make_device_mesh,
    shard_batch,
)
