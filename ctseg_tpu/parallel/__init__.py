from ctseg_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_spatial_mesh,
    replicated,
)
