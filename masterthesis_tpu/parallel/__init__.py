from masterthesis_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    make_mesh_2d,
    replicate,
    replicated_sharding,
    spatial_sharding,
)
