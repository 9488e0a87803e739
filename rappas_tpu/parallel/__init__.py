from rappas_tpu.parallel.mesh import (  # noqa: F401
    ShardedPlacement, make_mesh)
