from controlvar_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_shardings,
    batch_sharding,
    replicated,
)
