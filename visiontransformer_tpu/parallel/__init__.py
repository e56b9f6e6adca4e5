from visiontransformer_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    param_shardings,
    replicated,
)

__all__ = ["batch_sharding", "create_mesh", "param_shardings", "replicated"]
