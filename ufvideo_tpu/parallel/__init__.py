from .mesh import (  # noqa: F401
    AXIS_NAMES,
    BATCH_SPEC,
    DATA_AXIS,
    FSDP_AXIS,
    TENSOR_AXIS,
    batch_sharding,
    create_mesh,
    replicated,
    sharding,
    single_device_mesh,
)
from .pipeline import (  # noqa: F401
    pipeline_apply,
    pipeline_backbone,
)
from .partition import (  # noqa: F401
    DEFAULT_RULES,
    QWEN2_RULES,
    partition_specs,
    shard_params,
    shardings_for,
)
