"""Multi-device / multi-host execution: mesh sharding and distributed
initialization."""

from .mesh import DATA_AXIS, make_mesh, parallelize  # noqa: F401
from .schur_shard import optimize_sharded, parallelize_schur  # noqa: F401
