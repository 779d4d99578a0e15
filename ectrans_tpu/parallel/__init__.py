from .mesh import make_mesh  # noqa: F401
from .distribution import Distribution  # noqa: F401
from .sharded import ShardedTransform  # noqa: F401
