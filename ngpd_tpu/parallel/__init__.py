from .mesh import make_mesh, shard_points  # noqa: F401
from .sharded import (  # noqa: F401
    chamfer_distance_sharded,
    denoise_sharded,
    knn_sharded,
)
