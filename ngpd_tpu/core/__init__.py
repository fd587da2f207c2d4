from .cloud import PointCloud  # noqa: F401
from . import noise  # noqa: F401
