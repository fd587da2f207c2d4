from .neighbors import Neighborhood  # noqa: F401
from .knn import knn, knn_grid, nn_distances, pairwise_sqdist  # noqa: F401
from .eigh3 import eigh3x3  # noqa: F401
from .solve3 import solve3x3_guarded  # noqa: F401
from . import metrics  # noqa: F401
