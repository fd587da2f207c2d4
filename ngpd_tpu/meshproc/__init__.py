from .trimesh import TriMesh  # noqa: F401
from .filtering import guided_normal_filter, update_vertex_positions  # noqa: F401
from . import metrics  # noqa: F401
