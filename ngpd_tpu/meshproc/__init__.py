from .trimesh import TriMesh  # noqa: F401
from .filtering import guided_normal_filter, update_vertex_positions  # noqa: F401
from . import metrics  # noqa: F401
from .datamanager import DataManager  # noqa: F401
from .collector import collect_patches, build_mesh_dataset  # noqa: F401
from .gcn_denoiser import gcn_denoise_mesh, predict_face_normals  # noqa: F401
