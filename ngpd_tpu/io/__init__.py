from .obj import load_obj, read_obj, save_obj, ObjData  # noqa: F401
from .xyz import load_xyz, save_xyz  # noqa: F401
from .ply import load_ply, save_ply  # noqa: F401
from .sampling import sample_mesh  # noqa: F401
from .matpatch import load_mat_patch, save_mat_patch  # noqa: F401
from .h5paths import load_path_list, save_path_list  # noqa: F401
