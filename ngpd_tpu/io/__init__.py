from .obj import load_obj, read_obj, save_obj, ObjData  # noqa: F401
from .xyz import load_xyz, save_xyz  # noqa: F401
from .ply import load_ply, save_ply  # noqa: F401
from .sampling import sample_mesh  # noqa: F401
