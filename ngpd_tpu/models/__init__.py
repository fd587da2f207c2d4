from .patch2normal import Patch2NormalModel  # noqa: F401
from .dgcnn import DGCNN  # noqa: F401
