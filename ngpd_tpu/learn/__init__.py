from . import losses  # noqa: F401
from .train import TrainState, make_train_step, make_eval_step  # noqa: F401
