from .scheduler import noam_schedule  # noqa: F401
from .step import TrainState, make_train_step, make_optimizer, loss_and_metrics  # noqa: F401
