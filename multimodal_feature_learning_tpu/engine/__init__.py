from .state import TrainState, create_train_state, save_checkpoint, load_checkpoint  # noqa: F401
from .logging import MetricLogger, SmoothedValue  # noqa: F401
