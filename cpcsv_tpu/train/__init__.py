from cpcsv_tpu.train.state import NetState, TrainState, create_train_state
from cpcsv_tpu.train.steps import make_train_steps

__all__ = ["NetState", "TrainState", "create_train_state", "make_train_steps"]
