from eld_tpu.train.state import TrainState, create_train_state, set_learning_rate  # noqa: F401
from eld_tpu.train.steps import make_train_scan, make_train_step, make_eval_forward  # noqa: F401
