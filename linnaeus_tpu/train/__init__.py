from .autobatch import auto_find_batch_size, estimate_step_memory  # noqa: F401
from .loop import Trainer  # noqa: F401
from .state import TrainState, create_train_state  # noqa: F401
from .step import ScheduleScalars, make_eval_step, make_train_step  # noqa: F401
from .validation import validate_one_pass, validate_with_partial_mask  # noqa: F401
