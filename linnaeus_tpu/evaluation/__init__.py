from .complexity import (  # noqa: F401
    count_params,
    estimate_all_archs,
    estimate_model_complexity,
)
from .throughput import generate_synthetic_data, throughput_test  # noqa: F401
