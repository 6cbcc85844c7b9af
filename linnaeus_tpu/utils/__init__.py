from .debug import check_debug_flag  # noqa: F401
from .logging import (  # noqa: F401
    create_h5data_logger,
    create_logger,
    get_h5data_logger,
    get_main_logger,
)
