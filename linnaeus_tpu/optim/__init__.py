from .ademamix import ademamix, scale_by_ademamix  # noqa: F401
from .build import build_optimizer, lr_dict_for_logging, lr_multipliers  # noqa: F401
from .muon import muon, scale_by_muon, zeropower_via_newtonschulz5  # noqa: F401
from .schedules import (  # noqa: F401
    apply_lr_scaling,
    build_group_schedules,
    build_schedule,
    cosine_schedule,
    linear_schedule,
    step_schedule,
    wsd_schedule,
)
