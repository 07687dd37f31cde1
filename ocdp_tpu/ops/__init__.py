from .backup import BackupResult, bellman_backup
from .interp import InterpPlan, axis_locate, build_plan, interp_apply, interp_eval

__all__ = [
    "BackupResult",
    "bellman_backup",
    "InterpPlan",
    "axis_locate",
    "build_plan",
    "interp_apply",
    "interp_eval",
]
