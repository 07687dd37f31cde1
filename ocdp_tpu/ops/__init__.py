from .backup import BackupResult, bellman_backup
from .interp import InterpPlan, axis_locate, build_plan, interp_apply, interp_eval

__all__ = [
    "BackupResult",
    "bellman_backup",
    "InterpPlan",
    "axis_locate",
    "build_plan",
    "default_impl",
    "interp_apply",
    "interp_eval",
]


def default_impl(tpu_impl: str, cpu_impl: str = "stencil") -> str:
    """Resolve ``impl='auto'``: the bench-winning Mosaic path on a real TPU,
    the portable XLA stencil elsewhere (interpret-mode Pallas is orders of
    magnitude slower than the stencil on CPU). Callers fall back to
    ``cpu_impl`` if the fast path's build raises (e.g. ShearBandError)."""
    import jax

    return tpu_impl if jax.default_backend() == "tpu" else cpu_impl
