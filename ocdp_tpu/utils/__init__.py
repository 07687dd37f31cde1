"""Shared numerics: integrators, quaternions, frames."""

from .integrators import rk4_step, rkf45_integrate

__all__ = ["rk4_step", "rkf45_integrate"]
