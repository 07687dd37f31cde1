"""Shared numerics: integrators, quaternions, frames."""

from .integrators import ode45_integrate, rk4_step, rkf45_integrate

__all__ = ["ode45_integrate", "rk4_step", "rkf45_integrate"]
