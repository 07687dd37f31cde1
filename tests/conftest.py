"""Test config: run on CPU with 8 virtual devices so sharding tests work
without multi-chip hardware (SURVEY.md §4: sharded == single-chip tests).

Note: the axon TPU plugin in this image overrides ``JAX_PLATFORMS`` from
inside its ``register()`` hook, so the env var alone is not enough — we must
call ``jax.config.update`` after import. ``XLA_FLAGS`` must be set before the
CPU backend initializes (it is read lazily at first device query).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
