"""Mosaic-lowerable atan2/asin (ops/kernelmath.py) vs numpy float64.

These back the 6-D kernel's in-kernel Euler readback (lane-recompute mode);
their error budget must sit below the grid-locate noise floor: Euler grid
steps are ~0.05 rad, so 1e-6 rad of angle error moves frac by ~2e-5 —
the same order as f32 interpolation rounding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ocdp_tpu.ops.kernelmath import asin_f32, atan2_f32, atan_f32


def test_atan_dense():
    x = np.concatenate([
        np.linspace(-50, 50, 20001),
        np.logspace(-8, 2, 1000),
        -np.logspace(-8, 2, 1000),
        [0.0, _t := 0.4142135623730950, -_t, 2.414213562373095],
    ]).astype(np.float32)
    got = np.asarray(atan_f32(jnp.asarray(x)))
    ref = np.arctan(x.astype(np.float64))
    assert np.max(np.abs(got - ref)) < 5e-7


def test_atan2_all_quadrants():
    rng = np.random.default_rng(0)
    y = rng.uniform(-3, 3, 200_000).astype(np.float32)
    x = rng.uniform(-3, 3, 200_000).astype(np.float32)
    got = np.asarray(atan2_f32(jnp.asarray(y), jnp.asarray(x)))
    ref = np.arctan2(y.astype(np.float64), x.astype(np.float64))
    assert np.max(np.abs(got - ref)) < 5e-7


def test_atan2_axes_conventions():
    pts = [(0.0, 1.0), (0.0, -1.0), (-0.0, -1.0), (1.0, 0.0), (-1.0, 0.0),
           (0.0, 0.0)]
    for yy, xx in pts:
        got = float(atan2_f32(jnp.float32(yy), jnp.float32(xx)))
        ref = float(np.arctan2(np.float32(yy), np.float32(xx)))
        # -0.0 inputs: our jnp.where(y < 0) branch cannot see the sign of
        # -0.0; both +-pi are the same ray, accept either
        assert abs(got - ref) < 1e-6 or abs(abs(got) - np.pi) < 1e-6, \
            (yy, xx, got, ref)


def test_asin_dense():
    x = np.linspace(-0.9999, 0.9999, 100001).astype(np.float32)
    got = np.asarray(asin_f32(jnp.asarray(x)))
    ref = np.arcsin(x.astype(np.float64))
    assert np.max(np.abs(got - ref)) < 1.5e-6
    # exact endpoints
    assert abs(float(asin_f32(jnp.float32(1.0))) - np.pi / 2) < 1e-6
    assert abs(float(asin_f32(jnp.float32(-1.0))) + np.pi / 2) < 1e-6


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Mosaic lowering check needs the TPU backend")
def test_lowers_inside_pallas_kernel():
    from jax.experimental import pallas as pl

    def k(y_ref, x_ref, o_ref):
        o_ref[:, :] = atan2_f32(y_ref[:, :], x_ref[:, :]) \
            + asin_f32(x_ref[:, :] * 0.3)

    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.uniform(-2, 2, (8, 256)), jnp.float32)
    x = jnp.asarray(rng.uniform(-2, 2, (8, 256)), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32))(y, x)
    ref = atan2_f32(y, x) + asin_f32(x * 0.3)     # same fn through XLA
    assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < 1e-6
