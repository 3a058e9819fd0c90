"""interp2d_bicubic_dense vs interp2d_bicubic equivalence (round-4 advisor item).

The dense-cardinal path claims to evaluate the IDENTICAL Catmull-Rom surface
as the 4x4-stencil gather path (same indices, clamps, weights; differences
reduction-order ULPs). That claim carried a production-default flip in round 4
with zero direct coverage — this file pins it: values, out-of-range clamping,
broadcasting with trailing channel dims, jax.grad, and trajectory invariance
through the flux consumer (reference contract: the C++ bicubic interpolant of
``few.amplitude.interp2dcubicspline.Interp2DAmplitude``, single-mode nb cell 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emri_frequencydomainwaveforms_tpu.ops.interp2d import (
    interp2d_bicubic,
    interp2d_bicubic_dense,
)

jax.config.update("jax_enable_x64", True)


def _mk(seed=0, nx=17, ny=11, channels=()):
    rng = np.random.default_rng(seed)
    vals = rng.standard_normal((nx, ny) + channels)
    return 0.3, 0.11, -1.0, 0.07, jnp.asarray(vals)


@pytest.mark.parametrize("channels", [(), (2,), (3, 2)])
def test_dense_matches_gather_values(channels):
    x0, dx, y0, dy, vals = _mk(1, channels=channels)
    rng = np.random.default_rng(2)
    nx, ny = vals.shape[0], vals.shape[1]
    # interior, edge, and FAR out-of-range queries (clamping must agree)
    xq = jnp.asarray(
        np.concatenate(
            [
                x0 + dx * rng.uniform(0, nx - 1, 64),
                np.array([x0 - 5.0, x0, x0 + dx * (nx - 1), x0 + dx * nx + 7.0]),
            ]
        )
    )
    yq = jnp.asarray(
        np.concatenate(
            [
                y0 + dy * rng.uniform(0, ny - 1, 64),
                np.array([y0 - 3.0, y0, y0 + dy * (ny - 1), y0 + dy * ny + 2.0]),
            ]
        )
    )
    a = interp2d_bicubic(x0, dx, y0, dy, vals, xq, yq)
    b = interp2d_bicubic_dense(x0, dx, y0, dy, vals, xq, yq)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-13)


def test_dense_matches_gather_grad():
    x0, dx, y0, dy, vals = _mk(3)
    xq = jnp.asarray([1.01, 1.3, 0.4, 2.2])
    yq = jnp.asarray([-0.7, -0.1, -0.5, -0.9])

    def s_gather(x, y):
        return jnp.sum(interp2d_bicubic(x0, dx, y0, dy, vals, x, y) ** 2)

    def s_dense(x, y):
        return jnp.sum(interp2d_bicubic_dense(x0, dx, y0, dy, vals, x, y) ** 2)

    ga = jax.grad(s_gather, argnums=(0, 1))(xq, yq)
    gb = jax.grad(s_dense, argnums=(0, 1))(xq, yq)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-12)


def test_dense_sanitizes_nonfinite_off_stencil():
    # advisor finding: 0 * nan in the dense einsum poisoned every query.
    # A non-finite entry OUTSIDE the 4x4 stencil must not reach the result.
    x0, dx, y0, dy, vals = _mk(4)
    vals = vals.at[-1, -1].set(jnp.nan)
    xq = jnp.asarray([x0 + 2.4 * dx])
    yq = jnp.asarray([y0 + 2.6 * dy])
    a = interp2d_bicubic(x0, dx, y0, dy, vals, xq, yq)
    b = interp2d_bicubic_dense(x0, dx, y0, dy, vals, xq, yq)
    assert np.all(np.isfinite(np.asarray(b)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-13)


def test_flux_consumer_dense_gather_invariance():
    """Trajectory-level invariance: flux via dense == via gather (tight)."""
    from emri_frequencydomainwaveforms_tpu.models.flux import (
        default_flux_grid,
        multipole_flux_e_l,
    )

    grid = default_flux_grid(tail=True, factorized=True, rwz=True)
    rng = np.random.default_rng(5)
    p = jnp.asarray(6.0 + 2.0 * 0.3 + np.exp(rng.uniform(np.log(0.05), np.log(8.0), 32)))
    e = jnp.asarray(rng.uniform(0.0, 0.6, 32))
    de_g, dl_g = multipole_flux_e_l(p, e, grid=grid, dense=False)
    de_d, dl_d = multipole_flux_e_l(p, e, grid=grid, dense=True)
    np.testing.assert_allclose(np.asarray(de_g), np.asarray(de_d), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dl_g), np.asarray(dl_d), rtol=1e-12)
