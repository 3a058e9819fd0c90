"""RWZ strong-field calibration layer (models/rwz_calibration.py).

The table itself is generated and cross-validated by tools/rwz (see
tests/test_rwz.py for the solver-vs-PN-series gates); here we test the
production wiring: interpolation exactness, knob contracts, facade and
flux-grid integration.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from emri_frequencydomainwaveforms_tpu.models._rwz_calibration_data import (
    B_TABLE,
    N_X,
    X_HI,
    X_LO,
)
from emri_frequencydomainwaveforms_tpu.models.amplitude import (
    default_mode_table,
    mode_amplitudes,
)
from emri_frequencydomainwaveforms_tpu.models.rwz_calibration import (
    rwz_correction,
)


def test_interpolant_exact_at_nodes():
    xs = np.exp(np.linspace(np.log(X_LO), np.log(X_HI), N_X))
    ls = np.array([2, 4, 6])
    ms = np.array([2, 4, 5])
    x = jnp.asarray(np.broadcast_to(xs[:, None], (N_X, 3)))
    b = np.asarray(rwz_correction(ls, ms, x))
    for j, (l, m) in enumerate(zip(ls, ms)):
        # f32 dense-cardinal evaluation (round 4): node-exact to f32
        np.testing.assert_allclose(b[:, j], B_TABLE[(l, m)], rtol=5e-6)


def test_small_x_limit_near_one():
    # anchored modes are exact at small x; l = 5, 6 rows carry a genuine
    # O(x) correction the factorized model lacks entirely
    ls = np.array([2, 3, 4])
    ms = np.array([2, 3, 4])
    b = np.asarray(rwz_correction(ls, ms, jnp.full((3,), X_LO)))
    assert np.all(np.abs(b - 1.0) < 1e-3)


def test_uncalibrated_modes_identity():
    b = np.asarray(
        rwz_correction(np.array([2, 9]), np.array([0, 9]), jnp.full((2,), 0.05))
    )
    np.testing.assert_allclose(b, 1.0)


def test_clamps_outside_grid():
    ls, ms = np.array([4]), np.array([4])
    lo = float(rwz_correction(ls, ms, jnp.asarray([X_LO / 10]))[0])
    hi = float(rwz_correction(ls, ms, jnp.asarray([X_HI * 2]))[0])
    # f32 dense-cardinal evaluation (round 4): edge hold to f32 precision
    assert abs(lo - B_TABLE[(4, 4)][0]) < 1e-6
    assert abs(hi - B_TABLE[(4, 4)][-1]) < 1e-6


def test_mode_amplitudes_knob_contract():
    table = default_mode_table(2)
    p = jnp.asarray(10.0)
    e = jnp.asarray(0.2)
    with pytest.raises(ValueError):
        mode_amplitudes(p, e, table, rwz=True)
    ar0, ai0 = mode_amplitudes(p, e, table, tail=True, factorized=True)
    ar1, ai1 = mode_amplitudes(p, e, table, tail=True, factorized=True, rwz=True)
    a0 = np.asarray(ar0) + 1j * np.asarray(ai0)
    a1 = np.asarray(ar1) + 1j * np.asarray(ai1)
    live = np.abs(a0) > 1e-30
    ratio = np.where(live, a1 / np.where(live, a0, 1.0), 1.0)
    # bounded multiplicative correction (the calibration generator clamps
    # accepted residuals to (0.2, 5)); weak m=1 / high-n families carry
    # genuine ~2-4x strong-field moduli, dominant modes only a smooth
    # phase rotation — so the POWER-weighted rescale stays near 1
    # application-time modulus clamp is [0.15, 6.0] (f32: allow rounding)
    assert np.all(np.abs(ratio) > 0.1499) and np.all(np.abs(ratio) < 6.01)
    power = np.sum(np.abs(a1) ** 2) / np.sum(np.abs(a0) ** 2)
    assert 0.8 < power < 1.25
    assert np.any(np.abs(ratio - 1.0) > 1e-4)


def test_flux_grid_rwz_builds_and_shifts():
    from emri_frequencydomainwaveforms_tpu.models.flux import flux_from_modes

    p = jnp.asarray([10.0])
    e = jnp.asarray([0.25])
    de0, _ = flux_from_modes(p, e, tail=True, factorized=True)
    de1, _ = flux_from_modes(p, e, tail=True, factorized=True, rwz=True)
    rel = float(abs(de1[0] / de0[0] - 1.0))
    assert 1e-5 < rel < 0.05


def test_flux_grid_first_built_inside_jit_is_reusable():
    """Regression: the lru-cached flux grid must hold concrete (numpy)
    tables even when its FIRST build is triggered from inside a jit
    trace — a trace-bound constant in the cache poisons every later
    trace with UnexpectedTracerError (found via emri_pe -flux
    multipole_rwz, whose first prologue runs under the jitted
    trajectory)."""
    import jax
    import jax.numpy as jnp

    from emri_frequencydomainwaveforms_tpu.models.flux import (
        build_flux_grid,
        default_flux_grid,
    )

    default_flux_grid.cache_clear()
    try:

        @jax.jit
        def first(x):
            g = default_flux_grid(tail=False)
            return x + jnp.asarray(g.values).sum()

        @jax.jit
        def second(x):
            g = default_flux_grid(tail=False)
            return x * jnp.asarray(g.values).sum()

        a = float(first(jnp.asarray(1.0)))
        b = float(second(jnp.asarray(1.0)))
        assert np.isfinite(a) and np.isfinite(b)
        cached = default_flux_grid(tail=False)
        assert isinstance(cached.values, np.ndarray)
    finally:
        default_flux_grid.cache_clear()


def test_rwz_ecc_residual_identity_without_table():
    from emri_frequencydomainwaveforms_tpu.models import rwz_calibration as rc

    ls = np.array([2, 3])
    ms = np.array([2, 2])
    ns = np.array([0, 1])
    r_re, r_im = (
        np.asarray(a) for a in
        rc.rwz_ecc_residual(ls, ms, ns, jnp.asarray(1.2), jnp.asarray(0.3))
    )
    assert r_re.shape == (2,) and r_im.shape == (2,)
    if rc._ecc is None:
        np.testing.assert_allclose(r_re, 1.0)
        np.testing.assert_allclose(r_im, 0.0)
    else:
        # calibrated rows are bounded multiplicative corrections with a
        # bounded phase
        mag = np.hypot(r_re, r_im)
        assert np.all(mag > 0.5) and np.all(mag < 1.5)
        assert np.all(np.abs(np.arctan2(r_im, r_re)) < 0.5)


def test_interp2d_grid_carries_full_fidelity_source():
    """An Interp2D grid built from `full_fidelity_amplitudes` must
    reproduce the calibrated amplitudes to interpolation accuracy — the
    drop-in-table path that mirrors the reference's Teukolsky-backed
    Interp2DAmplitude."""
    from emri_frequencydomainwaveforms_tpu.models.amplitude import (
        full_fidelity_amplitudes,
    )
    from emri_frequencydomainwaveforms_tpu.models.amplitude_backends import (
        build_amplitude_grid,
        mode_amplitudes_interp2d,
    )

    table = default_mode_table(4, l_max=2)
    grid = build_amplitude_grid(
        table, n_u=48, n_e=17, e_range=(1e-6, 0.6),
        source=full_fidelity_amplitudes,
    )
    p = jnp.asarray([8.5, 11.0])
    e = jnp.asarray([0.25, 0.4])
    gr, gi = mode_amplitudes_interp2d(p, e, grid)
    dr, di = full_fidelity_amplitudes(p, e, table)
    mag = np.abs(np.asarray(dr)) + np.abs(np.asarray(di))
    scale = np.maximum(mag, mag.max() * 1e-3)
    err = (np.abs(np.asarray(gr - dr)) + np.abs(np.asarray(gi - di))) / scale
    # the eccentric residual R is piecewise-BILINEAR in (u, e) (round-4
    # dense table), so the bicubic sampling grid carries O(cell) error
    # near the residual table's cell boundaries; dominant modes stay
    # interpolation-accurate, weak sidebands may see ~1%
    dominant = mag > 0.1 * mag.max()
    assert float(err[dominant].max()) < 2e-3
    assert float(err.max()) < 5e-2


def test_facade_rwz_waveform_runs():
    from emri_frequencydomainwaveforms_tpu.models.waveform import (
        GenerateEMRIWaveform,
    )

    # reduced inventory (n_max=8, l_max=3): the check is that the rwz
    # calibration measurably changes the facade output, which the l <= 3
    # rows already carry — the full l_max=6 production default costs
    # ~6 min of 1-core CI per stack and adds no coverage here (the
    # production inventory itself is exercised by bench.py's gates and
    # tools/convergence_l56.py)
    gen = GenerateEMRIWaveform(
        sum_kwargs={"output_type": "fd", "flux": "multipole_rwz"},
        amplitude_kwargs={"tail": True, "factorized": True, "rwz": True},
        n_max=8, l_max=3,
    )
    gen0 = GenerateEMRIWaveform(
        sum_kwargs={"output_type": "fd", "flux": "multipole_factorized"},
        amplitude_kwargs={"tail": True, "factorized": True},
        n_max=8, l_max=3,
    )
    args = (1e6, 10.0, 0.0, 11.0, 0.3, 1.0, 1.0, 0.6, 0.4, 0.7, 0.3, 0.0, 0.0, 0.0)
    kw = dict(T=0.02, dt=10.0, eps=1e-2)
    h1 = np.asarray(gen(*args, **kw))
    h0 = np.asarray(gen0(*args, **kw))
    assert np.all(np.isfinite(h1))
    num = np.linalg.norm(h1 - h0)
    den = np.linalg.norm(h0)
    assert 1e-7 < num / den < 0.2
