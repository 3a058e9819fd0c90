"""Factorized-resummation validation mesh (models.rho).

Exact-rational cross-checks between three independently published series
families — rho_lm residual corrections, the 1PN mode-amplitude series
h_lm, and the test-mass GW flux series — through the factorization
identities. Any single corrupted coefficient in models/rho.py (or in the
multipole constants of models/amplitude.py, which set the Newtonian
weights) breaks an exact Fraction equality here.

External anchors (published PN results, NOT derived from this repo):
  * h_lm 1PN amplitude coefficients (test mass): -107/42 (22), -17/28
    (21), -4 (33), -8/3 (31), -593/110 (44), -437/110 (42), -39/11 (43),
    -101/33 (41), -263/39 (55); h_22 2PN: -2173/1512.
  * total test-mass flux: F/F_N = 1 - 1247/336 x + 4 pi x^{3/2}
    - 44711/9072 x^2 - 8191 pi/672 x^{5/2} + ...
"""

from fractions import Fraction as Fr

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emri_frequencydomainwaveforms_tpu.models.amplitude import (
    _FAMILIES,
    default_mode_table,
    mode_amplitudes,
)
from emri_frequencydomainwaveforms_tpu.models import rho as rho_mod


# ---------------------------------------------------------------------------
# tiny exact series toolkit: {half_power: {pi_power: Fraction}}
# powers are stored as int(2 * x-exponent) so x^{3/2} terms are exact.
# ---------------------------------------------------------------------------

def s_const(c, pi_pow=0):
    return {0: {pi_pow: Fr(c)}}


def s_add(a, b):
    out = {k: dict(v) for k, v in a.items()}
    for k, pv in b.items():
        tgt = out.setdefault(k, {})
        for pp, c in pv.items():
            tgt[pp] = tgt.get(pp, Fr(0)) + c
    return out


def s_mul(a, b, max_half=5):
    out = {}
    for ka, pa in a.items():
        for kb, pb in b.items():
            k = ka + kb
            if k > max_half:
                continue
            tgt = out.setdefault(k, {})
            for ppa, ca in pa.items():
                for ppb, cb in pb.items():
                    pp = ppa + ppb
                    tgt[pp] = tgt.get(pp, Fr(0)) + ca * cb
    return out


def s_pow(a, n, max_half=5):
    out = s_const(1)
    for _ in range(n):
        out = s_mul(out, a, max_half)
    return out


def s_coeff(a, half_power, pi_power=0):
    return a.get(half_power, {}).get(pi_power, Fr(0))


def binom_series(alpha_num, alpha_den, coef, max_half=5):
    """(1 + coef * x)^(alpha_num/alpha_den) as an exact series in x."""
    alpha = Fr(alpha_num, alpha_den)
    out = {0: {0: Fr(1)}}
    term = Fr(1)
    for k in range(1, max_half // 2 + 1):
        term *= (alpha - (k - 1)) / k * Fr(coef)
        out[2 * k] = {0: term}
    return out


# exact geodesic sources, circular limit (u = x)
def source_even_series(max_half=5):
    # (1 - 2x) / sqrt(1 - 3x)
    return s_mul(
        s_add(s_const(1), {2: {0: Fr(-2)}}),
        binom_series(-1, 2, -3, max_half),
        max_half,
    )


def source_odd_series(max_half=5):
    return binom_series(-1, 2, -3, max_half)


# rho series re-declared as exact rationals (independent transcription;
# cross-checked against the module's float table below)
RHO_FR = {
    (2, 2): [Fr(-43, 42), Fr(-20555, 10584)],
    (2, 1): [Fr(-59, 56), Fr(-47009, 56448)],
    (3, 3): [Fr(-7, 6), Fr(-6719, 3960)],
    (3, 1): [Fr(-13, 18), Fr(101, 7128)],
    (3, 2): [Fr(-164, 135)],
    (4, 4): [Fr(-269, 220)],
    (4, 2): [Fr(-191, 220)],
    (4, 3): [Fr(-111, 88)],
    (4, 1): [Fr(-301, 264)],
    (5, 5): [Fr(-487, 390)],
}

# published 1PN h_lm coefficients (test mass) — the first anchor family
H_1PN = {
    (2, 2): Fr(-107, 42),
    (2, 1): Fr(-17, 28),
    (3, 3): Fr(-4),
    (3, 1): Fr(-8, 3),
    (3, 2): None,  # rho32 1PN has no independent anchor here
    (4, 4): Fr(-593, 110),
    (4, 2): Fr(-437, 110),
    (4, 3): Fr(-39, 11),
    (4, 1): Fr(-101, 33),
    (5, 5): Fr(-263, 39),
}
H_2PN_22 = Fr(-2173, 1512)


def rho_series(lm, max_half=5):
    out = s_const(1)
    for k, c in enumerate(RHO_FR[lm], start=1):
        out = s_add(out, {2 * k: {0: c}})
    return out


def test_rho_table_matches_exact_rationals():
    """models/rho.py float table == the independently transcribed Fractions."""
    for lm, fr in RHO_FR.items():
        mod = rho_mod._RHO[lm]
        for k, c in enumerate(fr):
            assert abs(mod[k] - float(c)) < 1e-15, (lm, k)


def test_amplitude_identities_1pn():
    """S_parity * rho_lm^l reproduces the published 1PN h_lm coefficients."""
    for (l, m), anchor in H_1PN.items():
        if anchor is None:
            continue
        src = source_even_series() if (l + m) % 2 == 0 else source_odd_series()
        h = s_mul(src, s_pow(rho_series((l, m)), l))
        assert s_coeff(h, 2) == anchor, (l, m, s_coeff(h, 2), anchor)


def test_amplitude_identity_2pn_22():
    """The (2,2) 2PN amplitude closes: E_hat * rho22^2 at x^2 = -2173/1512."""
    h = s_mul(source_even_series(), s_pow(rho_series((2, 2)), 2))
    assert s_coeff(h, 4) == H_2PN_22


def newtonian_weights():
    """a_lm (relative Newtonian mode-flux weights) from the repo constants.

    F_lm / F_N = a_lm x^{3l - 2 rp - lp - 2} with
    a_lm = 5/(256 pi) * |C_lm|^2 * m^{2l+2}; the x power must come out as
    a small non-negative integer (0 for (2,2), 1 for 21/33/31, 2 for
    44/42/32).
    """
    out = {}
    for (l, m), (k, rp, lp, c_re, c_im) in _FAMILIES.items():
        if m == 0:
            continue  # no circular-orbit radiation (omega_m0 = 0 needs m)
        if l > 6:
            # the round-4 l=7/8 constants are full-precision numerics
            # (|C|^2/pi ~ 1e-11 is below Fraction.limit_denominator's
            # resolution); they are anchored by the generic-STF Thorne
            # brute force and the RWZ circular B -> 1 limit instead
            continue
        c2_over_pi = (c_re * c_re + c_im * c_im) / np.pi
        fr = Fr(c2_over_pi).limit_denominator(10**9)
        assert abs(float(fr) - c2_over_pi) < 1e-12, (l, m)
        a = Fr(5, 256) * fr * Fr(m) ** (2 * l + 2)
        xpow = 3 * l - 2 * rp - lp - 2
        assert xpow >= 0, (l, m)
        out[(l, m)] = (a, xpow)
    return out


def test_newtonian_weights_match_published():
    """The repo multipole constants give the known Newtonian mode weights."""
    w = newtonian_weights()
    assert w[(2, 2)] == (Fr(1), 0)
    assert w[(2, 1)] == (Fr(1, 36), 1)
    assert w[(3, 3)] == (Fr(1215, 896), 1)
    assert w[(3, 1)] == (Fr(1, 8064), 1)
    assert w[(4, 4)] == (Fr(1280, 567), 2)
    assert w[(4, 2)] == (Fr(5, 3969), 2)
    assert w[(3, 2)] == (Fr(5, 63), 2)


def test_flux_sum_rules_exact():
    """Sum over modes of a_lm x^p |S rho^l T|^2 == the published total flux.

    Checked exactly at orders x, x^{3/2}, x^2 and x^{5/2}: the deepest
    cross-validation — it ties rho22 (through x^2), rho21/rho33/rho31
    (1PN), every tail factor and every Newtonian weight to the published
    1 - 1247/336 x + 4 pi x^{3/2} - 44711/9072 x^2 - 8191 pi/672 x^{5/2}.
    """
    w = newtonian_weights()
    total = {}
    for (l, m), (a, xpow) in w.items():
        if 2 * xpow > 5:
            continue
        src = source_even_series() if (l + m) % 2 == 0 else source_odd_series()
        eta = s_mul(s_pow(src, 2), s_pow(rho_series((l, m)), 2 * l))
        # |T_lm|^2 = 1 + 2 pi khat + O(khat^2), khat = m x^{3/2}
        eta = s_mul(eta, s_add(s_const(1), {3: {1: Fr(2 * m)}}))
        eta = s_mul(s_const(a), eta)
        shifted = {k + 2 * xpow: v for k, v in eta.items() if k + 2 * xpow <= 5}
        total = s_add(total, shifted)

    assert s_coeff(total, 0) == Fr(1)
    assert s_coeff(total, 2) == Fr(-1247, 336)
    assert s_coeff(total, 3, pi_power=1) == Fr(4)
    assert s_coeff(total, 4) == Fr(-44711, 9072)
    assert s_coeff(total, 5, pi_power=1) == Fr(-8191, 672)


# ---------------------------------------------------------------------------
# numerical end-to-end: the repo's own flux machinery against the PN series
# ---------------------------------------------------------------------------

_PN_SERIES = [
    (Fr(1), 0, 0),
    (Fr(-1247, 336), 2, 0),
    (Fr(4), 3, 1),
    (Fr(-44711, 9072), 4, 0),
    (Fr(-8191, 672), 5, 1),
]


def _pn_flux(x):
    return sum(float(c) * np.pi**pp * x ** (h / 2.0) for c, h, pp in _PN_SERIES)


def test_flux_from_modes_factorized_vs_pn_series():
    """flux_from_modes(tail+factorized) matches the PN flux at small x.

    Circular limit (e -> 0); residual must be O(x^3) (the first order not
    carried: eulerlog terms, l = 5/6 Newtonian weights) and the factorized
    flux must beat tail-only against the series.
    """
    from emri_frequencydomainwaveforms_tpu.models.flux import flux_from_modes

    table = default_mode_table(4)  # small n_max: circular needs n ~ 0 only
    for x in (0.02, 0.03):
        p = 1.0 / x
        e = jnp.asarray(1e-6)
        de_f, _ = flux_from_modes(jnp.asarray(p), e, table, tail=True, factorized=True)
        de_t, _ = flux_from_modes(jnp.asarray(p), e, table, tail=True, factorized=False)
        f_n = 32.0 / 5.0 * x**5
        model = float(-de_f) / f_n
        tail_only = float(-de_t) / f_n
        series = _pn_flux(x)
        # x^3 envelope: the first uncarried order — the full test-mass x^3
        # flux coefficient is ~150 (6643739519/69854400 + 16 pi^2/3 + log
        # terms) and the model carries only rho22's x^3 slice of it
        assert abs(model - series) < 250.0 * x**3 + 2e-5, (x, model, series)
        assert abs(model - series) < abs(tail_only - series), x


def test_factorized_correction_shape_and_limits():
    """Wiring: finite values, flat-space limit -> 1, clamp near plunge."""
    table = default_mode_table(6)
    p = jnp.asarray([500.0, 8.0, 6.5])
    e = jnp.asarray([0.3, 0.3, 0.2])
    from emri_frequencydomainwaveforms_tpu.models.geodesic import (
        fundamental_frequencies,
    )

    om_phi, om_r = fundamental_frequencies(p, e)
    m_f = jnp.asarray(table.ms.astype(np.float64))
    n_f = jnp.asarray(table.ns.astype(np.float64))
    om = m_f * om_phi[:, None] + n_f * om_r[:, None]
    c_re, c_im = rho_mod.factorized_correction(table.ls, table.ms, p, e, om)
    assert c_re.shape == (3, table.num_modes)
    assert bool(jnp.all(jnp.isfinite(c_re))) and bool(jnp.all(jnp.isfinite(c_im)))
    # flat-space limit: |corr| -> 1 at p = 500 (x ~ 2e-3 for the 22 mode)
    mag = jnp.sqrt(c_re**2 + c_im**2)
    i22 = int(np.where((table.ls == 2) & (table.ms == 2) & (table.ns == 0))[0][0])
    assert abs(float(mag[0, i22]) - 1.0) < 5e-3
    # strong field: still finite and positive
    assert float(mag[2, i22]) > 0.1


def test_mode_amplitudes_factorized_wiring():
    """factorized=True modifies amplitudes by the expected circular factor."""
    table = default_mode_table(2)
    p = jnp.asarray([12.0])
    e = jnp.asarray([1e-6])
    re0, im0 = mode_amplitudes(p, e, table)
    re1, im1 = mode_amplitudes(p, e, table, factorized=True)
    i22 = int(np.where((table.ls == 2) & (table.ms == 2) & (table.ns == 0))[0][0])
    a0 = complex(float(re0[0, i22]), float(im0[0, i22]))
    a1 = complex(float(re1[0, i22]), float(im1[0, i22]))
    x = 1.0 / 12.0
    rho = 1.0 + float(RHO_FR[(2, 2)][0]) * x + float(RHO_FR[(2, 2)][1]) * x * x
    # + x^3 eulerlog term from the module table
    elog = 0.5772156649015329 + np.log(2.0) + np.log(2.0) + 0.5 * np.log(x)
    rho += (rho_mod._RHO[(2, 2)][2] + rho_mod._RHO[(2, 2)][3] * elog) * x**3
    rho += (rho_mod._RHO[(2, 2)][4] + rho_mod._RHO[(2, 2)][5] * elog) * x**4
    rho += (rho_mod._RHO[(2, 2)][6] + rho_mod._RHO[(2, 2)][7] * elog) * x**5
    s_even = (1.0 - 2.0 * x) / np.sqrt(1.0 - 3.0 * x)
    expected_mag = s_even * rho * rho
    assert abs(abs(a1 / a0) - expected_mag) < 5e-5
    # phase = delta_22(x)
    d22 = 7.0 / 3.0 * x**1.5 + 428.0 / 105.0 * np.pi * x**3
    assert abs(np.angle(a1 / a0) - d22) < 1e-4


def test_trajectory_flux_factorized_runs():
    """flux='multipole_factorized' builds its grid and integrates."""
    from emri_frequencydomainwaveforms_tpu.models.inspiral import (
        schwarz_ecc_flux_inspiral,
    )

    traj = schwarz_ecc_flux_inspiral(
        1e6, 10.0, 10.0, 0.3, t_years=0.02, max_steps=128,
        flux="multipole_factorized",
    )
    n = int(traj.n)
    assert n > 4
    assert bool(jnp.all(jnp.isfinite(traj.p[:n])))
    # the factorized flux differs from tail-only (stronger dissipation
    # character changes the endpoint)
    traj_t = schwarz_ecc_flux_inspiral(
        1e6, 10.0, 10.0, 0.3, t_years=0.02, max_steps=128,
        flux="multipole_tail",
    )
    assert abs(float(traj.p[n - 1]) - float(traj_t.p[int(traj_t.n) - 1])) > 0


def test_generate_waveform_factorized_facade():
    """amplitude_kwargs={'tail': True, 'factorized': True} flows end-to-end."""
    from emri_frequencydomainwaveforms_tpu.models.waveform import (
        FastSchwarzschildEccentricFlux,
    )

    gen = FastSchwarzschildEccentricFlux(
        amplitude_kwargs={"tail": True, "factorized": True},
        sum_kwargs={"output_type": "fd"},
        n_max=4, l_max=2, k_max=8,
    )
    h = gen(1e6, 10.0, 10.0, 0.3, np.pi / 4, np.pi / 5, T=0.01, dt=50.0, eps=1e-2)
    assert np.all(np.isfinite(h.real)) and np.all(np.isfinite(h.imag))
    assert np.max(np.abs(h)) > 0
