"""Factorized-resummation amplitude corrections: source, rho_lm, delta_lm.

The remaining pieces of the factorized (EOB-style) waveform resummation
(Damour, Iyer & Nagar 2009) on top of the flat-space multipole amplitudes
of `models.amplitude` and the wave-tail factor of `models.tail`:

    h_lm = h_lm^(Newtonian, exact geodesic)  *  S_hat  *  T_lm
           *  rho_lm(x)^l  *  e^{i delta_lm(x)} ,

  * ``S_hat`` — the effective *source*: the exact geodesic specific energy
    E(p, e) for even-parity modes (l + m even) and the normalized angular
    momentum L(p, e)/sqrt(p) for odd-parity modes. Circular limits
    (1 - 2u)/sqrt(1 - 3u) and 1/sqrt(1 - 3u) with u = x.
  * ``rho_lm`` — the residual relativistic amplitude correction, a PN
    series in x = (M omega_mn / m)^(2/3), the mode's circular-equivalent
    frequency parameter (test-mass/nu = 0 coefficients: EMRI mass ratios
    are ~1e-5, so nu-corrections are far below the amplitude budget).
  * ``delta_lm`` — the residual phase after factoring T_lm (whose leading
    log-phase is a uniform time shift; delta carries the physical rest).

Together with T_lm this reproduces, mode by mode, the known test-mass PN
amplitude and flux series — genuinely relativistic content the flat-space
multipoles lack, anchored EXTERNALLY (published PN series), not against
the repo's own brute force. The validation mesh (tests/test_rho.py, exact
rational arithmetic) cross-checks three independently published series
families against each other through the factorization identities:

  * S_hat * rho_lm^l  ==  the 1PN mode-amplitude series h_lm
    (x-coefficients -107/42, -17/28, -4, -8/3, -593/110, -437/110,
    -39/11, -101/33, -263/39 for 22/21/33/31/44/42/43/41/55);
  * the flux composition Sum_lm a_lm x^(p_lm) |S rho^l T|^2 reproduces the
    test-mass GW flux 1 - 1247/336 x + 4 pi x^(3/2) - 44711/9072 x^2
    - 8191 pi/672 x^(5/2), with the Newtonian weights a_lm computed from
    this repo's own multipole constants (a_21 = 1/36, a_33 = 1215/896,
    a_31 = 1/8064, a_44 = 1280/567, a_42 = 5/3969, a_32 = 5/63).

Any single corrupted coefficient breaks these exact identities, so the
series data below is self-policing at the anchored orders.

Reference parity: the reference engine's Teukolsky amplitudes
(`RomanAmplitude`, reference Tutorial_FD_construction_single_mode.ipynb
cell 2) carry this content to all orders; the factorized resummation is
the controlled analytic approximation to it, exact through the anchored
PN orders and resummed (Gamma function tail, geodesic source) beyond.

Coefficient provenance: rho_lm / delta_lm test-mass series as tabulated
in the EOB literature (DIN 2009; Fujita & Iyer 2010 test-mass extensions).
x^1 coefficients of nine modes and the x^2/x^3 coefficients of (2,2) are
pinned by the exact cross-identities above; remaining higher-order
coefficients ((2,1)/(3,3)/(3,1)/(4,4) x^2, eulerlog x^3 terms) are
literature values exercised by tolerance (not identity) tests.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_GAMMA_E = 0.5772156649015329
_LN2 = float(np.log(2.0))

# x_lr-adjacent clamp: the rho series and the circular source factors are
# used inside their convergence region only; beyond x ~ 0.3 (light ring
# at 1/3) the trajectory has already plunged past the separatrix stop.
_X_MAX = 0.30

# (l, m) -> rho_lm series at nu = 0: (c1, c2, c3_const, c3_elog,
# c4_const, c4_elog, c5_const, c5_elog); eulerlog_m(x) = gamma_E + ln 2
# + ln m + ln(x)/2 multiplies the *_elog entries. Zeros mean "series not
# carried to that order" (truncation, not a physical zero).
_RHO = {
    (2, 2): (
        -43.0 / 42.0,
        -20555.0 / 10584.0,
        1556919113.0 / 122245200.0, -428.0 / 105.0,
        -387216563023.0 / 160190110080.0, 9202.0 / 2205.0,
        -16094530514677.0 / 533967033600.0, 439877.0 / 55566.0,
    ),
    (2, 1): (
        -59.0 / 56.0,
        -47009.0 / 56448.0,
        7613184941.0 / 2607897600.0, -107.0 / 105.0,
        0.0, 0.0, 0.0, 0.0,
    ),
    (3, 3): (
        -7.0 / 6.0,
        -6719.0 / 3960.0,
        3203101567.0 / 227026800.0, -26.0 / 7.0,
        0.0, 0.0, 0.0, 0.0,
    ),
    (3, 1): (
        -13.0 / 18.0,
        101.0 / 7128.0,
        11706720301.0 / 6129723600.0, -26.0 / 63.0,
        0.0, 0.0, 0.0, 0.0,
    ),
    (3, 2): (-164.0 / 135.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    (4, 4): (-269.0 / 220.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    (4, 2): (-191.0 / 220.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    (4, 3): (-111.0 / 88.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    (4, 1): (-301.0 / 264.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    (5, 5): (-487.0 / 390.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
}

# (l, m) -> delta_lm leading coefficients at nu = 0: (d32 * x^{3/2},
# d3 * pi * x^3). The x^3 pi terms mirror the eulerlog coefficients
# (428/105, 107/105, 26/7, 26/63 for 22/21/33/31).
_DELTA = {
    (2, 2): (7.0 / 3.0, 428.0 / 105.0),
    (2, 1): (2.0 / 3.0, 107.0 / 105.0),
    (3, 3): (13.0 / 10.0, 26.0 / 7.0),
    (3, 1): (13.0 / 30.0, 26.0 / 63.0),
    (4, 4): (14.0 / 15.0, 0.0),
    (4, 2): (7.0 / 15.0, 0.0),
}


def source_factors(p: jax.Array, e: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(S_even, S_odd) exact-geodesic effective sources, shape of ``p``.

    S_even = E(p, e) = sqrt((p-2-2e)(p-2+2e) / (p (p-3-e^2)))  -> E_circ
    S_odd  = L(p, e)/sqrt(p) = 1/sqrt(1 - (3+e^2)/p)           -> 1/sqrt(1-3u)

    Both -> 1 as p -> inf (the flat-space limit where the bare multipole
    amplitudes are exact). Valid above the separatrix p > 6 + 2e.
    """
    pm2 = p - 2.0
    denom = jnp.maximum(p - 3.0 - e * e, 1e-12)
    s_even = jnp.sqrt(jnp.maximum(pm2 * pm2 - 4.0 * e * e, 0.0) / (p * denom))
    s_odd = jnp.sqrt(p / denom)
    return s_even, s_odd


def _x_of_mode(omega_mn: jax.Array, ms: np.ndarray) -> jax.Array:
    """Circular-equivalent PN parameter x = (|omega|/max(m,1))^(2/3), clamped."""
    m_safe = np.maximum(np.abs(ms), 1).astype(np.float64)
    ratio = jnp.abs(omega_mn) / jnp.asarray(m_safe)
    return jnp.minimum(ratio ** (2.0 / 3.0), _X_MAX)


def rho_l_pow(ls: np.ndarray, ms: np.ndarray, x: jax.Array) -> jax.Array:
    """rho_lm(x)^l per mode; modes without tabulated series return 1.

    ``ls``/``ms``: static per-mode integers (..., n_modes broadcast on the
    last axis of ``x``).
    """
    n_modes = len(ls)
    coeffs = np.zeros((n_modes, 8))
    for i, (l, m) in enumerate(zip(ls, ms)):
        coeffs[i] = _RHO.get((int(l), int(abs(m))), (0.0,) * 8)
    c = jnp.asarray(coeffs)  # (M, 8)

    m_safe = np.maximum(np.abs(np.asarray(ms)), 1).astype(np.float64)
    elog_const = jnp.asarray(_GAMMA_E + _LN2 + np.log(m_safe))
    elog = elog_const + 0.5 * jnp.log(jnp.maximum(x, 1e-30))

    c3 = c[..., 2] + c[..., 3] * elog
    c4 = c[..., 4] + c[..., 5] * elog
    c5 = c[..., 6] + c[..., 7] * elog
    rho = 1.0 + x * (c[..., 0] + x * (c[..., 1] + x * (c3 + x * (c4 + x * c5))))

    r2 = rho * rho
    r3 = r2 * rho
    r4 = r2 * r2
    ls_j = jnp.asarray(np.asarray(ls))
    return jnp.where(
        ls_j == 2, r2,
        jnp.where(ls_j == 3, r3,
                  jnp.where(ls_j == 4, r4,
                            jnp.where(ls_j == 5, r4 * rho,
                                      jnp.where(ls_j == 6, r4 * r2,
                                                jnp.where(ls_j == 7, r4 * r3,
                                                          r4 * r4))))),
    )


def delta_lm(ls: np.ndarray, ms: np.ndarray, x: jax.Array) -> jax.Array:
    """Residual phase delta_lm(x) per mode (0 where not tabulated)."""
    n_modes = len(ls)
    d = np.zeros((n_modes, 2))
    for i, (l, m) in enumerate(zip(ls, ms)):
        d[i] = _DELTA.get((int(l), int(abs(m))), (0.0, 0.0))
    dj = jnp.asarray(d)
    x32 = x * jnp.sqrt(x)
    return dj[..., 0] * x32 + (np.pi * dj[..., 1]) * (x32 * x32)


def factorized_correction(
    table_ls: np.ndarray,
    table_ms: np.ndarray,
    p: jax.Array,
    e: jax.Array,
    omega_mn: jax.Array,
    *,
    include_delta: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Complex multiplier S_hat * rho^l * e^{i delta} per (..., mode).

    ``p``/``e``: orbit parameters (broadcast against the leading axes of
    ``omega_mn``); ``omega_mn``: per-mode frequencies M omega (any sign —
    rho/delta are even in omega, matching the stored m >= 0 half-plane
    whose -m partners follow from the equatorial conjugate symmetry).
    The phase is applied in the same (re, im) rotation convention as
    `models.tail.tail_factor` (both are outgoing-wave phase delays).
    """
    x = _x_of_mode(omega_mn, table_ms)
    s_even, s_odd = source_factors(p, e)
    parity_even = (np.asarray(table_ls) + np.abs(np.asarray(table_ms))) % 2 == 0
    src = jnp.where(
        jnp.asarray(parity_even), s_even[..., None], s_odd[..., None]
    )
    mag = src * rho_l_pow(table_ls, table_ms, x)
    if not include_delta:
        return mag, jnp.zeros_like(mag)
    # delta flips sign with the frequency branch like T's phase does
    dl = delta_lm(table_ls, table_ms, x) * jnp.sign(omega_mn)
    return mag * jnp.cos(dl), mag * jnp.sin(dl)


__all__ = [
    "source_factors",
    "rho_l_pow",
    "delta_lm",
    "factorized_correction",
]
