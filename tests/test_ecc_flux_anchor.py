"""External anchors for the ECCENTRIC flux content (round-4 VERDICT #2).

The circular limit of the physics ladder is pinned to published PN series
exactly (tests/test_rho.py, tests/test_rwz.py). These tests pin the
genuinely eccentric content through the small-e expansion at fixed
azimuthal frequency,

    F(v, e) / F(v, 0) = 1 + e^2 G(v) + O(e^4),
    G(v) = g0 + g2 v^2 + g3 v^3 + ...,   v = (M Omega_phi)^{1/3},

whose Newtonian coefficient is EXACT and convention-free:
g0 = 7/2 + 73/24 = 157/24 (Peters-Mathews re-expanded at fixed azimuthal
frequency — the (1-e^2)^{-7/2} frequency factor plus the PM enhancement).
The 1PN/1.5PN coefficients g2/g3 are convention-dependent (the Darwin e
at fixed Omega_phi used here differs at 1PN from the PN literature's
e_t / r0 parametrizations), so they are anchored by the INDEPENDENT
in-repo first-principles solver instead (tools/rwz/pn_ecc_flux.py, deep
run recorded in PARITY.md).

Tests here:
  * the production MODEL flux (flat multipoles on the exact geodesic)
    reproduces g0 = 157/24 to ~1e-5 (fast, pure functions);
  * the eccentric RWZ SOLVER reproduces g0 to <1e-2 via a 3-point
    v-extrapolation (slow-marked; the deep 7-point tool run reaches 8e-4).
"""

import numpy as np
import pytest

G0_EXACT = 157.0 / 24.0


def _p_at_fixed_omega_pkg(om_target: float, e: float) -> float:
    """Darwin p with Omega_phi(p, e) = om_target (package geodesic)."""
    import jax.numpy as jnp

    from emri_frequencydomainwaveforms_tpu.models.geodesic import (
        fundamental_frequencies,
    )

    p = om_target ** (-2.0 / 3.0)
    for _ in range(60):
        f0 = float(fundamental_frequencies(jnp.asarray(p), jnp.asarray(e))[0]) - om_target
        dp = max(1e-6 * p, 1e-9)
        d = (
            float(fundamental_frequencies(jnp.asarray(p + dp), jnp.asarray(e))[0])
            - float(fundamental_frequencies(jnp.asarray(p - dp), jnp.asarray(e))[0])
        ) / (2.0 * dp)
        step = f0 / d
        p -= step
        if abs(step) < 1e-13 * p:
            break
    return p


def _g_of_v_model(p_circ: float, es=(0.002, 0.02, 0.04)) -> float:
    """e^2 flux slope of the model multipoles, f64 projection (the
    production f32 path carries ~1e-7 amplitude noise — too loud for the
    1e-4-relative slope extraction at small e; the calibration tool's f64
    baseline is noise-free)."""
    import numpy as np

    from emri_frequencydomainwaveforms_tpu.models.amplitude import (
        default_mode_table,
    )
    from tools.rwz.calibrate_ecc import model_amplitudes_f64
    from tools.rwz.eccentric import darwin_orbit

    om = p_circ ** (-1.5)
    table = default_mode_table(6, l_max=2)
    tls, tms, tns = (np.asarray(x) for x in (table.ls, table.ms, table.ns))
    fs = []
    for e in es:
        p = _p_at_fixed_omega_pkg(om, e)
        orb = darwin_orbit(p, float(e), 512)
        a = model_amplitudes_f64(p, float(e), orb, table, tls, tms, tns)
        # (the tail/factorized corrections in the f64 baseline are
        # 1 + O(v^2) at fixed frequency and are removed by the caller's
        # Richardson step along with the l >= 3 content)
        om_all = tms * orb["Om_phi"] + tns * orb["Om_r"]
        fs.append(float(np.sum(om_all**2 * np.abs(a) ** 2) / (8 * np.pi)))
    e2 = np.asarray(es) ** 2
    a_fit = np.stack([np.ones_like(e2), e2, e2 * e2], axis=1)
    coef = np.linalg.solve(a_fit, np.asarray(fs))
    return coef[1] / coef[0]


def test_model_newtonian_e2_coefficient_is_157_over_24():
    """Fixed-frequency e^2 flux slope -> 157/24 as v -> 0 (the model's
    quadrupole harmonics are exact Darwin-orbit Fourier coefficients, so
    this is a direct Peters-Mathews re-expansion check; l >= 3 content
    enters at O(v^2) and is removed by 2-point Richardson in v^2)."""
    g1 = _g_of_v_model(1.0e4)
    g2 = _g_of_v_model(4.0e4)
    v1sq, v2sq = 1.0 / 1.0e4, 1.0 / 4.0e4
    g0 = (g1 * v2sq - g2 * v1sq) / (v2sq - v1sq)
    # residual budget: e^6-truncation of the quadratic e^2 fit at
    # e <= 0.04 contributes -2.6e-5 (analytically, from the exact
    # fixed-frequency PM expansion); v^3 leakage ~1e-5
    assert abs(g0 - G0_EXACT) < 1e-4, (g0, G0_EXACT)


class TestCorrectedFluxStrongField:
    """Round-4 VERDICT weak #6: pin the CORRECTED stack's flux against the
    solver. A PN-regime g2 of the corrected stack is ill-posed (the B/R
    calibration tables clamp at their strong-field grid edges), so the pin
    is at held-out residual-grid midpoints (tools/rwz/ecc_flux_check.py,
    run 2026-08-20): total flux over the calibrated mode set,

      (p, e)            F_solver        no-R/solver   with-R/solver
      ( 7.50, 0.244)    3.42602e-4      1.00496       1.00928
      (10.04, 0.411)    8.29434e-5      1.02154       1.00195
      (15.78, 0.578)    7.73327e-6      1.03286       0.99997

    The residual table closes the 2-3% eccentric flux gap to <=0.2% away
    from the separatrix; the innermost cell is limited by the residual
    table's u-resolution near the edge (0.9%, honest bound recorded in
    PARITY.md). The test recomputes the MODEL side (f64, seconds) and pins
    it against the recorded solver fluxes — solver re-solves are the
    tool's job, not CI's.
    """

    # (p, e, F_solver) from the recorded tool run
    POINTS = [
        (7.500673, 0.244444, 3.4260240176162084e-04, 1.5e-2),
        (10.036079, 0.411111, 8.294336830124971e-05, 5e-3),
        (15.779034, 0.577778, 7.733273957225663e-06, 1e-3),
    ]

    @pytest.mark.parametrize("p,e,f_solver,tol", POINTS)
    def test_corrected_flux_matches_solver(self, p, e, f_solver, tol):
        from tools.rwz.ecc_flux_check import _model_fluxes

        f_no, f_r = _model_fluxes(p, e)
        assert abs(f_r / f_solver - 1.0) < tol, (f_r / f_solver, tol)

    def test_residual_closes_the_gap_away_from_separatrix(self):
        # the two outer points: with-R must beat no-R by >= 5x
        from tools.rwz.ecc_flux_check import _model_fluxes

        for (p, e, f_solver, _tol) in self.POINTS[1:]:
            f_no, f_r = _model_fluxes(p, e)
            assert abs(f_r / f_solver - 1.0) < 0.2 * abs(f_no / f_solver - 1.0)


@pytest.mark.slow
def test_solver_newtonian_e2_coefficient():
    """The first-principles eccentric RWZ solver reproduces the exact
    Peters-Mathews e^2 coefficient at fixed azimuthal frequency — an
    external, convention-free anchor of the eccentric-source rung (the
    deep 7-point run in PARITY.md reaches 8e-4; this 3-point version
    carries an O(v^4)-truncation tolerance)."""
    from tools.rwz.pn_ecc_flux import g_of_v

    ps = [60.0, 120.0, 240.0]
    gs = [g_of_v(p, l_max=2, n_chi=256, verbose=False) for p in ps]
    v = np.asarray(ps) ** -0.5
    a = np.stack([np.ones_like(v), v**2, v**3], axis=1)
    coef = np.linalg.solve(a, np.asarray(gs))
    assert abs(coef[0] - G0_EXACT) < 2e-2, (coef[0], G0_EXACT)
