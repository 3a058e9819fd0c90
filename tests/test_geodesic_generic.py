"""Generic-inclination Kerr geodesics (round 4).

Validates `geodesic.fundamental_frequencies_kerr_generic` /
`separatrix_kerr_generic` (the `few.utils.utility` generic signature the
reference pins at FD notebook cell 1) against:

  * the equatorial Kerr path at x = +-1 (independent (E, L) solve);
  * the exact a = 0 identities (Ups_phi = sign(x) Ups_theta; Omega_r
    equal to the planar Schwarzschild value at the same (p, e));
  * a DIRECT Mino-time geodesic integration (scipy DOP853 on the
    second-order r/theta equations with event-detected turning points) —
    an entirely independent numeric.
"""

import numpy as np
import pytest

from emri_frequencydomainwaveforms_tpu.models.geodesic import (
    fundamental_frequencies,
    fundamental_frequencies_kerr,
    fundamental_frequencies_kerr_generic,
    kerr_gen_constants,
    separatrix_kerr,
    separatrix_kerr_generic,
)
from emri_frequencydomainwaveforms_tpu.models.utility import (
    get_fundamental_frequencies,
    get_separatrix,
)


class TestLimits:
    @pytest.mark.parametrize("a,p,e", [(0.5, 9.0, 0.3), (0.9, 7.0, 0.1)])
    @pytest.mark.parametrize("x", [1.0, -1.0])
    def test_equatorial_limit(self, a, p, e, x):
        op_g, ot_g, or_g = (
            np.asarray(v)
            for v in fundamental_frequencies_kerr_generic(a, p, e, x)
        )
        op, ot, orr = (
            np.asarray(v) for v in fundamental_frequencies_kerr(a, p, e, x)
        )
        np.testing.assert_allclose(op_g, op, rtol=1e-9)
        np.testing.assert_allclose(ot_g, ot, rtol=1e-9)
        np.testing.assert_allclose(or_g, orr, rtol=1e-9)

    @pytest.mark.parametrize("x", [0.3, -0.62, 0.9])
    def test_schwarzschild_inclined(self, x):
        p, e = 9.0, 0.25
        op, ot, orr = (
            np.asarray(v)
            for v in fundamental_frequencies_kerr_generic(0.0, p, e, x)
        )
        # a = 0: the orbital plane is fixed, so Ups_phi = sign(x) Ups_theta
        # exactly, and Omega_r equals the planar value at the same (p, e)
        np.testing.assert_allclose(op, np.sign(x) * ot, rtol=1e-12)
        op_pl, or_pl = (
            np.asarray(v) for v in fundamental_frequencies(p, e)
        )
        np.testing.assert_allclose(orr, or_pl, rtol=1e-9)
        np.testing.assert_allclose(ot, op_pl, rtol=1e-9)

    def test_constants_match_turning_points(self):
        # (E, Lz, Q) must zero the radial potential at r_p/r_a and the
        # polar potential at z_- = 1 - x^2
        a, p, e, x = 0.7, 8.0, 0.35, 0.55
        en, lz, q = (
            float(np.asarray(v)) for v in kerr_gen_constants(a, p, e, x)
        )

        def big_r(r):
            delta = r * r - 2.0 * r + a * a
            t = en * (r * r + a * a) - a * lz
            return t * t - delta * (r * r + (lz - a * en) ** 2 + q)

        r_p, r_a = p / (1 + e), p / (1 - e)
        scale = big_r(0.5 * (r_p + r_a))
        assert abs(big_r(r_p) / scale) < 1e-10
        assert abs(big_r(r_a) / scale) < 1e-10
        z_m = 1.0 - x * x
        theta_pot = q - lz * lz * z_m / (1.0 - z_m) - a * a * (1 - en * en) * z_m
        assert abs(theta_pot) < 1e-10 * max(q, 1.0)


class TestAgainstDirectIntegration:
    @pytest.mark.parametrize(
        "a,p,e,x",
        [(0.7, 8.0, 0.35, 0.55), (0.9, 11.0, 0.2, -0.4), (0.3, 10.0, 0.5, 0.8)],
    )
    def test_frequencies_vs_mino_integration(self, a, p, e, x):
        from scipy.integrate import solve_ivp

        en, lz, q = (
            float(np.asarray(v)) for v in kerr_gen_constants(a, p, e, x)
        )

        def rhs(lam, y):
            r, pr, th, pth, _, _ = y
            # pr = dr/dlam, pth = dtheta/dlam; second-order forms
            # d2r/dlam2 = R'(r)/2, d2th/dlam2 = Theta'(th)/2
            delta = r * r - 2.0 * r + a * a
            t = en * (r * r + a * a) - a * lz
            dT = 2.0 * en * r
            ddelta = 2.0 * r - 2.0
            k = r * r + (lz - a * en) ** 2 + q
            d_big_r = 2.0 * t * dT - ddelta * k - delta * 2.0 * r
            ct, st = np.cos(th), np.sin(th)
            # Theta(th) = q - lz^2 ct^2/st^2 - a^2(1-en^2) ct^2
            d_theta_pot = 2.0 * lz * lz * ct / st**3 + 2.0 * a * a * (
                1 - en * en
            ) * ct * st
            dt_dlam = (r * r + a * a) / delta * t + a * lz - a * a * en \
                + a * a * en * ct * ct
            dphi_dlam = a / delta * t - a * en + lz / (st * st)
            return [pr, 0.5 * d_big_r, pth, 0.5 * d_theta_pot,
                    dt_dlam, dphi_dlam]

        r_p = p / (1 + e)
        th_min = np.arccos(np.sqrt(1.0 - x * x)) if abs(x) < 1 else np.pi / 2
        y0 = [r_p, 0.0, th_min, 0.0, 0.0, 0.0]

        # periapsis-passage events (dr/dlam upward zero crossing)
        def peri(lam, y):
            return y[1]

        peri.direction = 1.0

        n_orbits = 80
        om_phi, om_th, om_r = (
            float(np.asarray(v))
            for v in fundamental_frequencies_kerr_generic(a, p, e, x)
        )
        # Mino-time radial period estimate for the integration span
        gamma_est = 1.0  # dt/dlam ~ r^2; only used to bound lam_end
        lam_end = n_orbits * 2 * np.pi / max(om_r * p * p * gamma_est, 1e-9)
        sol = solve_ivp(
            rhs, (0.0, lam_end), y0, method="DOP853", rtol=1e-11,
            atol=1e-12, events=peri, dense_output=True,
        )
        ev = sol.t_events[0]
        assert len(ev) > 10, "integration produced too few radial periods"
        lam_r = np.diff(ev).mean()
        # secular rates by linear regression over the periapsis events
        # (the bounded theta-phase oscillation averages out)
        ts = np.array([sol.sol(l)[4] for l in ev])
        phis = np.array([sol.sol(l)[5] for l in ev])
        k = np.arange(len(ev))
        gamma = np.polyfit(ev, ts, 1)[0]
        ups_phi = np.polyfit(ev, phis, 1)[0]

        om_r_direct = (2 * np.pi / lam_r) / gamma
        om_phi_direct = ups_phi / gamma
        np.testing.assert_allclose(om_r, om_r_direct, rtol=3e-5)
        np.testing.assert_allclose(om_phi, om_phi_direct, rtol=3e-5)

        # theta period from theta-turning events on the same solution
        th_vals = np.array([sol.sol(l)[2] for l in np.linspace(0, ev[-1], 40000)])
        # count polar oscillations: crossings of theta through pi/2
        cross = np.where(np.diff(np.sign(th_vals - np.pi / 2)) != 0)[0]
        n_half = len(cross)  # half-oscillations of theta
        lam_th = 2.0 * ev[-1] / max(n_half, 1)
        om_th_direct = (2 * np.pi / lam_th) / gamma
        # counting-based period: resolution limited by the sampling grid
        np.testing.assert_allclose(om_th, om_th_direct, rtol=2e-3)


class TestSeparatrixGeneric:
    def test_matches_equatorial(self):
        a, e = 0.6, 0.3
        ps_eq = float(np.asarray(separatrix_kerr(a, e, 1.0)))
        ps_gen = float(np.asarray(separatrix_kerr_generic(a, e, 0.9999999)))
        np.testing.assert_allclose(ps_gen, ps_eq, atol=2e-4)

    def test_monotone_in_inclination(self):
        # prograde orbits are stable closer in: p_s grows as x drops
        a, e = 0.7, 0.2
        ps = [
            float(np.asarray(separatrix_kerr_generic(a, e, x)))
            for x in (0.95, 0.5, 0.1, -0.5, -0.95)
        ]
        assert all(ps[i] < ps[i + 1] for i in range(len(ps) - 1)), ps

    def test_facade_routes_generic(self):
        om = get_fundamental_frequencies(0.5, 9.0, 0.3, 0.7)
        assert all(np.isfinite(np.asarray(v)).all() for v in om)
        ps = get_separatrix(0.5, 0.3, 0.7)
        assert 4.0 < float(ps) < 9.0
