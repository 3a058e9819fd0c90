"""Trajectory-layer tests: geodesics, fluxes, adaptive integration."""

import numpy as np
import scipy.special
import jax
import jax.numpy as jnp

from emri_frequencydomainwaveforms_tpu.models.geodesic import (
    darwin_orbit,
    energy_angmom,
    fundamental_frequencies,
    fundamental_frequencies_kerr,
    kerr_eq_energy_angmom,
    separatrix,
    separatrix_kerr,
)
from emri_frequencydomainwaveforms_tpu.models.flux import pdot_edot
from emri_frequencydomainwaveforms_tpu.models.inspiral import (
    EMRIInspiral,
    get_p_at_t,
    inspiral_duration,
    schwarz_ecc_flux_inspiral,
)
from emri_frequencydomainwaveforms_tpu.utils.constants import MTSUN_SI, YRSID_SI


class TestGeodesic:
    def test_circular_limit_frequencies(self):
        # e=0: Omega_phi = 1/p^{3/2} (Schwarzschild circular), and
        # Omega_r^2 = (p-6)/p^4 (radial epicyclic frequency).
        for p in [8.0, 10.0, 20.0, 50.0]:
            om_phi, om_r = fundamental_frequencies(jnp.array(p), jnp.array(1e-12))
            np.testing.assert_allclose(float(om_phi), p**-1.5, rtol=1e-10)
            np.testing.assert_allclose(float(om_r), np.sqrt((p - 6.0) / p**4), rtol=1e-8)

    def test_periapsis_advance_closed_form(self):
        # Dphi = 4 sqrt(p/(p-6+2e)) K(m), m = 4e/(p-6+2e)  (Darwin/CKP)
        for p, e in [(10.0, 0.3), (8.0, 0.5), (7.2, 0.4), (12.0, 0.7)]:
            orbit = darwin_orbit(jnp.array(p), jnp.array(e))
            m = 4 * e / (p - 6 + 2 * e)
            expect = 4 * np.sqrt(p / (p - 6 + 2 * e)) * scipy.special.ellipk(m)
            np.testing.assert_allclose(float(orbit["Dphi"]), expect, rtol=1e-9)

    def test_energy_angmom_newtonian_limit(self):
        # large p: E -> 1 - (1-e^2)/(2p), L -> sqrt(p)
        p, e = 1e4, 0.3
        energy, angmom = energy_angmom(jnp.array(p), jnp.array(e))
        np.testing.assert_allclose(float(energy), 1 - (1 - e**2) / (2 * p), rtol=1e-6)
        np.testing.assert_allclose(float(angmom), np.sqrt(p), rtol=1e-3)

    def test_orbit_time_consistency(self):
        # t(chi=2pi grid end) + last step ~ T_r; r range = [p/(1+e), p/(1-e)]
        p, e = 9.0, 0.45
        orbit = darwin_orbit(jnp.array(p), jnp.array(e))
        r = np.asarray(orbit["r"])
        np.testing.assert_allclose(r.min(), p / (1 + e), rtol=1e-12)
        assert r.max() <= p / (1 - e) + 1e-9
        t = np.asarray(orbit["t"])
        assert np.all(np.diff(t) > 0)


class TestKerrGeodesic:
    """Equatorial Kerr (a != 0) against independent closed forms."""

    def test_schwarzschild_limit(self):
        p, e = 9.3, 0.41
        op, ot, orr = fundamental_frequencies_kerr(0.0, p, e)
        op0, or0 = fundamental_frequencies(jnp.asarray(p), jnp.asarray(e))
        np.testing.assert_allclose(float(op), float(op0), rtol=1e-13)
        np.testing.assert_allclose(float(orr), float(or0), rtol=1e-13)
        # a = 0: theta and phi frequencies degenerate
        np.testing.assert_allclose(float(ot), float(op), rtol=1e-13)

    def test_circular_kerr_closed_forms(self):
        # Omega_phi = 1/(r^{3/2} + a); epicyclic frequencies
        # Omega_r^2 = Omega_phi^2 (1 - 6/r + 8a r^{-3/2} - 3a^2/r^2),
        # Omega_th^2 = Omega_phi^2 (1 - 4a r^{-3/2} + 3a^2/r^2)
        for a in (0.3, 0.7, 0.95):
            r = 8.0
            op, ot, orr = fundamental_frequencies_kerr(a, r, 1e-10)
            om = 1.0 / (r**1.5 + a)
            np.testing.assert_allclose(float(op), om, rtol=1e-9)
            np.testing.assert_allclose(
                float(ot), om * np.sqrt(1 - 4 * a / r**1.5 + 3 * a**2 / r**2), rtol=1e-8
            )
            np.testing.assert_allclose(
                float(orr),
                om * np.sqrt(1 - 6 / r + 8 * a / r**1.5 - 3 * a**2 / r**2),
                rtol=1e-7,
            )

    def test_retrograde(self):
        a, r = 0.5, 9.0
        op, _, _ = fundamental_frequencies_kerr(a, r, 1e-10, x=-1.0)
        np.testing.assert_allclose(float(op), -1.0 / (r**1.5 - a), rtol=1e-9)

    def test_isco_bardeen(self):
        # separatrix at e -> 0 must match the Bardeen-Press-Teukolsky ISCO
        for a, x in ((0.5, 1.0), (0.9, 1.0), (0.7, -1.0)):
            z1 = 1 + (1 - a * a) ** (1 / 3) * ((1 + a) ** (1 / 3) + (1 - a) ** (1 / 3))
            z2 = np.sqrt(3 * a * a + z1 * z1)
            sgn = 1.0 if x > 0 else -1.0
            risco = 3 + z2 - sgn * np.sqrt((3 - z1) * (3 + z1 + 2 * z2))
            ps = float(separatrix_kerr(a, 1e-8, x=x))
            np.testing.assert_allclose(ps, risco, rtol=1e-6)

    def test_separatrix_schwarzschild_limit(self):
        for e in (0.0, 0.3, 0.7):
            np.testing.assert_allclose(
                float(separatrix_kerr(0.0, e)), 6.0 + 2.0 * e, atol=1e-10
            )

    def test_energy_angmom_match_schwarzschild(self):
        p, e = 10.0, 0.3
        ek, lk = kerr_eq_energy_angmom(0.0, p, e)
        es, ls = energy_angmom(jnp.asarray(p), jnp.asarray(e))
        np.testing.assert_allclose(float(ek), float(es), rtol=1e-12)
        np.testing.assert_allclose(float(lk), float(ls), rtol=1e-12)

    def test_utility_facade_kerr(self):
        from emri_frequencydomainwaveforms_tpu.models.utility import (
            get_fundamental_frequencies,
            get_separatrix,
        )

        op, ot, orr = get_fundamental_frequencies(0.6, 7.0, 0.2, 1.0)
        assert np.isfinite([op, ot, orr]).all() and op > 0 and orr > 0
        ps = get_separatrix(0.6, 0.2, 1.0)
        assert 2.0 < float(ps) < 6.0  # prograde spin lowers the separatrix


class TestFlux:
    def test_peters_newtonian_limit(self):
        # large p: pdot -> -(64/5) p^-3 (1-e^2)^{3/2} (1 + 7/8 e^2 ...)
        p, e = 1e3, 0.2
        pdot, edot = pdot_edot(jnp.array(p), jnp.array(e))
        expect_pdot = -(64.0 / 5.0) * p**-3 * (1 - e**2) ** 1.5 * (1 + 7 / 8 * e**2)
        np.testing.assert_allclose(float(pdot), expect_pdot, rtol=2e-2)
        assert float(edot) < 0  # eccentricity decays

    def test_inspiral_sign(self):
        pdot, edot = pdot_edot(jnp.array(8.0), jnp.array(0.4))
        assert float(pdot) < 0 and float(edot) < 0


class TestInspiral:
    def test_basic_trajectory(self):
        traj = schwarz_ecc_flux_inspiral(1e6, 10.0, 12.0, 0.35, t_years=1.0)
        n = int(traj.n)
        assert 20 < n <= 512
        t = np.asarray(traj.t)
        assert np.all(np.diff(t) > 0)  # strictly increasing incl. padding
        p = np.asarray(traj.p[:n])
        e = np.asarray(traj.e[:n])
        assert np.all(np.diff(p) < 0)
        assert p[-1] > float(separatrix(traj.e[n - 1]))
        # ends at the 1-year horizon for this configuration
        np.testing.assert_allclose(t[n - 1], YRSID_SI, rtol=1e-9)
        # phases are large and increasing
        phi = np.asarray(traj.Phi_phi[:n])
        assert phi[-1] > 1e5 and np.all(np.diff(phi) > 0)

    def test_plunging_trajectory_stops(self):
        # heavy secondary -> fast inspiral -> separatrix inside 1 yr
        traj = schwarz_ecc_flux_inspiral(1e6, 300.0, 9.0, 0.4, t_years=4.0)
        n = int(traj.n)
        p_end, e_end = float(traj.p[n - 1]), float(traj.e[n - 1])
        assert p_end < 9.0
        assert p_end - float(separatrix(jnp.array(e_end))) < 0.2
        assert float(traj.t[n - 1]) < 4.0 * YRSID_SI

    def test_reference_tuple_api(self):
        traj = EMRIInspiral(func="SchwarzEccFlux")
        t, p, e, x, phi_phi, phi_theta, phi_r = traj(1e6, 10.0, 0.0, 12.0, 0.35, 1.0, T=0.1)
        assert t.shape == p.shape == phi_phi.shape
        assert float(x[0]) == 1.0 and float(phi_theta[-1]) == 0.0

    def test_get_p_at_t(self):
        m, mu, e0 = 1e6, 10.0, 0.35
        t_out = 0.99 * 1.5
        p0 = get_p_at_t(m, mu, e0, t_out)
        dur = inspiral_duration(m, mu, p0, e0)
        np.testing.assert_allclose(float(dur) / YRSID_SI, t_out, rtol=1e-4)

    def test_vmapped_trajectories(self):
        p0s = jnp.array([10.0, 11.0, 12.0, 13.0])
        f = jax.vmap(lambda p0: schwarz_ecc_flux_inspiral(1e6, 20.0, p0, 0.3, t_years=0.5))
        trajs = f(p0s)
        assert trajs.t.shape == (4, 512)
        assert np.isfinite(np.asarray(trajs.p)).all()


class TestMultipoleFlux:
    """l <= 4 mode-sum flux (models.flux.flux_from_modes + grid backend)."""

    def test_peters_mathews_limit(self):
        # weak field: the l=2 mode-sum flux must reduce to the closed-form
        # Peters-Mathews enhancement functions to O(1/p)
        from emri_frequencydomainwaveforms_tpu.models.flux import (
            flux_from_modes,
            pn_flux_e_l,
        )
        from emri_frequencydomainwaveforms_tpu.models.amplitude import (
            default_mode_table,
        )

        t22 = default_mode_table(40, l_max=2)
        for p, e in [(500.0, 0.4), (1000.0, 0.1)]:
            de_m, dl_m = flux_from_modes(jnp.asarray(p), jnp.asarray(e), t22)
            de_pm, dl_pm = pn_flux_e_l(jnp.asarray(p), jnp.asarray(e))
            assert abs(float(de_m / de_pm) - 1.0) < 20.0 / p
            assert abs(float(dl_m / dl_pm) - 1.0) < 20.0 / p

    def test_grid_interpolant_matches_direct(self):
        from emri_frequencydomainwaveforms_tpu.models.flux import (
            build_flux_grid,
            flux_from_modes,
            multipole_flux_e_l,
        )

        grid = build_flux_grid(n_u=48, n_e=25)
        for p, e in [(8.0, 0.2), (10.0, 0.45), (14.0, 0.1)]:
            de_g, dl_g = multipole_flux_e_l(jnp.asarray(p), jnp.asarray(e), grid)
            de_d, dl_d = flux_from_modes(jnp.asarray(p), jnp.asarray(e))
            assert abs(float(de_g / de_d) - 1.0) < 2e-3
            assert abs(float(dl_g / dl_d) - 1.0) < 2e-3

    def test_multipole_trajectory_dissipates_faster(self):
        # higher multipoles add dissipation channels: the multipole-flux
        # inspiral must reach plunge sooner than Peters-Mathews
        from emri_frequencydomainwaveforms_tpu.models.inspiral import (
            schwarz_ecc_flux_inspiral,
        )

        kw = dict(t_years=2.0, max_steps=192)
        tr_pm = schwarz_ecc_flux_inspiral(1e6, 50.0, 8.0, 0.3, **kw)
        tr_mp = schwarz_ecc_flux_inspiral(1e6, 50.0, 8.0, 0.3, flux="multipole", **kw)
        t_end_pm = float(tr_pm.t[int(tr_pm.n) - 1])
        t_end_mp = float(tr_mp.t[int(tr_mp.n) - 1])
        assert np.isfinite(t_end_mp) and t_end_mp > 0
        assert t_end_mp < t_end_pm  # plunges earlier
        assert t_end_mp > 0.5 * t_end_pm  # but the same order of magnitude


class TestQuadTrajectory:
    """Parallel-in-time quadrature trajectory vs the DP5 reference path
    (`models.trajectory_quad`, reference contract: `EMRIInspiral` at
    reference emri_pe.py:620)."""

    CASES = [
        (1e6, 50.0, 12.0, 0.4, 0.1),   # horizon-capped
        (1e6, 50.0, 7.8, 0.3, 1.0),    # fast plunge
        (1e5, 10.0, 10.0, 0.5, 0.5),   # light + eccentric
    ]

    def test_matches_dp5(self):
        from scipy.interpolate import CubicSpline

        from emri_frequencydomainwaveforms_tpu.models.inspiral import (
            schwarz_ecc_flux_inspiral,
        )

        for M, mu, p0, e0, T in self.CASES:
            ref = schwarz_ecc_flux_inspiral(
                M, mu, p0, e0, t_years=T, max_steps=384, rtol=1e-11
            )
            q = schwarz_ecc_flux_inspiral(
                M, mu, p0, e0, t_years=T, max_steps=192, method="quad"
            )
            n = int(ref.n)
            tr = np.asarray(ref.t)[:n]
            tq = np.asarray(q.t)
            # end times agree to ~1e-5 relative
            assert abs(tq[-1] / tr[-1] - 1.0) < 1e-5
            m = tr <= tq[-1]
            # phase tolerance 2e-3 rad sits well under the FD kernel's own
            # f32 phase-noise floor (~1e-2 rad, the 6.7e-5 mismatch budget)
            for ref_arr, q_arr, tol in (
                (ref.p, q.p, 5e-5),
                (ref.e, q.e, 5e-5),
                (ref.Phi_phi, q.Phi_phi, 2e-3),
                (ref.Phi_r, q.Phi_r, 2e-3),
            ):
                qi = CubicSpline(tq, np.asarray(q_arr))(tr[m])
                err = np.max(np.abs(qi - np.asarray(ref_arr)[:n][m]))
                assert err < tol, (M, mu, p0, e0, T, err, tol)

    def test_phase_offsets_and_monotone_time(self):
        from emri_frequencydomainwaveforms_tpu.models.inspiral import (
            schwarz_ecc_flux_inspiral,
        )

        q0 = schwarz_ecc_flux_inspiral(
            1e6, 50.0, 12.0, 0.4, t_years=0.1, max_steps=96, method="quad"
        )
        q1 = schwarz_ecc_flux_inspiral(
            1e6, 50.0, 12.0, 0.4, t_years=0.1, max_steps=96, method="quad",
            Phi_phi0=1.0, Phi_r0=2.0,
        )
        np.testing.assert_allclose(
            np.asarray(q1.Phi_phi) - np.asarray(q0.Phi_phi), 1.0, rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(q1.Phi_r) - np.asarray(q0.Phi_r), 2.0, rtol=1e-12
        )
        t = np.asarray(q0.t)
        assert (np.diff(t) > 0).all()
        assert int(q0.n) == 96  # all knots live

    def test_vmappable(self):
        import jax

        from emri_frequencydomainwaveforms_tpu.models.inspiral import (
            schwarz_ecc_flux_inspiral,
        )

        p0s = jnp.asarray([11.8, 12.0, 12.2])
        e0s = jnp.asarray([0.38, 0.40, 0.42])
        out = jax.vmap(
            lambda p, e: schwarz_ecc_flux_inspiral(
                1e6, 50.0, p, e, t_years=0.1, max_steps=96, method="quad"
            ).Phi_phi
        )(p0s, e0s)
        assert out.shape == (3, 96)
        assert np.isfinite(np.asarray(out)).all()

    def test_waveform_through_quad_trajectory(self):
        """FD waveform with traj_method='quad' matches the dp5 waveform.

        The mode set is pinned to the dp5 prologue's own eps selection: two
        candidate modes sit within ~3% of each other in integrated power at
        this config, so unpinned top-K selection can flip membership between
        trajectory backends (a selection knife-edge, not a trajectory
        error). With the set pinned, the backends agree to ~1e-4 rel-L2.
        """
        from emri_frequencydomainwaveforms_tpu.models.amplitude import (
            default_mode_table,
        )
        from emri_frequencydomainwaveforms_tpu.models.waveform import (
            default_frequencies,
            fd_waveform_core,
            waveform_prologue,
        )

        table = default_mode_table(8, l_max=2)
        freq = default_frequencies(0.1, 10.0)
        f_np = freq[freq > 0]
        uni = (float(f_np[0]), float(f_np[1] - f_np[0]))
        params = (1e6, 50.0, 12.0, 0.4, 0.7, 0.5, 1.0, 0.0, 0.0)
        ref_sel = waveform_prologue(
            *params, t_years=0.1, table=table, k_max=8, eps=1e-2,
            max_steps=256,
        ).sel
        forced = np.asarray(ref_sel.idx)
        outs = {}
        for method, msteps in (("dp5", 256), ("quad", 128)):
            # dp5 needs the bigger knot budget to actually reach the
            # horizon at rtol 1e-11 (it silently stops at count ==
            # max_steps); quad always spans [0, t_end] by construction
            pro = waveform_prologue(
                *params, t_years=0.1, table=table, k_max=8, eps=1e-2,
                forced_idx=forced, max_steps=msteps, traj_method=method,
            )
            outs[method] = fd_waveform_core(
                pro, table, jnp.asarray(f_np), channels=True, uniform=uni
            )
        for a, b in zip(outs["dp5"], outs["quad"]):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.sqrt(np.mean(a**2)) + 1e-300
            assert np.sqrt(np.mean((a - b) ** 2)) / scale < 1e-3
