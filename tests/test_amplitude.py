"""Amplitude + Ylm convention tests.

The load-bearing test reconstructs h(t) = h_+ - i h_x from the
(A_lmn, -2Y_lm, e^{-i(m Phi_phi + n Phi_r)}) decomposition and checks it
against an independent brute-force TT-projected quadrupole waveform computed
by finite differences along the exact geodesic — pinning every sign,
normalization and phase convention at once.
"""

import numpy as np
import jax.numpy as jnp

from emri_frequencydomainwaveforms_tpu.models.amplitude import (
    ModeTable,
    default_mode_table,
    mode_amplitudes,
)
from emri_frequencydomainwaveforms_tpu.models.geodesic import (
    darwin_orbit,
    fundamental_frequencies,
)
from emri_frequencydomainwaveforms_tpu.utils.ylm import GetYlms, spin_weighted_ylm


class TestYlm:
    def test_known_closed_forms(self):
        th, ph = 0.7, 1.3
        re, im = spin_weighted_ylm([2, 2, 2], [2, 0, -2], th, ph)
        y = np.asarray(re) + 1j * np.asarray(im)
        y22 = np.sqrt(5 / (64 * np.pi)) * (1 + np.cos(th)) ** 2 * np.exp(2j * ph)
        y20 = np.sqrt(15 / (32 * np.pi)) * np.sin(th) ** 2
        y2m2 = np.sqrt(5 / (64 * np.pi)) * (1 - np.cos(th)) ** 2 * np.exp(-2j * ph)
        np.testing.assert_allclose(y, [y22, y20, y2m2], rtol=1e-12)

    def test_orthonormality(self):
        # int |sYlm|^2 = 1 over the sphere (quadrature check incl. l=3,4)
        nth, nph = 400, 80
        th = (np.arange(nth) + 0.5) * np.pi / nth
        ph = np.arange(nph) * 2 * np.pi / nph
        TH, PH = np.meshgrid(th, ph, indexing="ij")
        for l, m in [(2, 2), (2, 1), (3, 2), (4, 3), (3, -3)]:
            re, im = spin_weighted_ylm([l], [m], jnp.asarray(TH.ravel()), jnp.asarray(PH.ravel()))
            mag2 = (np.asarray(re[..., 0]) ** 2 + np.asarray(im[..., 0]) ** 2).reshape(nth, nph)
            integral = np.sum(mag2 * np.sin(TH)) * (np.pi / nth) * (2 * np.pi / nph)
            np.testing.assert_allclose(integral, 1.0, rtol=1e-5)

    def test_reference_facade(self):
        gen = GetYlms(assume_positive_m=True)
        out = gen(np.array([2]), np.array([2]), 0.5, 0.4)
        assert out.shape == (2,)  # (2,2) and (2,-2)
        direct = GetYlms()(np.array([2, 2]), np.array([2, -2]), 0.5, 0.4)
        np.testing.assert_allclose(out, direct, rtol=1e-13)


def _reconstruct_h(p, e, theta, phi, t_grid, n_max=30, table=None):
    """h from the A_lmn Ylm e^{-i(m Phiphi + n Phir)} mode decomposition."""
    om_phi, om_r = fundamental_frequencies(jnp.asarray(p), jnp.asarray(e))
    om_phi, om_r = float(om_phi), float(om_r)
    if table is None:
        table = default_mode_table(n_max)
    a_re, a_im = mode_amplitudes(jnp.asarray(p), jnp.asarray(e), table)
    amps = np.asarray(a_re) + 1j * np.asarray(a_im)

    h = np.zeros_like(t_grid, dtype=complex)
    for i, (l, m, n) in enumerate(zip(table.ls, table.ms, table.ns)):
        ylm = GetYlms()(np.array([l, l]), np.array([m, -m]), theta, phi)
        phase = (m * om_phi + n * om_r) * t_grid
        sigma = (-1.0) ** l  # planar symmetry (holds for all families)
        h += amps[i] * ylm[0] * np.exp(-1j * phase)
        if m > 0:  # equatorial-symmetry partner (l,-m,-n)
            h += sigma * np.conj(amps[i]) * ylm[1] * np.exp(1j * phase)
        elif m == 0:  # m=0 partner is (l,0,-n) = sigma conj(A_{l,0,n})
            h += sigma * np.conj(amps[i]) * ylm[0] * np.exp(1j * phase)
    return h


from tests.helpers_thorne import thorne_h  # noqa: E402


def _family_table(pairs, n_max=20):
    ls, ms, ns = [], [], []
    for (l, m) in pairs:
        rng = range(1, n_max + 1) if m == 0 else range(-n_max, n_max + 1)
        for n in rng:
            ls.append(l)
            ms.append(m)
            ns.append(n)
    return ModeTable(np.array(ls), np.array(ms), np.array(ns))


class TestMultipoleAmplitudes:
    """Mode decomposition vs the independent Thorne-4.8 brute force.

    Ground truth (tests/helpers_thorne.py) assembles the TT waveform from
    STF moments of the exact geodesic, sharing only the orbit with the
    production amplitude code — every constant, sign, and partner
    convention of every (l, m) family is pinned at once.
    """

    P, E = 10.0, 0.3

    def _grid(self):
        orbit = darwin_orbit(jnp.asarray(self.P), jnp.asarray(self.E))
        t_r = float(orbit["T_r"])
        return np.linspace(0.13 * t_r, 2.6 * t_r, 40)

    def test_quadrupole_family(self):
        t_grid = self._grid()
        table = default_mode_table(30, l_max=2)
        # l_max=2 table includes (2,1): compare against T1 + T3
        for theta, phi in [(0.8, 0.3), (2.2, 4.0), (1.5707, 1.0)]:
            h_modes = _reconstruct_h(self.P, self.E, theta, phi, t_grid, table=table)
            h_direct = thorne_h(self.P, self.E, theta, phi, t_grid, terms=("T1", "T3"))
            scale = np.max(np.abs(h_direct))
            # 2e-4: f32 amplitude pipeline noise floor over ~150 modes; a
            # convention error (sign/normalization/phase) would be O(1)
            np.testing.assert_allclose(h_modes / scale, h_direct / scale, atol=2e-4)

    def test_full_l4_inventory(self):
        t_grid = self._grid()
        table = default_mode_table(30, l_max=4)
        for theta, phi in [(0.8, 0.3), (1.9, 2.2)]:
            h_modes = _reconstruct_h(self.P, self.E, theta, phi, t_grid, table=table)
            h_direct = thorne_h(self.P, self.E, theta, phi, t_grid)
            scale = np.max(np.abs(h_direct))
            np.testing.assert_allclose(h_modes / scale, h_direct / scale, atol=3e-4)

    def test_octupole_family(self):
        t_grid = self._grid()
        table = _family_table([(3, 3), (3, 1)])
        h_modes = _reconstruct_h(self.P, self.E, 0.9, 1.1, t_grid, table=table)
        h_direct = thorne_h(self.P, self.E, 0.9, 1.1, t_grid, terms=("T2",))
        scale = np.max(np.abs(h_direct))
        np.testing.assert_allclose(h_modes / scale, h_direct / scale, atol=2e-4)

    def test_current_quadrupole_family(self):
        t_grid = self._grid()
        table = _family_table([(2, 1)])
        h_modes = _reconstruct_h(self.P, self.E, 0.7, 0.4, t_grid, table=table)
        h_direct = thorne_h(self.P, self.E, 0.7, 0.4, t_grid, terms=("T3",))
        scale = np.max(np.abs(h_direct))
        np.testing.assert_allclose(h_modes / scale, h_direct / scale, atol=2e-4)

    def test_hexadecapole_family(self):
        t_grid = self._grid()
        table = _family_table([(4, 4), (4, 2), (4, 0)])
        h_modes = _reconstruct_h(self.P, self.E, 1.2, 2.5, t_grid, table=table)
        h_direct = thorne_h(self.P, self.E, 1.2, 2.5, t_grid, terms=("T4",))
        scale = np.max(np.abs(h_direct))
        np.testing.assert_allclose(h_modes / scale, h_direct / scale, atol=2e-4)

    def test_current_octupole_family(self):
        t_grid = self._grid()
        table = _family_table([(3, 2), (3, 0)])
        h_modes = _reconstruct_h(self.P, self.E, 2.0, 3.3, t_grid, table=table)
        h_direct = thorne_h(self.P, self.E, 2.0, 3.3, t_grid, terms=("T5",))
        scale = np.max(np.abs(h_direct))
        np.testing.assert_allclose(h_modes / scale, h_direct / scale, atol=2e-4)


    def test_current_hexadecapole_family(self):
        t_grid = self._grid()
        table = _family_table([(4, 3), (4, 1)])
        h_modes = _reconstruct_h(self.P, self.E, 1.1, 0.8, t_grid, table=table)
        h_direct = thorne_h(self.P, self.E, 1.1, 0.8, t_grid, terms=("T6",))
        scale = np.max(np.abs(h_direct))
        # 4e-4: the omega^4 weighting amplifies the f32 harmonic noise of
        # the high-n F_n coefficients relative to the l=2 families
        np.testing.assert_allclose(h_modes / scale, h_direct / scale, atol=4e-4)

    def test_l5_mass_family(self):
        t_grid = self._grid()
        table = _family_table([(5, 5), (5, 3), (5, 1)])
        h_modes = _reconstruct_h(self.P, self.E, 0.9, 2.1, t_grid, table=table)
        h_direct = thorne_h(self.P, self.E, 0.9, 2.1, t_grid, terms=("T7",))
        scale = np.max(np.abs(h_direct))
        np.testing.assert_allclose(h_modes / scale, h_direct / scale, atol=2e-4)

    def test_l5_current_family(self):
        t_grid = self._grid()
        table = _family_table([(5, 4), (5, 2), (5, 0)])
        h_modes = _reconstruct_h(self.P, self.E, 1.4, 3.0, t_grid, table=table)
        h_direct = thorne_h(self.P, self.E, 1.4, 3.0, t_grid, terms=("T8",))
        scale = np.max(np.abs(h_direct))
        np.testing.assert_allclose(h_modes / scale, h_direct / scale, atol=2e-4)

    def test_l6_families(self):
        t_grid = self._grid()
        table = _family_table([(6, 6), (6, 4), (6, 2), (6, 0), (6, 5), (6, 3), (6, 1)])
        h_modes = _reconstruct_h(self.P, self.E, 0.7, 1.9, t_grid, table=table)
        h_direct = thorne_h(self.P, self.E, 0.7, 1.9, t_grid, terms=("T9", "T10"))
        scale = np.max(np.abs(h_direct))
        # 6e-4: omega^6 noise amplification (see current-hexadecapole note)
        np.testing.assert_allclose(h_modes / scale, h_direct / scale, atol=6e-4)

    def test_l7_families(self):
        # round 4: mass/current 2^7-poles vs the generic-STF Thorne-4.8
        # brute force (same machinery that derived them, but evaluated at
        # a DIFFERENT orbit/angles than the fit used)
        t_grid = self._grid()
        table = _family_table(
            [(7, 7), (7, 5), (7, 3), (7, 1), (7, 6), (7, 4), (7, 2), (7, 0)]
        )
        h_modes = _reconstruct_h(self.P, self.E, 0.8, 2.4, t_grid, table=table)
        h_direct = thorne_h(self.P, self.E, 0.8, 2.4, t_grid, terms=("T11", "T12"))
        scale = np.max(np.abs(h_direct))
        np.testing.assert_allclose(h_modes / scale, h_direct / scale, atol=1e-3)

    def test_l8_families(self):
        t_grid = self._grid()
        table = _family_table(
            [(8, 8), (8, 6), (8, 4), (8, 2), (8, 0), (8, 7), (8, 5), (8, 3), (8, 1)]
        )
        h_modes = _reconstruct_h(self.P, self.E, 1.1, 0.6, t_grid, table=table)
        h_direct = thorne_h(self.P, self.E, 1.1, 0.6, t_grid, terms=("T13", "T14"))
        scale = np.max(np.abs(h_direct))
        np.testing.assert_allclose(h_modes / scale, h_direct / scale, atol=2e-3)

    def test_l9_families(self):
        # round 5: the l = 9 rungs (full reference-inventory reach) vs the
        # generic-STF Thorne-4.8 brute force at an orbit/angle pair the
        # derivation never saw. Also regression-pins the omega^l ladder in
        # mode_amplitudes (a silent omega^8 cap there produced O(1)-wrong
        # l = 9, 10 amplitudes when first landed).
        t_grid = self._grid()
        table = _family_table(
            [(9, m) for m in (9, 7, 5, 3, 1)] + [(9, m) for m in (8, 6, 4, 2, 0)]
        )
        h_modes = _reconstruct_h(self.P, self.E, 1.3, 1.7, t_grid, table=table)
        h_direct = thorne_h(self.P, self.E, 1.3, 1.7, t_grid, terms=("T15", "T16"))
        scale = np.max(np.abs(h_direct))
        # f32 harmonic-projection noise amplified by omega^9 (cf. l=8 note)
        np.testing.assert_allclose(h_modes / scale, h_direct / scale, atol=5e-3)

    def test_l10_families(self):
        t_grid = self._grid()
        table = _family_table(
            [(10, m) for m in (10, 8, 6, 4, 2, 0)]
            + [(10, m) for m in (9, 7, 5, 3, 1)]
        )
        h_modes = _reconstruct_h(self.P, self.E, 0.9, 2.8, t_grid, table=table)
        h_direct = thorne_h(self.P, self.E, 0.9, 2.8, t_grid, terms=("T17", "T18"))
        scale = np.max(np.abs(h_direct))
        np.testing.assert_allclose(h_modes / scale, h_direct / scale, atol=1e-2)


class TestQuadrupoleAmplitudes:

    def test_circular_limit(self):
        # e -> 0: only n=0 of (2,2) survives; |A| = 2 sqrt(pi/5) (2 Om)^2 p^2
        p = 12.0
        table = ModeTable(np.array([2, 2]), np.array([2, 2]), np.array([0, 1]))
        a_re, a_im = mode_amplitudes(jnp.asarray(p), jnp.asarray(1e-10), table)
        om_phi, _ = fundamental_frequencies(jnp.asarray(p), jnp.asarray(1e-10))
        expect = 2 * np.sqrt(np.pi / 5) * (2 * float(om_phi)) ** 2 * p**2
        np.testing.assert_allclose(abs(float(a_re[0]) + 1j * float(a_im[0])), expect, rtol=1e-6)
        assert abs(float(a_re[1])) < 1e-8 * expect  # n=1 harmonic vanishes

    def test_batched_over_knots(self):
        table = default_mode_table(8)
        ps = jnp.linspace(8.0, 12.0, 7)
        es = jnp.linspace(0.1, 0.4, 7)
        re, im = mode_amplitudes(ps, es, table)
        assert re.shape == (7, table.num_modes)
        assert np.isfinite(np.asarray(re)).all() and np.isfinite(np.asarray(im)).all()


class TestAmplitudeBackends:
    def test_interp2d_matches_direct(self):
        from emri_frequencydomainwaveforms_tpu.models.amplitude_backends import (
            build_amplitude_grid,
            mode_amplitudes_interp2d,
        )

        table = default_mode_table(6)
        grid = build_amplitude_grid(table, n_u=96, n_e=49)
        ps = jnp.asarray([8.0, 10.0, 12.0])
        es = jnp.asarray([0.15, 0.3, 0.45])
        re_g, im_g = mode_amplitudes_interp2d(ps, es, grid)
        re_d, im_d = mode_amplitudes(ps, es, table)
        scale = float(jnp.max(jnp.abs(re_d)))
        np.testing.assert_allclose(np.asarray(re_g), np.asarray(re_d), atol=2e-3 * scale)
        np.testing.assert_allclose(np.asarray(im_g), np.asarray(im_d), atol=2e-3 * scale)

    def test_roman_network_learns(self):
        from emri_frequencydomainwaveforms_tpu.models.amplitude_backends import (
            fit_roman_network,
            init_roman_network,
            roman_forward,
        )

        table = default_mode_table(3)
        params0 = init_roman_network(table, hidden=(32, 32), seed=0)
        params = fit_roman_network(params0, n_steps=300, batch=192, seed=2)
        ps = jnp.asarray([9.0, 11.0])
        es = jnp.asarray([0.2, 0.4])
        re_d, im_d = mode_amplitudes(ps, es, table)
        scale = float(jnp.max(jnp.abs(re_d)))

        def err(pr):
            re_n, im_n = roman_forward(pr, ps, es)
            return max(
                np.abs(np.asarray(re_n) - np.asarray(re_d)).max(),
                np.abs(np.asarray(im_n) - np.asarray(im_d)).max(),
            )

        # training reduces the error by a large factor and lands within a
        # loose bound (production fits run many more steps / larger nets)
        assert err(params) < 0.25 * err(params0._replace(scale=params.scale))
        assert err(params) < 0.25 * scale

    def test_backend_facades(self):
        from emri_frequencydomainwaveforms_tpu.models.amplitude_backends import (
            Interp2DAmplitude,
            build_amplitude_grid,
        )

        table = default_mode_table(3)
        amp = Interp2DAmplitude(build_amplitude_grid(table, n_u=48, n_e=25))
        out = amp(np.array([10.0]), np.array([0.3]), specific_modes=[(2, 2, 0), (2, -2, 0)])
        a, b = out[(2, 2, 0)], out[(2, -2, 0)]
        np.testing.assert_allclose(b, np.conj(a), rtol=1e-12)
