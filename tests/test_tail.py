"""Relativistic tail factor: external anchors + wiring.

The validation anchors here are NOT derived from this repo's own
multipole model — they pin against (a) scipy's complex loggamma and
(b) the published PN tail coefficients: 2 pi x^{3/2} in the (2,2)
amplitude and 4 pi x^{3/2} in the energy flux (Poisson 1993) — the
first amplitude-physics gates external to the in-repo brute force
(VERDICT round-2 item 1).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.special import loggamma

from emri_frequencydomainwaveforms_tpu.models.tail import (
    complex_lgamma,
    tail_factor,
    tail_modulus_sq,
)


class TestComplexLgamma:
    def test_matches_scipy_loggamma(self):
        rng = np.random.default_rng(0)
        zr = rng.uniform(1.0, 12.0, 300)
        zi = rng.uniform(-8.0, 8.0, 300)
        lr, li = complex_lgamma(jnp.asarray(zr), jnp.asarray(zi))
        ref = loggamma(zr + 1j * zi)
        np.testing.assert_allclose(np.asarray(lr), ref.real, atol=1e-12)
        np.testing.assert_allclose(np.asarray(li), ref.imag, atol=1e-12)

    def test_real_axis_is_gammaln(self):
        from scipy.special import gammaln

        z = np.array([3.0, 4.0, 5.0, 6.0, 7.0])
        lr, li = complex_lgamma(jnp.asarray(z), jnp.zeros(5))
        np.testing.assert_allclose(np.asarray(lr), gammaln(z), atol=1e-13)
        np.testing.assert_allclose(np.asarray(li), 0.0, atol=1e-13)


class TestTailFactor:
    def test_modulus_matches_closed_form(self):
        ls = np.array([2, 3, 4, 5, 6])
        for om in np.linspace(-1.5, 1.5, 13):
            tr, ti = tail_factor(ls, jnp.full(5, om))
            m2 = tail_modulus_sq(ls, jnp.full(5, om))
            np.testing.assert_allclose(
                np.asarray(tr) ** 2 + np.asarray(ti) ** 2, np.asarray(m2),
                rtol=1e-10,
            )

    def test_zero_frequency_is_identity(self):
        tr, ti = tail_factor(np.array([2, 5]), jnp.zeros(2))
        np.testing.assert_allclose(np.asarray(tr), 1.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ti), 0.0, atol=1e-12)

    def test_negative_frequency_suppressed(self):
        # e^{pi khat} < 1 for khat < 0: negative-frequency Teukolsky modes
        m2p = float(tail_modulus_sq(np.array([2]), jnp.array([0.05]))[0])
        m2n = float(tail_modulus_sq(np.array([2]), jnp.array([-0.05]))[0])
        assert m2p > 1.0 > m2n
        # detailed balance: |T(k)|^2 / |T(-k)|^2 = e^{4 pi k}
        np.testing.assert_allclose(m2p / m2n, np.exp(4 * np.pi * 0.05), rtol=1e-10)

    def test_pn_amplitude_tail_anchor(self):
        # |T_22| -> 1 + 2 pi x^{3/2}: the 1.5PN (2,2) amplitude tail term
        for x in (1e-3, 1e-4):
            k22 = 2.0 * x**1.5  # M omega_22 = 2 M Omega
            tr, ti = tail_factor(np.array([2]), jnp.array([k22]))
            mod = float(jnp.hypot(tr, ti)[0])
            excess = mod - 1.0
            pred = 2.0 * np.pi * x**1.5
            assert abs(excess - pred) / pred < 2e-3

    def test_pn_flux_tail_anchor(self):
        # |T_22|^2 -> 1 + 4 pi x^{3/2}: the Poisson (1993) flux wave tail
        for x in (1e-3, 1e-4):
            k22 = 2.0 * x**1.5
            m2 = float(tail_modulus_sq(np.array([2]), jnp.array([k22]))[0])
            pred = 4.0 * np.pi * x**1.5
            assert abs((m2 - 1.0) - pred) / pred < 2e-3


class TestWiring:
    def test_mode_amplitudes_tail_is_complex_multiply(self):
        from emri_frequencydomainwaveforms_tpu.models.amplitude import (
            default_mode_table,
            mode_amplitudes,
        )
        from emri_frequencydomainwaveforms_tpu.models.geodesic import (
            fundamental_frequencies,
        )

        table = default_mode_table(4, l_max=2)
        p = jnp.array([10.0, 12.0])
        e = jnp.array([0.3, 0.2])
        r0, i0 = mode_amplitudes(p, e, table)
        r1, i1 = mode_amplitudes(p, e, table, tail=True)
        om_phi, om_r = fundamental_frequencies(p, e)
        om = (
            jnp.asarray(table.ms, jnp.float64) * om_phi[:, None]
            + jnp.asarray(table.ns, jnp.float64) * om_r[:, None]
        )
        tr, ti = tail_factor(table.ls, om)
        # internal omega_mn carries the f32 quadrature frequencies; the
        # reconstruction here uses exact f64 ones -> ~1e-7 relative floor
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r0 * tr - i0 * ti), rtol=2e-6, atol=1e-12)
        np.testing.assert_allclose(np.asarray(i1), np.asarray(r0 * ti + i0 * tr), rtol=2e-6, atol=1e-12)

    def test_flux_tail_enhancement_circular_limit(self):
        # near-circular orbit at large p: flux ratio tail/no-tail must
        # approach the known 1 + 4 pi x^{3/2} (dominant-mode) enhancement
        from emri_frequencydomainwaveforms_tpu.models.flux import flux_from_modes

        p = jnp.array([60.0])
        e = jnp.array([1e-4])
        de0, _ = flux_from_modes(p, e)
        de1, _ = flux_from_modes(p, e, tail=True)
        ratio = float(de1[0] / de0[0])
        x = 1.0 / 60.0  # circular: x = (M Omega)^{2/3} = 1/p
        pred = 1.0 + 4.0 * np.pi * x**1.5
        assert abs(ratio - pred) / (pred - 1.0) < 0.05

    def test_facade_tail_knob(self):
        from emri_frequencydomainwaveforms_tpu.models.waveform import (
            GenerateEMRIWaveform,
        )

        kw = dict(
            sum_kwargs={"output_type": "fd"}, n_max=4, l_max=2, k_max=8,
            return_list=True,
        )
        # facade defaults to the full rwz stack since round 4: pin the
        # flat rung explicitly for the knob comparison
        flat = {"tail": False, "factorized": False, "rwz": False}
        gen0 = GenerateEMRIWaveform(amplitude_kwargs=dict(flat), **kw)
        gen1 = GenerateEMRIWaveform(
            amplitude_kwargs={**flat, "tail": True}, **kw
        )
        args = (1e6, 10.0, 0.0, 12.0, 0.3, 1.0, 1.0, 0.5, 0.6, 0.7, 0.8, 0.0, 0.0, 0.0)
        h0 = gen0(*args, T=0.01, dt=10.0, eps=1e-2)
        h1 = gen1(*args, T=0.01, dt=10.0, eps=1e-2)
        a0 = np.linalg.norm(h0[0])
        diff = np.linalg.norm(h1[0] - h0[0]) / a0
        # near-plunge start (p0 = 12): |T| boosts the norm ~15-20% and the
        # tail phase rotates each mode by ~0.1-0.3 rad -> O(0.3) L2 change;
        # gate that the correction is present, smooth, and not a blow-up
        assert 1e-3 < diff < 0.8
        ratio = np.linalg.norm(h1[0]) / a0
        assert 1.0 < ratio < 1.5  # net amplification, modest
