"""LISA layer tests: PSDs, inner products, likelihood."""

import numpy as np
import jax
import jax.numpy as jnp

from emri_frequencydomainwaveforms_tpu.lisa.sensitivity import (
    AET,
    cornish_lisa_psd,
    get_sensitivity,
    lisanoises,
    lisasens,
    noisepsd_AE,
    noisepsd_AE2,
    noisepsd_T,
    noisepsd_X,
    noisepsd_X2,
)
from emri_frequencydomainwaveforms_tpu.lisa.diagnostic import (
    fisher,
    get_eigens,
    get_mismatch,
    inner_product,
    snr,
    vallisneri_criterion,
    vallisneri_criterion_cdf,
)
from emri_frequencydomainwaveforms_tpu.lisa.likelihood import Likelihood, df_vector
from emri_frequencydomainwaveforms_tpu.utils.transform import TransformContainer


class TestSensitivity:
    def test_psd_magnitudes(self):
        # LISA bucket sensitivity ~ 1e-41..1e-40 around 3-10 mHz
        f = np.array([3e-3, 1e-2])
        sn = np.asarray(cornish_lisa_psd(jnp.asarray(f)))
        assert (sn > 1e-42).all() and (sn < 1e-38).all()
        sl = np.asarray(lisasens(jnp.asarray(f)))
        assert (sl > 1e-42).all() and (sl < 1e-38).all()

    def test_tdi_psds_positive(self):
        f = np.logspace(-4, -1, 50)
        for fn in (noisepsd_X, noisepsd_AE, noisepsd_T):
            psd = np.asarray(fn(jnp.asarray(f)))
            assert np.isfinite(psd).all() and (psd > 0).all()

    def test_dispatcher(self):
        f = jnp.asarray([1e-3, 5e-3])
        psd = get_sensitivity(f, sens_fn="lisasens")
        asd = get_sensitivity(f, sens_fn="lisasens", return_type="ASD")
        np.testing.assert_allclose(np.asarray(asd) ** 2, np.asarray(psd), rtol=1e-12)
        cs = get_sensitivity(f, sens_fn="lisasens", return_type="char_strain")
        np.testing.assert_allclose(np.asarray(cs) ** 2, np.asarray(f * psd), rtol=1e-12)

    def test_second_generation_tdi(self):
        # the 2nd-gen PSDs must equal the reference's expanded forms
        # (sensitivity.py:461, :545): X2 = 64 sin^2 x sin^2 2x Sop
        # + 256 (3 + cos 2x) cos^2 x sin^4 x Spm, and the AE analogue
        f = np.logspace(-4, -1, 60)
        from emri_frequencydomainwaveforms_tpu.lisa.sensitivity import C_SI, L_ARM

        x = 2.0 * np.pi * L_ARM / C_SI * f
        spm, sop = lisanoises(f)
        x2_expect = 64.0 * np.sin(x) ** 2 * np.sin(2 * x) ** 2 * sop + 256.0 * (
            3.0 + np.cos(2 * x)
        ) * np.cos(x) ** 2 * np.sin(x) ** 4 * spm
        np.testing.assert_allclose(noisepsd_X2(f), x2_expect, rtol=1e-12)
        ae2_expect = (
            32.0
            * np.sin(x) ** 2
            * np.sin(2 * x) ** 2
            * (2.0 * spm * (3.0 + 2.0 * np.cos(x) + np.cos(2 * x)) + sop * (2.0 + np.cos(x)))
        )
        np.testing.assert_allclose(noisepsd_AE2(f), ae2_expect, rtol=1e-12)
        # dispatcher wiring
        np.testing.assert_allclose(
            np.asarray(get_sensitivity(f, sens_fn="noisepsd_X2")), x2_expect, rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(get_sensitivity(f, sens_fn="noisepsd_AE2")), ae2_expect, rtol=1e-12
        )

    def test_aet(self):
        x, y, z = np.array([1.0]), np.array([2.0]), np.array([3.0])
        a, e, t = AET(x, y, z)
        np.testing.assert_allclose(a, (z - x) / np.sqrt(2))
        np.testing.assert_allclose(t, (x + y + z) / np.sqrt(3))


class TestInnerProduct:
    def test_parseval_sine(self):
        # white-PSD inner product of a sinusoid: <h|h> = 4 * sum df |h|^2
        f = np.linspace(1e-3, 1e-2, 1000)
        h = np.exp(2j * np.pi * f * 1e4) * 1e-20
        val = inner_product([h], [h], f_arr=f, PSD=lambda ff: np.ones_like(ff))
        df = f[1] - f[0]
        np.testing.assert_allclose(val, 4 * np.sum(df * np.abs(h) ** 2), rtol=1e-10)

    def test_snr_and_mismatch(self):
        f = np.linspace(1e-3, 1e-2, 500)
        h = 1e-19 * np.exp(1j * f * 1e3)
        assert snr([h, h], f_arr=f) > 0
        assert get_mismatch([h], [h], f_arr=f) < 1e-14
        h2 = h * np.exp(0.1j)
        m = get_mismatch([h], [h2], f_arr=f)
        assert 1e-8 < m < 1.0

    def test_fisher_gaussian_model(self):
        # h(f; A) = A g(f): Fisher_AA = <g|g>; 1-param analytic check
        f = np.linspace(1e-3, 1e-2, 300)
        g = 1e-20 * np.exp(2j * np.pi * f * 5e3)

        def wf(p):
            return [p[0] * g]

        gamma = fisher(wf, np.array([2.0]), 1e-6, f_arr=f, PSD=lambda ff: np.ones_like(ff))
        expect = inner_product([g], [g], f_arr=f, PSD=lambda ff: np.ones_like(ff))
        np.testing.assert_allclose(gamma[0, 0], expect, rtol=1e-6)

    def test_pinv_highprec_beats_f64_on_scale_disparity(self):
        """mpmath 500-dps inverse (reference ``diagnostic.py:418-433``):
        on a Fisher whose conditioning is dominated by diagonal scale
        disparity (cond ~ 1e28 — typical of mixed mass/phase coordinates),
        f64 pinv truncates the soft directions while the high-precision
        branch recovers the exact inverse D^-1 A^-1 D^-1."""
        from emri_frequencydomainwaveforms_tpu.lisa.diagnostic import (
            pinv_highprec,
        )

        rng = np.random.default_rng(3)
        q, _ = np.linalg.qr(rng.standard_normal((5, 5)))
        a = q @ np.diag([3.0, 2.0, 1.5, 1.0, 0.5]) @ q.T  # cond 6, SPD
        d = np.diag([1e10, 1e6, 1.0, 1e-4, 1e-4])
        g = d @ a @ d
        exact = np.linalg.inv(d) @ np.linalg.inv(a) @ np.linalg.inv(d)
        hp = pinv_highprec(g)
        np.testing.assert_allclose(hp, exact, rtol=1e-8)
        f64 = np.linalg.pinv(g)
        # f64 pinv truncates the soft (1e-4-scale) block: its variances
        # come out orders of magnitude too small
        soft_err = np.abs(np.diag(f64)[3:] / np.diag(exact)[3:] - 1.0)
        assert soft_err.max() > 0.9


class TestVallisneriCriterion:
    def _linear_model(self):
        # h(f; a, b) = (a g1 + b g2): EXACTLY linear in the parameters, so
        # the Fisher quadratic is exact, overlap == prediction, and
        # |ln r| ~ 0 up to the overlap's own quadratic truncation
        f = np.linspace(1e-3, 1e-2, 300)
        g1 = 1e-20 * np.exp(2j * np.pi * f * 5e3)
        g2 = 1e-20 * np.exp(2j * np.pi * f * 9e3)

        def wf(p):
            return [p[0] * g1 + p[1] * g2]

        # PSD scaled for SNR ~ a few hundred: the 1-sigma contour is then a
        # genuinely small displacement and the Fisher quadratic is testable
        kw = dict(f_arr=f, PSD=lambda ff: np.ones_like(ff) * 1e-45)
        return wf, np.array([3.0, 1.5]), kw

    def test_eigens_symmetric(self):
        wf, p, kw = self._linear_model()
        gamma = fisher(wf, p, 1e-7, **kw)
        w, v = get_eigens(gamma)
        np.testing.assert_allclose(v @ np.diag(w) @ v.T, gamma, rtol=1e-8)

    def test_single_draw_ratio_near_one(self):
        wf, p, kw = self._linear_model()
        gamma = fisher(wf, p, 1e-7, **kw)
        mism, ratio = vallisneri_criterion(wf, p, fish=gamma, rng=1, **kw)
        assert 0.0 <= mism < 0.1
        # linear model: ratio deviates from 1 only at O(mismatch^2)
        assert abs(np.log(ratio)) < 0.02

    def test_cdf_shapes_and_r90(self):
        wf, p, kw = self._linear_model()
        gamma = fisher(wf, p, 1e-7, **kw)
        r90, quantiles, cdf, ratios = vallisneri_criterion_cdf(
            wf, p, fish=gamma, num_samples=40, return_ratios=True, seed=3, **kw
        )
        assert ratios.shape == (40,)
        assert len(quantiles) == len(cdf)
        assert np.all(np.diff(cdf) > 0) or len(cdf) == 1
        assert 0.0 <= r90 < 0.05  # Fisher is trustworthy for a linear model
        # r90 is the 90th percentile of the drawn |ln r| values
        assert r90 <= ratios.max() + 1e-15


class TestLikelihood:
    def _setup(self):
        f = jnp.asarray(np.linspace(1e-3, 1e-2, 200))
        g_re = np.cos(2 * np.pi * np.asarray(f) * 3e3) * 1e-20
        g_im = np.sin(2 * np.pi * np.asarray(f) * 3e3) * 1e-20
        gr, gi = jnp.asarray(g_re), jnp.asarray(g_im)

        def template(params):
            a = params[0]
            return [(a * gr, a * gi), (0.5 * a * gr, 0.5 * a * gi)]

        like = Likelihood(template, 2, f_arr=f, parameter_transforms=None)
        inj = template(jnp.asarray([3.0]))
        data = [np.asarray(c[0]) + 1j * np.asarray(c[1]) for c in inj]
        like.inject_signal(data, noise_fn=lambda ff: np.ones_like(ff) * 1e-40)
        return like

    def test_zero_at_truth(self):
        like = self._setup()
        ll = np.asarray(like(jnp.asarray([[3.0], [2.9], [3.1]])))
        assert abs(ll[0]) < 1e-6
        assert ll[1] < -1e-5 and ll[2] < -1e-5
        # quadratic symmetry
        np.testing.assert_allclose(ll[1], ll[2], rtol=1e-6)

    def test_subset_chunking_matches(self):
        like = self._setup()
        params = jnp.asarray(np.random.default_rng(0).uniform(2, 4, (11, 1)))
        full = np.asarray(like(params))
        like.subset = 4
        like._build()
        chunked = np.asarray(like(params))
        np.testing.assert_allclose(full, chunked, rtol=1e-12)

    def test_transform_container(self):
        tc = TransformContainer(
            parameter_transforms={(0, 1): lambda a, b: [jnp.exp(a), jnp.exp(a) * jnp.exp(b)]},
            fill_dict={"ndim_full": 4, "fill_values": np.array([7.0, 8.0]), "fill_inds": np.array([2, 3])},
        )
        out = np.asarray(tc.both_transforms(jnp.asarray([[0.0, np.log(0.5)]])))
        np.testing.assert_allclose(out[0], [1.0, 0.5, 7.0, 8.0], rtol=1e-12)

    def test_df_vector(self):
        f = jnp.asarray([1.0, 2.0, 4.0, 7.0])
        np.testing.assert_allclose(np.asarray(df_vector(f)), [1, 1, 2, 3])

    def test_d_h_h_h_matched_filter_identities(self):
        """d_h/h_h surface (reference ``likelihood.py:368,379`` and
        ``old_likelihood.py:368,647``): at the truth <d|h> = <h|h>, the
        template scales linearly in a, and ll = -1/2(<d|d> - 2<d|h> + <h|h>)."""
        like = self._setup()
        ll = np.asarray(like(jnp.asarray([[3.0], [1.5]])))
        d_h = np.asarray(like.d_h)
        h_h = np.asarray(like.h_h)
        np.testing.assert_allclose(d_h[0], h_h[0], rtol=1e-10)
        # template linear in a: h(1.5) = h(3)/2
        np.testing.assert_allclose(h_h[1], h_h[0] / 4.0, rtol=1e-10)
        np.testing.assert_allclose(d_h[1], d_h[0] / 2.0, rtol=1e-10)
        d_d = h_h[0]  # injection == template at truth
        np.testing.assert_allclose(
            ll, -0.5 * (d_d - 2.0 * d_h + h_h), rtol=1e-8, atol=1e-8
        )


class TestTDIf:
    """TDIf container vs hand-computed values (reference sensitivity.py:99-371).

    Deviation documented: the reference's ``cprod``/``dotprod``/``logL``
    scale by ``4/df`` while its own ``normsq`` scales by ``4*df``; the
    rebuild uses the dimensionally-consistent ``4*df`` everywhere
    (matching ``diagnostic.inner_product``'s right-rule convention).
    """

    def _make(self, seed=0):
        rng = np.random.default_rng(seed)
        f = np.linspace(1e-3, 1e-2, 64)
        chans = [
            rng.standard_normal(64) + 1j * rng.standard_normal(64)
            for _ in range(3)
        ]
        return f, chans

    def test_aet_xyz_roundtrip(self):
        from emri_frequencydomainwaveforms_tpu.lisa.tdi import TDIf

        f, (X, Y, Z) = self._make()
        tdi = TDIf.from_xyz(f, X, Y, Z)
        # AET is the orthogonal map used by the reference AET() (:90)
        np.testing.assert_allclose(tdi.Af, (Z - X) / np.sqrt(2), rtol=1e-12)
        np.testing.assert_allclose(
            tdi.Ef, (X - 2 * Y + Z) / np.sqrt(6), rtol=1e-12
        )
        np.testing.assert_allclose(tdi.Tf, (X + Y + Z) / np.sqrt(3), rtol=1e-12)
        # from_aet inverts back to the same X, Y, Z
        tdi2 = TDIf.from_aet(f, tdi.Af, tdi.Ef, tdi.Tf)
        np.testing.assert_allclose(tdi2.Xf, X, atol=1e-12)
        np.testing.assert_allclose(np.asarray(tdi2.Y[0]), Y.real, atol=1e-12)

    def test_algebra(self):
        from emri_frequencydomainwaveforms_tpu.lisa.tdi import TDIf

        f, (X, Y, Z) = self._make()
        a = TDIf.from_xyz(f, X, Y, Z)
        b = TDIf.from_xyz(f, 2 * X, -Y, 0.5 * Z)
        np.testing.assert_allclose((a + b).Xf, 3 * X, rtol=1e-12)
        np.testing.assert_allclose((a - b).Yf if hasattr(a - b, "Yf") else
                                   np.asarray((a - b).Y[0]) + 1j * np.asarray((a - b).Y[1]),
                                   2 * Y, rtol=1e-12)
        np.testing.assert_allclose((2.0 * a).Af, 2 * a.Af, rtol=1e-12)
        np.testing.assert_allclose((a * b).Xf, X * (2 * X), rtol=1e-12)
        np.testing.assert_allclose((a / b).Tf, a.Tf / b.Tf, rtol=1e-10)

    def test_normsq_and_logl_hand_computed(self):
        from emri_frequencydomainwaveforms_tpu.lisa.tdi import TDIf
        from emri_frequencydomainwaveforms_tpu.lisa.sensitivity import (
            noisepsd_AE,
            noisepsd_T,
        )

        f, (X, Y, Z) = self._make(1)
        d = TDIf.from_xyz(f, X, Y, Z)
        df = f[1] - f[0]
        sae = noisepsd_AE(f)
        st = noisepsd_T(f)
        expect = 4.0 * df * (
            np.sum(np.abs(d.Af) ** 2 / sae)
            + np.sum(np.abs(d.Ef) ** 2 / sae)
            + np.sum(np.abs(d.Tf) ** 2 / st)
        )
        np.testing.assert_allclose(float(d.normsq()), expect, rtol=1e-10)

        h = TDIf.from_xyz(f, 0.9 * X, 0.9 * Y, 0.9 * Z)
        np.testing.assert_allclose(
            float(d.logL(h)), -0.5 * float((d - h).normsq()), rtol=1e-12
        )
        # dotprod consistency: <d, d> == normsq
        np.testing.assert_allclose(
            float(d.dotprod(d)), float(d.normsq()), rtol=1e-10
        )

    def test_jit_reductions(self):
        import jax
        from emri_frequencydomainwaveforms_tpu.lisa.tdi import TDIf

        f, (X, Y, Z) = self._make(2)
        d = TDIf.from_xyz(f, X, Y, Z)
        h = TDIf.from_xyz(f, 0.5 * X, 0.5 * Y, 0.5 * Z)
        # PSDs precompute host-side (numpy; LISA PSD magnitudes underflow
        # device f64) and enter the jitted reduction as arrays
        psd = (d.Sae, d.Sae, d.St)
        ll = jax.jit(lambda a, b: -0.5 * (a - b).normsq(noisepsd=psd))(d, h)
        np.testing.assert_allclose(float(ll), float(d.logL(h)), rtol=1e-10)
