"""Brute-force validation of the fold (turnover) treatment at a REAL
plunging source (round-4 VERDICT item 5 leftover; round-3 only had the
synthetic quadratic fold of test_turnover.py).

Reference behavior pinned: the FD construction's Bessel-K(1/3) uniform-SPA
branch handling near caustics (arXiv:2307.12585; reference
Tutorial_FD_construction_single_mode.ipynb cell 26's ``kv(1/3, arg)``
region). Here the truth is the direct oscillatory integral of the SAME
single-mode time-domain signal the kernels integrate:

    h~(f) = int A(t) exp(i (phi_mn(t) - 2 pi f t)) dt

evaluated by dense trapezoid (>= 40 samples per cycle) on the mode's own
phase/amplitude splines, so the comparison isolates the kernels' SPA/fold
approximation — there is no interpolation-model difference.

Mode choice: (m, n) = (2, 10) of a plunging 1e6/50 e0=0.5 source folds with
Airy depth z = 2 pi B tau_F ~ 9 (B = fold-to-track-end frequency drop,
tau_F = Fresnel time), i.e. the fringe band holds several O(1)
interference fringes and the two-branch SPA is meaningfully testable.
Low-|n| modes of the same source have z < 1 (the track stop truncates the
decreasing branch inside the first Fresnel zone); their fold bins are
irreducibly SPA-fold-limited — that regime is covered by the whole-band
plunge gate in bench.py, not here.

The amplitude is tapered (C^1 cosine ramps, refit at the knots) so the
brute-force integral is edge-leakage-free; both pipelines see the refit
tapered splines, exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from emri_frequencydomainwaveforms_tpu.models.amplitude import default_mode_table
from emri_frequencydomainwaveforms_tpu.models.summation_fd import (
    FDKernelInputs,
    fd_mode_sum,
    fd_mode_sum_uniform,
    prepare_fd_inputs,
)
from emri_frequencydomainwaveforms_tpu.models.waveform import (
    _sigma,
    waveform_prologue,
)
from emri_frequencydomainwaveforms_tpu.ops.cubic_spline import (
    CubicSplineCoeffs,
    fit_cubic_spline,
    spline_eval,
)

M_IDX, N_IDX = 2.0, 10.0  # the z ~ 9 deep-fold harmonic of this source


def _taper(tt, t_end, t_fold):
    """C^1 cosine ramps: up over [0, 0.4 t_end], down over the last quarter
    of the decreasing branch (stationary points of the tested band sit in
    the first ~2/3 of the branch)."""
    up_end = 0.4 * t_end
    dn_a = t_fold + 0.75 * (t_end - t_fold)
    w = np.ones_like(tt)
    r = tt < up_end
    w[r] = 0.5 * (1 - np.cos(np.pi * tt[r] / up_end))
    r = tt > dn_a
    w[r] = 0.5 * (1 + np.cos(np.pi * np.clip((tt[r] - dn_a) / (t_end - dn_a), 0, 1)))
    w[tt >= t_end] = 0.0
    return w


@pytest.fixture(scope="module")
def fold_case():
    table = default_mode_table(16, l_max=2)
    pro = waveform_prologue(
        1e6, 50.0, 7.6, 0.5, 0.7, 0.5, 1.0, 0.0, 0.0,
        t_years=1.0, table=table, k_max=32, eps=1e-4,
    )
    sig = _sigma(table)
    ypr, ypi = pro.y_plus
    ymr, ymi = pro.y_minus
    inp = prepare_fd_inputs(
        pro.t_knots, pro.n_live, pro.phi_phi, pro.phi_r,
        pro.a_re, pro.a_im, table, pro.sel,
        (sig * ymr, sig * ymi), (ypr, -ypi),
        w1n=(ypr, ypi), w2n=(sig * ymr, -sig * ymi),
    )
    m_all = np.asarray(inp.m_sel)
    n_all = np.asarray(inp.n_sel)
    hits = np.where((m_all == M_IDX) & (n_all == N_IDX))[0]
    assert hits.size == 1, "harmonic not selected"
    j = int(hits[0])
    assert np.asarray(inp.dec_live)[j] > 0, "harmonic no longer folds"
    m, n = float(inp.m_sel[j]), float(inp.n_sel[j])
    ih, dh = int(inp.inc_hi[j]), int(inp.dec_hi[j])
    t = np.asarray(inp.t_knots)
    t_end, t_fold = t[dh], t[ih]
    fmode = m * np.asarray(inp.f_phi_knots) + n * np.asarray(inp.f_r_knots)
    fc, fend = fmode[ih], fmode[dh]
    B = fc - fend

    # tapered amplitude, refit at the SAME knots (both pipelines share it)
    sp_ar_old = CubicSplineCoeffs(x=inp.t_knots, c=inp.ar_c[j])
    sp_ai_old = CubicSplineCoeffs(x=inp.t_knots, c=inp.ai_c[j])
    ar_k = np.asarray(spline_eval(sp_ar_old, inp.t_knots))
    ai_k = np.asarray(spline_eval(sp_ai_old, inp.t_knots))
    wk = _taper(t, t_end, t_fold)
    sp_ar = fit_cubic_spline(inp.t_knots, jnp.asarray(ar_k * wk), bc="not-a-knot")
    sp_ai = fit_cubic_spline(inp.t_knots, jnp.asarray(ai_k * wk), bc="not-a-knot")

    one = jnp.ones((1,))
    zero = jnp.zeros((1,))
    sm = FDKernelInputs(
        t_knots=inp.t_knots, c_phi_phi=inp.c_phi_phi, c_phi_r=inp.c_phi_r,
        f_phi_knots=inp.f_phi_knots, f_r_knots=inp.f_r_knots,
        ar_c=sp_ar.c[None], ai_c=sp_ai.c[None],
        m_sel=jnp.asarray([m]), n_sel=jnp.asarray([n]),
        w1_re=one, w1_im=zero, w2_re=one, w2_im=zero,
        mode_live=one, n_live=inp.n_live,
        n_eff=inp.n_eff[j][None], inc_lo=inp.inc_lo[j][None],
        inc_hi=inp.inc_hi[j][None], inc_live=inp.inc_live[j][None],
        dec_lo=inp.dec_lo[j][None], dec_hi=inp.dec_hi[j][None],
        dec_live=inp.dec_live[j][None], power=one,
        neg_lo=jnp.asarray([0], jnp.int32), neg_hi=jnp.asarray([0], jnp.int32),
        neg_live=zero, w1n_re=zero, w1n_im=zero, w2n_re=zero, w2n_im=zero,
    )

    # dense brute-force evaluation of the shared splines
    n_pts = int(40 * fc * t_end) + 1
    tg = np.linspace(0.0, t_end, n_pts)
    tgj = jnp.asarray(tg)
    sp_pp = CubicSplineCoeffs(x=inp.t_knots, c=inp.c_phi_phi)
    sp_pr = CubicSplineCoeffs(x=inp.t_knots, c=inp.c_phi_r)
    phig = m * np.asarray(spline_eval(sp_pp, tgj)) + n * np.asarray(
        spline_eval(sp_pr, tgj)
    )
    ag = np.asarray(spline_eval(sp_ar, tgj)) + 1j * np.asarray(spline_eval(sp_ai, tgj))
    dt = tg[1] - tg[0]

    # fringe band: fc - 0.5 B .. fc - 0.08 B, ON the uniform bench-like grid
    df = 2.5e-8
    f0 = fc - 0.6 * B
    nf = int(0.75 * B / df)
    idx = np.linspace(0.1 * B / df, 0.52 * B / df, 12).astype(int)
    fs = f0 + idx * df
    _trapz = getattr(np, "trapezoid", None) or np.trapz  # numpy<2 fallback
    bv = np.array(
        [_trapz(ag * np.exp(1j * (phig - 2 * np.pi * f * tg)), dx=dt) for f in fs]
    )
    scale = np.sqrt(np.mean(np.abs(bv) ** 2))
    return dict(sm=sm, fs=fs, bv=bv, scale=scale, f0=f0, df=df, nf=nf, idx=idx)


def _rms(k, case):
    return float(np.sqrt(np.mean(np.abs(k - case["bv"]) ** 2)) / case["scale"])


class TestRealFoldBruteForce:
    def test_fringes_present(self, fold_case):
        # the band really holds O(1) two-branch interference fringes
        a = np.abs(fold_case["bv"]) / fold_case["scale"]
        assert a.min() < 0.5 and a.max() > 1.3

    def test_two_branch_matches_brute_force(self, fold_case):
        o = fd_mode_sum(fold_case["sm"], jnp.asarray(fold_case["fs"]), turnover_slots=1)
        k = np.asarray(o[0]) + 1j * np.asarray(o[1])
        # measured 0.059 RMS: the shared SPA+Bessel residual at z ~ 9
        assert _rms(k, fold_case) < 0.12

    def test_single_branch_misses_fringes(self, fold_case):
        o0 = fd_mode_sum(fold_case["sm"], jnp.asarray(fold_case["fs"]), turnover_slots=0)
        o1 = fd_mode_sum(fold_case["sm"], jnp.asarray(fold_case["fs"]), turnover_slots=1)
        k0 = np.asarray(o0[0]) + 1j * np.asarray(o0[1])
        k1 = np.asarray(o1[0]) + 1j * np.asarray(o1[1])
        # measured: 0.46 vs 0.059 — the fringes are two-branch content
        assert _rms(k0, fold_case) > 3 * _rms(k1, fold_case)

    def test_banded_production_kernel_matches_brute_force(self, fold_case):
        # the PRODUCTION banded kernel at the real fold bins (VERDICT r3
        # item 5: "validate the banded kernel at a real plunging source
        # against the brute-force oscillatory integral")
        bb = fd_mode_sum_uniform(
            fold_case["sm"], fold_case["f0"], fold_case["df"], fold_case["nf"],
            bins_per_run=16, turnover_slots=4, negative_slots=0,
            extra_band_runs=2048,
        )
        kb = (
            np.asarray(bb[0])[fold_case["idx"]]
            + 1j * np.asarray(bb[1])[fold_case["idx"]]
        )
        assert _rms(kb, fold_case) < 0.12  # measured 0.060
        # and it adds NO fold error over the general kernel (measured
        # banded-vs-general gap < 1e-2 of scale at the fold bins)
        o = fd_mode_sum(fold_case["sm"], jnp.asarray(fold_case["fs"]), turnover_slots=1)
        kg = np.asarray(o[0]) + 1j * np.asarray(o[1])
        gap = np.sqrt(np.mean(np.abs(kb - kg) ** 2)) / fold_case["scale"]
        assert gap < 2e-2
