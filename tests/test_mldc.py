"""Legacy MLDC noise-model zoo (lisa/mldc.py).

Pins the reference formulas (``lisatools/sensitivity.py:374-431, 604-744``
modern block; ``:849-1225`` legacy block, which the reference ships
string-quoted/dead and this repo ships live) by independent hand evaluation
of the published expressions at spot frequencies, plus structural limits
(equal-arm TDI relations, Phinney switch monotonicity, preset registry).
"""

import math

import numpy as np
import pytest

from emri_frequencydomainwaveforms_tpu.lisa.mldc import (
    MLDCModel,
    PhinneyBackground,
    galconf,
    make_wd_noise,
    mldc_lisanoise,
    mldc_lisanoises,
    mldc_model,
    mldc_noisepsd_AE,
    mldc_noisepsd_T,
    mldc_noisepsd_X,
    mldc_simplesnr,
    phinney_switch,
    sgal,
    simplesnr,
)

C_SI = 299_792_458.0


def test_lisanoises_lisareq_spot_value():
    # hand evaluation of the reference lisareq branch (:932-934) at 1 mHz
    f = 1e-3
    spm_exp = 2.53654e-48 * (1.0 + (f / 1e-4) ** -1) * (1.0 + (f / 0.008) ** 4) / f**2
    sop_exp = 1.42319e-37 * (1.0 + (f / 0.002) ** -4) * f**2
    spm, sop = mldc_lisanoises(np.array([f]))
    assert np.isclose(spm[0], spm_exp, rtol=1e-12)
    assert np.isclose(sop[0], sop_exp, rtol=1e-12)


def test_lisanoises_armlength_scaling():
    # optical noise scales with (L/L_default)^2 (shot-noise limited)
    f = np.array([2e-3])
    m_short = mldc_model("CLISA1_P005c_LPF")  # 1 Gm arm, newlpf
    _, sop = mldc_lisanoises(f, m_short)
    # the armlength-dependent piece only scales Sops, not Sopo
    sops = 6.15e-38 * m_short.optscale
    sop_exp = (sops + 2.81e-38) * f**2
    assert np.allclose(sop, sop_exp, rtol=1e-12)


def test_all_noisemodels_finite():
    f = np.geomspace(1e-4, 1e-1, 50)
    for nm in ("mldc", "mldc-nominal", "lisareq", "toy", "newlpf",
               "newdrs-wrong", "newdrs", "reddrs", "lpf", "wind",
               "windnew", "ax50"):
        spm, sop = mldc_lisanoises(f, noisemodel=nm)
        assert np.all(np.isfinite(spm)) and np.all(spm > 0), nm
        assert np.all(np.isfinite(sop)) and np.all(sop > 0), nm


def test_presets_mirror_setmodel_table():
    m = mldc_model("10LISA1_P07_D25_DRS_4L")
    assert m.noisemodel == "newdrs"
    assert math.isclose(m.lisaL, 1e9 / C_SI)
    assert m.lisaP == 0.7 and m.lisaD == 0.25
    m2 = mldc_model("lagrange-smallmirror")
    assert m2.noisemodel == "wind" and math.isclose(m2.lisaL, 21e9 / C_SI)
    assert m2.lisaD == 0.2
    with pytest.raises(NotImplementedError):
        mldc_model("no-such-mission")
    # arm override honored unless preset pins one
    assert math.isclose(mldc_model("lisareq", arm_m=5e9).lisaL, 5e9 / C_SI)


def test_legacy_tdi_psds_equal_arm_relations():
    f = np.geomspace(1e-4, 2e-2, 40)
    m = MLDCModel()
    sx = mldc_noisepsd_X(f, m)
    sa = mldc_noisepsd_AE(f, m)
    st = mldc_noisepsd_T(f)
    assert np.all(sx > 0) and np.all(sa > 0) and np.all(st >= 0)
    # low-f limits of the synthlisa expressions: with x -> 0,
    # Sx -> 16 x^2 (4 Spm + Sop), Sa -> 8 x^2 (12 Spm + 3 Sop) = 1.5 Sx,
    # St -> O(x^6): T is a null channel at DC
    fl = np.array([1e-5])
    xs = 2.0 * math.pi * m.lisaL * fl
    spm, sop = mldc_lisanoises(fl, m)
    assert np.allclose(
        mldc_noisepsd_X(fl, m), 16.0 * xs**2 * (4.0 * spm + sop), rtol=1e-3
    )
    assert np.allclose(
        mldc_noisepsd_AE(fl, m), 1.5 * mldc_noisepsd_X(fl, m), rtol=1e-3
    )
    assert mldc_noisepsd_T(fl)[0] < 1e-6 * mldc_noisepsd_X(fl, m)[0]


def test_wd_noise_mldc_piecewise_and_fits():
    f = np.array([5e-4, 2e-3, 10**-2.5, 10**-2.2, 5e-2])
    wd = make_wd_noise(f, "mldc", "X")
    assert np.all(wd[:-1] > 0) and wd[-1] == 0.0  # above 1e-2 Hz: zero
    # the reference 'opt' AE row is a 6-element typo (missing comma,
    # sensitivity.py:1114) that would IndexError; the restored 7-param
    # row must evaluate finite and positive
    for style in ("tau2", "opt", "pess", "hybrid"):
        for obs in ("X", "AE"):
            v = make_wd_noise(np.array([3e-4]), style, obs)
            assert np.isfinite(v).all() and (v > 0).all(), (style, obs)


def test_galconf_matches_sgal_at_table_points():
    # at a tabulated Tobs the interpolation is exact: GalConf == SGal(table)
    year = 365.25 * 24 * 3600.0
    f = np.geomspace(1e-4, 1e-2, 30)
    got = galconf(f, 1.0 * year)
    expect = sgal(
        f, [3.26651613e-44, 1.18300266e00, 1.76327234e03, 2.77606177e-03, 1.68631844e03]
    )
    assert np.allclose(got, expect, rtol=1e-12)
    with pytest.raises(ValueError):
        galconf(f, 11.0 * year)


def test_phinney_background_switch():
    pb = PhinneyBackground()
    f = np.array([1e-4, 1e-3, 1e-2])
    s_inst = np.full(3, 1e-41)
    # background alone is the power law
    assert np.allclose(pb(f), 1.4e-44 * f ** (-7.0 / 3.0), rtol=1e-12)
    inflated = pb(f, s_inst)
    # switched noise is never below the instrument floor, never above
    # instrument + background
    assert np.all(inflated >= s_inst * (1 - 1e-12))
    assert np.all(inflated <= s_inst + pb(f) + 1e-50)
    # switch picks min(inflate, add)
    assert np.allclose(
        phinney_switch(s_inst, pb(f), np.full(3, 1.0)), s_inst, rtol=1e-12
    )


def test_mldc_lisanoise_cutler_branch():
    # Barack-Cutler Eq. 25 with the 20/3 averaging factor (:1026)
    f = np.array([1e-3])
    m = MLDCModel(noisemodel="cutler")
    got = mldc_lisanoise(f, m)
    exp = (20.0 / 3.0) * (9.18e-52 * f**-4 + 1.59e-41 + 9.18e-38 * f**2)
    assert np.allclose(got, exp, rtol=1e-12)


def test_mldc_lisanoise_lisareq_positive_and_wd():
    f = np.geomspace(1e-4, 1e-2, 25)
    base = mldc_lisanoise(f)
    with_wd = mldc_lisanoise(f, includewd="tau2")
    assert np.all(base > 0) and np.all(with_wd >= base * (1 - 1e-12))
    # phinney-style includewd returns the switched curve
    sw = mldc_lisanoise(f, MLDCModel(), includewd=PhinneyBackground())
    assert np.all(np.isfinite(sw)) and np.all(sw > 0)


def test_simplesnr_scalings():
    # SNR scales as h * sqrt(years); inclination-averaged factor sqrt(16/5)
    f = 3e-3
    s1 = mldc_simplesnr(f, 1e-21, years=1.0)
    s4 = mldc_simplesnr(f, 1e-21, years=4.0)
    assert np.isclose(s4 / s1, 2.0, rtol=1e-12)
    s_face_on = mldc_simplesnr(f, 1e-21, i=0.0)
    # face-on: sqrt((1+1)^2 + 4) = sqrt(8) vs rms sqrt(16/5)
    assert np.isclose(s_face_on / s1, math.sqrt(8.0 / (16.0 / 5.0)), rtol=1e-12)
    # modern-block simplesnr against lisasens
    sm = simplesnr(f, 1e-21, years=1.0)
    assert np.isfinite(sm) and sm > 0
