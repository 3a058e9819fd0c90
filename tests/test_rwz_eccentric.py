"""Eccentric-source RWZ solver (tools/rwz/eccentric.py).

Validates the first-principles eccentric per-mode amplitudes/fluxes in
their analytically-known limits:

  * circular limit (e -> 0, n = 0) against the independently-assembled
    circular module (different source channels exercised: the radial
    u_r channels vanish there),
  * Newtonian limit (p >> 6) per (l, m, n) against the package's
    flat-space multipole mode power (validated in tests/test_amplitude
    against the Thorne-4.8 STF brute force),
  * conjugation symmetry (m, n) -> (-m, -n),
  * spectral quadrature convergence in n_chi at strong field.

Together with tests/test_rwz.py (master equations re-derived and the
circular fluxes PN-pinned to 1e-6) this pins the eccentric machinery in
every regime with an analytic anchor; the strong-field eccentric values
it produces are the repo's Teukolsky-equivalent calibration content
(reference emri_pe.py:55-57,620).
"""

import numpy as np
import pytest

from tools.rwz.eccentric import (
    darwin_orbit,
    eccentric_amplitude,
    eccentric_flux_mode,
)


def test_darwin_orbit_matches_package_frequencies():
    import jax.numpy as jnp

    from emri_frequencydomainwaveforms_tpu.models.geodesic import (
        fundamental_frequencies,
    )

    p, e = 9.5, 0.45
    orb = darwin_orbit(p, e, 256)
    om_phi, om_r = (
        float(x) for x in fundamental_frequencies(jnp.asarray(p), jnp.asarray(e))
    )
    np.testing.assert_allclose(orb["Om_phi"], om_phi, rtol=1e-12)
    np.testing.assert_allclose(orb["Om_r"], om_r, rtol=1e-12)
    # turning points: r(0) = periapsis, r(pi) = apoapsis
    np.testing.assert_allclose(orb["r"][0], p / (1 + e), rtol=1e-14)
    np.testing.assert_allclose(orb["r"][128], p / (1 - e), rtol=1e-14)
    # u_r vanishes at the turning points, and the lowered-index identity
    # u^r = f u_r must satisfy the normalization along the orbit
    f = 1.0 - 2.0 / orb["r"]
    norm = (
        -orb["E"] ** 2 / f
        + (f * orb["u_r"]) ** 2 / f
        + orb["L"] ** 2 / orb["r"] ** 2
    )
    np.testing.assert_allclose(norm, -1.0, atol=1e-10)


def test_circular_limit_both_parities():
    from tools.rwz.circular import (
        even_circular_amplitude,
        odd_circular_amplitude,
    )

    p = 10.0
    orb = darwin_orbit(p, 1e-3, 128)
    for (l, m) in [(2, 2), (2, 1), (3, 3), (3, 2)]:
        C_e, om_e = eccentric_amplitude(l, m, 0, p, 1e-3, _orbit=orb)
        if (l + m) % 2 == 0:
            C_c, om_c = even_circular_amplitude(l, m, p)
        else:
            C_c, om_c = odd_circular_amplitude(l, m, p)
        assert abs(abs(C_e) / abs(C_c) - 1.0) < 1e-4, (l, m)
        assert abs(np.angle(C_e / C_c)) < 1e-4, (l, m)
        assert abs(om_e / om_c - 1.0) < 1e-4


def test_newtonian_limit_per_mode():
    """F_lmn -> flat-space multipole mode power as p -> inf.

    At p = 400 the relativistic corrections are ~1.3% (1PN ~ -5/p for
    (2,2,1)); gate at 2% and additionally require the residual to SHRINK
    from p = 200 to p = 400 (slope check distinguishes a genuine
    1/p-convergent limit from an accidental offset).
    """
    import jax.numpy as jnp

    from emri_frequencydomainwaveforms_tpu.models.amplitude import (
        default_mode_table,
        mode_amplitudes,
    )
    from emri_frequencydomainwaveforms_tpu.models.geodesic import (
        fundamental_frequencies,
    )

    table = default_mode_table(8)
    ls, ms, ns = (np.asarray(a) for a in (table.ls, table.ms, table.ns))
    e = 0.3

    def ratio(l, m, n, p):
        i = int(np.where((ls == l) & (ms == m) & (ns == n))[0][0])
        ar, ai = mode_amplitudes(jnp.asarray(p), jnp.asarray(e), table)
        om_phi, om_r = (
            float(x)
            for x in fundamental_frequencies(jnp.asarray(p), jnp.asarray(e))
        )
        om = m * om_phi + n * om_r
        f_model = (1 / (8 * np.pi)) * om**2 * (
            float(ar[i]) ** 2 + float(ai[i]) ** 2
        )
        orb = darwin_orbit(p, e, 128)
        f_rwz, _ = eccentric_flux_mode(l, m, n, p, e, _orbit=orb)
        return f_rwz / f_model

    for (l, m, n) in [(2, 2, 1), (2, 1, 0), (3, 3, -1), (3, 2, 2)]:
        r400 = ratio(l, m, n, 400.0)
        assert abs(r400 - 1.0) < 0.02, (l, m, n, r400)
        r200 = ratio(l, m, n, 200.0)
        assert abs(r400 - 1.0) < 0.75 * abs(r200 - 1.0), (l, m, n, r200, r400)


def test_conjugation_symmetry():
    p, e = 10.0, 0.3
    orb = darwin_orbit(p, e, 128)
    for (l, m, n) in [(2, 2, 1), (3, 2, -1), (3, 3, 2), (4, 3, 0)]:
        C1, om1 = eccentric_amplitude(l, m, n, p, e, _orbit=orb)
        C2, om2 = eccentric_amplitude(l, -m, -n, p, e, _orbit=orb)
        sign = (-1) ** l if (l + m) % 2 == 0 else -((-1) ** l)
        np.testing.assert_allclose(C2, sign * np.conj(C1), rtol=1e-10)
        np.testing.assert_allclose(om2, -om1, rtol=1e-12)


def test_quadrature_convergence_strong_field():
    p, e = 8.0, 0.4
    vals = []
    for n_chi in (128, 256):
        F, _ = eccentric_flux_mode(2, 2, 3, p, e, n_chi)
        vals.append(F)
    assert abs(vals[1] / vals[0] - 1.0) < 1e-7


def test_clean_table_rejects_glitches_keeps_physics():
    """The calibration post-pass (tools/rwz/calibrate_ecc.clean_table)
    must kill isolated solver glitches (modulus spikes, pi phase flips)
    and shrink noise-dominated fields toward identity, while a genuine
    smooth ~2x residual field survives nearly untouched."""
    from tools.rwz.calibrate_ecc import clean_table

    rng = np.random.default_rng(3)
    nu, ne = 10, 6
    uu = np.linspace(0.0, 1.0, nu)[:, None]
    ee = np.linspace(0.0, 1.0, ne)[None, :]

    # genuine smooth 2x field with a small smooth phase
    smooth = (1.5 + 0.8 * uu + 0.4 * ee) * np.exp(-0.1j * (1 - uu))
    glitchy = smooth.copy()
    glitchy[3, 2] *= 2.5                      # modulus spike
    glitchy[7, 4] *= np.exp(1j * np.pi)       # phase flip
    # noise-dominated ~1 field (dominant-mode case)
    noisy = np.exp(rng.normal(0.0, 0.08, (nu, ne))
                   + 1j * rng.normal(0.0, 0.01, (nu, ne)))

    out, _ = clean_table({"a": glitchy, "b": noisy})
    a, b = out["a"], out["b"]
    # glitches gone: everything within 25% of the local smooth field
    assert np.all(np.abs(np.log(np.abs(a / smooth)))
                  < np.log(1.25)), np.abs(a / smooth)
    assert np.all(np.abs(np.angle(a / smooth)) < 0.2)
    # genuine trend preserved (field still spans ~1.5 .. 2.7)
    assert np.abs(a).max() > 2.2 and np.abs(a).min() < 1.8
    # noise-dominated modulus shrunk to ~identity
    assert np.all(np.abs(np.abs(b) - 1.0) < 0.05)


def test_clean_table_noise_driven_shrinkage():
    """With measured per-node error bars (round 4) the shrinkage is
    noise-driven: well-resolved node-scale structure survives in full
    (the blanket Wiener stage would have discarded it), while nodes whose
    deviation sits inside their own error bar revert to the local smooth
    field."""
    from tools.rwz.calibrate_ecc import clean_table

    rng = np.random.default_rng(11)
    nu, ne = 10, 6
    uu = np.linspace(0.0, 1.0, nu)[:, None]
    ee = np.linspace(0.0, 1.0, ne)[None, :]
    # smooth field plus REAL node-scale ripple, measured errors tiny
    ripple = 0.06 * np.cos(7.0 * uu + 5.0 * ee)
    field = (1.0 + 0.5 * uu) * np.exp(ripple + 0.02j)
    errs = np.full((nu, ne), 1e-8)
    out, oerr = clean_table({"a": field}, {"a": errs})
    # resolved ripple kept (blanket Wiener would flatten ~half of it)
    assert np.max(np.abs(np.log(np.abs(out["a"] / field)))) < 5e-3
    assert oerr["a"].shape == (nu, ne)

    # pure CONSTANT field + node noise at the measured error scale (below
    # the ERR_REJECT glitch threshold, so this exercises the SHRINKAGE
    # stage, not outlier rejection; a gradient would put deterministic
    # median-filter edge bias above the tiny noise and mask the effect):
    # the node-scale part reverts to the smooth field
    trend = 1.3 * np.exp(0.02j) * np.ones((nu, ne))
    noisy = trend * np.exp(rng.normal(0.0, 0.003, (nu, ne)))
    errs_mid = np.full((nu, ne), 0.003)
    out2, _ = clean_table({"a": noisy}, {"a": errs_mid})
    resid_out = np.log(np.abs(out2["a"] / trend))
    resid_in = np.log(np.abs(noisy / trend))
    # the 3x3-median smooth field itself retains ~0.4 sigma of the node
    # noise, so ~0.5x is the expected reduction floor here
    assert np.std(resid_out) < 0.65 * np.std(resid_in)
