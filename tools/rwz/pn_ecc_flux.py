"""Small-eccentricity PN expansion of the RWZ total flux (external anchor).

Round-4 VERDICT item 2: the circular limit of the repo's physics ladder is
pinned EXACTLY to the published test-mass PN flux series
(tests/test_rho.py, tests/test_rwz.py); this tool does the same for the
genuinely ECCENTRIC content by measuring, from the first-principles
eccentric RWZ solver (tools/rwz/eccentric.py — the same physics the
reference obtains from its Teukolsky data, cf. reference emri_pe.py:620),
the small-e expansion of the orbit-averaged total energy flux at fixed
azimuthal frequency:

    F(v, e) / F(v, 0) = 1 + e^2 G(v) + O(e^4),
    G(v) = g0 + g2 v^2 + g3 v^3 + O(v^4),      v = (M Omega_phi)^(1/3),

with e the Darwin (geodesic) eccentricity, the standard convention of the
black-hole-perturbation literature. The published test-mass values
(Mino-Sasaki-Shibata-Tagoshi-Tanaka, Prog. Theor. Phys. Suppl. 128 (1997);
Sasaki & Tagoshi, Living Rev. Relativity 6 (2003), slightly-eccentric
flux) are

    g0 = 157/24,   g2 = -6781/168,   g3 = (2335/48) pi,

where g0 is independently EXACT from Peters-Mathews re-expanded at fixed
azimuthal frequency: F_PM proportional to a^-5 (1-e^2)^{-7/2}
(1 + 73/24 e^2 + ...) at fixed a, and fixed Omega_phi means fixed a at
Newtonian order, so G_N = 7/2 + 73/24 = 157/24 (the in-repo
Peters-Mathews flux `models.flux.pn_flux_e_l` carries the same content
exactly; this anchors the CONVENTION).

Method: for each circular frequency v (p_circ = v^-2), root-find p(e)
such that Omega_phi(p, e) = v^3 (Darwin orbit), sum the per-mode RWZ
fluxes over l <= 4, |n| <= 3 (higher n enters at O(e^{2|n|-2}) relative),
fit the e^2 slope from a 3-point quadratic in e^2, then fit G(v) =
g0 + g2 v^2 + g3 v^3 + g4 v^4 over the v mesh and compare (g0, g2, g3)
against the series above. g4 absorbs the 2PN tail of the fit window.

Run:  python -m tools.rwz.pn_ecc_flux [--quick]
The measured coefficients go into PARITY.md; tests/test_rwz_eccentric.py
pins a cheap two-point version in CI.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from .eccentric import darwin_orbit, eccentric_flux_mode

G0_EXACT = 157.0 / 24.0
G2_PUBLISHED = -6781.0 / 168.0
G3_PUBLISHED = (2335.0 / 48.0) * np.pi


def omega_phi(p: float, e: float, n_chi: int = 256) -> float:
    return darwin_orbit(p, e, n_chi)["Om_phi"]


def p_at_fixed_omega(om_target: float, e: float) -> float:
    """Darwin p with Omega_phi(p, e) = om_target (Newton iteration)."""
    p = om_target ** (-2.0 / 3.0)  # circular/Keplerian seed
    for _ in range(60):
        f0 = omega_phi(p, e) - om_target
        dp = max(1e-6 * p, 1e-8)
        d = (omega_phi(p + dp, e) - omega_phi(p - dp, e)) / (2.0 * dp)
        step = f0 / d
        p -= step
        if abs(step) < 1e-12 * p:
            break
    return p


def total_flux(p: float, e: float, l_max: int = 4, n_abs: int = 3,
               n_chi: int = 512) -> float:
    """Sum of per-mode RWZ fluxes (mu = M = 1): m > 0 doubled by the
    equatorial symmetry F(l,-m,-n) = F(l,m,n); m = 0 summed over both n
    signs explicitly."""
    orb = darwin_orbit(p, e, n_chi)
    tot = 0.0
    for l in range(2, l_max + 1):
        for m in range(0, l + 1):
            for n in range(-n_abs, n_abs + 1):
                if m == 0 and n <= 0:
                    continue  # n<0 partner added via weight below
                om = m * orb["Om_phi"] + n * orb["Om_r"]
                if abs(om) < 1e-8:
                    continue
                f, _ = eccentric_flux_mode(l, m, n, p, e, _orbit=orb)
                tot += 2.0 * f  # +-m partners (m>0); +-n partners (m=0)
    return tot


def g_of_v(p_circ: float, es=(0.004, 0.05, 0.10), l_max: int = 4,
           n_chi: int = 512, verbose: bool = True):
    """e^2 slope of F/F(e->0) at fixed Omega_phi = p_circ^{-3/2}."""
    om = p_circ ** (-1.5)
    fs = []
    for e in es:
        p = p_at_fixed_omega(om, e)
        fs.append(total_flux(p, e, l_max=l_max, n_chi=n_chi))
        if verbose:
            print(f"    e={e:.3f}: p={p:.6f}  F={fs[-1]:.9e}", flush=True)
    # quadratic fit F = F0 (1 + G e^2 + H e^4)
    e2 = np.asarray(es) ** 2
    A = np.stack([np.ones_like(e2), e2, e2 * e2], axis=1)
    coef = np.linalg.solve(A, np.asarray(fs))
    return coef[1] / coef[0]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="2 v-points, g0 only (CI smoke)")
    ap.add_argument("--lmax", type=int, default=4)
    args = ap.parse_args(argv)

    t0 = time.time()
    ps = [60.0, 120.0] if args.quick else [60.0, 100.0, 180.0, 320.0, 560.0]
    gs = []
    for p_circ in ps:
        print(f"p_circ={p_circ}:", flush=True)
        g = g_of_v(p_circ, l_max=args.lmax)
        gs.append(g)
        print(f"  G(v) = {g:.8f}   ({time.time() - t0:.0f}s)", flush=True)

    v = np.asarray(ps) ** -0.5
    gs = np.asarray(gs)
    if args.quick:
        # linear-in-v^2 extrapolation to v = 0 -> g0 only
        g0 = (gs[0] * v[1] ** 2 - gs[1] * v[0] ** 2) / (v[1] ** 2 - v[0] ** 2)
        print(f"g0 = {g0:.6f}  (exact 157/24 = {G0_EXACT:.6f}, "
              f"diff {g0 - G0_EXACT:+.2e})")
        return

    # fit G(v) = g0 + g2 v^2 + g3 v^3 + g4 v^4
    A = np.stack([np.ones_like(v), v**2, v**3, v**4], axis=1)
    coef, res, *_ = np.linalg.lstsq(A, gs, rcond=None)
    g0, g2, g3, g4 = coef
    resid = np.max(np.abs(A @ coef - gs))
    print("\nfit G(v) = g0 + g2 v^2 + g3 v^3 + g4 v^4 over "
          f"p_circ = {ps}  (max fit residual {resid:.2e})")
    print(f"  g0 = {g0:+.6f}   exact   157/24      = {G0_EXACT:+.6f}   "
          f"diff {g0 - G0_EXACT:+.2e}")
    print(f"  g2 = {g2:+.6f}   published -6781/168 = {G2_PUBLISHED:+.6f}   "
          f"diff {g2 - G2_PUBLISHED:+.2e}")
    print(f"  g3 = {g3:+.6f}   published 2335pi/48 = {G3_PUBLISHED:+.6f}   "
          f"diff {g3 - G3_PUBLISHED:+.2e}")
    print(f"  g4 = {g4:+.6f}   (absorbs the 2PN tail of the window)")


if __name__ == "__main__":
    sys.exit(main())
