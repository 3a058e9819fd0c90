"""Circular-orbit point-particle amplitudes from the RWZ solver.

Assembles, per (l, m), the asymptotic master-function amplitude C_inf for
a particle on a circular Schwarzschild geodesic at r0 (M = 1, mu = 1),
using the first-principles pieces:

  * master equations + source coefficients derived in derive_odd.py /
    derive_even.py (no transcribed literature formulas),
  * harmonic projections of the point-particle stress tensor computed
    here with explicit sympy spherical harmonics (Gram matrices, nothing
    quoted),
  * homogeneous solutions + Wronskian from solver.py.

The energy flux per mode is  F_lm = K_lp * omega^2 |C_inf|^2  with the
single parity-dependent constant K_lp pinned at NEWTONIAN order against
the repo's validated multipole constants (models/amplitude.py) — all
relativistic (r0-dependent) content is solver-derived and validated
against the published PN series in tests/test_rwz.py.
"""

from __future__ import annotations

import functools

import numpy as np
import sympy as sp

from .solver import (
    Homogeneous,
    homogeneous_rw,
    homogeneous_zerilli,
    rstar,
    v_rw,
)

_TH, _PH = sp.symbols("theta phi")


# ---------------------------------------------------------------------------
# geodesic (circular, M = 1)
# ---------------------------------------------------------------------------


def circular_geodesic(r0: float):
    Om = r0**-1.5
    ut = 1.0 / np.sqrt(1.0 - 3.0 / r0)
    E = (1.0 - 2.0 / r0) * ut
    Lz = np.sqrt(r0) * ut
    return Om, ut, E, Lz


# ---------------------------------------------------------------------------
# angular machinery (explicit per (l, m); cached)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def odd_angular(l: int, m: int):
    """Odd-parity harmonic data: equator values of the basis functions and
    the L2 norms used in the projections.

    Returns dict with:
      xi_ph_eq   = xi_phi(pi/2, 0)            (odd vector, phi comp)
      S_phph_eq  = S_phiphi(pi/2, 0)          (odd tensor, phiphi comp)
      N_xi       = int sigma^{AB} xi_A conj(xi_B) dOmega   (= l(l+1))
      N_S        = int S_AB conj(S^{AB}) dOmega
    """
    th, ph = _TH, _PH
    Y = sp.Ynm(l, m, th, ph).expand(func=True)
    xi = {
        th: -sp.diff(Y, ph) / sp.sin(th),
        ph: sp.sin(th) * sp.diff(Y, th),
    }
    gam = {
        (th, ph, ph): -sp.sin(th) * sp.cos(th),
        (ph, th, ph): sp.cos(th) / sp.sin(th),
        (ph, ph, th): sp.cos(th) / sp.sin(th),
    }

    def covd(a, b):
        expr = sp.diff(xi[b], a)
        for c in (th, ph):
            gg = gam.get((c, a, b), 0)
            if gg != 0:
                expr -= gg * xi[c]
        return expr

    S = {}
    for a in (th, ph):
        for b in (th, ph):
            S[(a, b)] = sp.simplify((covd(a, b) + covd(b, a)) / 2)

    def sphere_integral(expr):
        expr = sp.simplify(sp.expand(expr, func=True))
        return complex(
            sp.integrate(
                sp.integrate(expr * sp.sin(th), (th, 0, sp.pi)), (ph, 0, 2 * sp.pi)
            )
        )

    s2 = sp.sin(th) ** 2
    N_xi = sphere_integral(
        xi[th] * sp.conjugate(xi[th]) + xi[ph] * sp.conjugate(xi[ph]) / s2
    )
    N_S = sphere_integral(
        S[(th, th)] * sp.conjugate(S[(th, th)])
        + 2 * S[(th, ph)] * sp.conjugate(S[(th, ph)]) / s2
        + S[(ph, ph)] * sp.conjugate(S[(ph, ph)]) / s2**2
    )
    eq = {th: sp.pi / 2, ph: 0}
    return {
        "xi_ph_eq": complex(xi[ph].subs(eq)),
        "S_phph_eq": complex(S[(ph, ph)].subs(eq)),
        "N_xi": N_xi.real,
        "N_S": N_S.real,
    }


# ---------------------------------------------------------------------------
# odd-parity circular amplitude
# ---------------------------------------------------------------------------

# master source coefficients DERIVED by tools/rwz/derive_odd.py (M = 1):
#   S_odd = c_r Sr + c_s Ss + c_sp dSs/dr, with
#   c_r  = -16 pi f^2 / r
#   c_s  = -16 pi f (r - 3) / r^3
#   c_sp =   8 pi f^2 / r
# (re-derived and asserted in tests/test_rwz.py)


def odd_circular_amplitude(l: int, m: int, r0: float):
    """C_inf for the odd-parity (l + m odd) master function psi = f h1 / r,
    circular orbit at r0; also returns omega."""
    if (l + m) % 2 == 0:
        raise ValueError("odd parity requires l + m odd")
    Om, ut, E, Lz = circular_geodesic(r0)
    omega = m * Om
    ang = odd_angular(l, m)

    # tensor-harmonic projection of T_AB: only T_phiphi = Lz^2/(ut r0^2) d3
    q_s = (Lz**2 / (ut * r0**2)) * np.conj(ang["S_phph_eq"]) / ang["N_S"]

    hom = homogeneous_rw(l)
    X_in, dX_in_rs, X_up, dX_up_rs, W, Werr = hom.wronskian_and_fields(
        omega, [r0]
    )
    if Werr > 1e-8:
        raise RuntimeError(f"Wronskian drift {Werr}")
    f0 = 1.0 - 2.0 / r0
    Xi = complex(X_in[0])
    dXi = complex(dX_in_rs[0]) / f0  # d/dr

    # C = (q_s / W) * [ X c_s / f - d/dr ( X c_sp / f ) ]_{r0}
    c_s_over_f = -16.0 * np.pi * (r0 - 3.0) / r0**3
    c_sp_over_f = 8.0 * np.pi * f0 / r0
    d_c_sp_over_f = 8.0 * np.pi * (4.0 / r0 - 1.0) / r0**2
    val = Xi * c_s_over_f - (dXi * c_sp_over_f + Xi * d_c_sp_over_f)
    C = q_s * val / W
    return C, omega


def odd_circular_flux_raw(l: int, m: int, r0: float):
    """omega^2 |C|^2 — the flux up to the Newtonian-pinned constant."""
    C, omega = odd_circular_amplitude(l, m, r0)
    return omega**2 * abs(C) ** 2


# ---------------------------------------------------------------------------
# even parity
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def even_angular(l: int, m: int):
    """Even-parity harmonic data: equator values and projection norms.

    Basis (matches tools/rwz/derive_even.py): scalar Y; vector dY_A;
    tensor Z_AB = grad_A grad_B Y + (L/2) sigma_AB Y (traceless).
    """
    th, ph = _TH, _PH
    Y = sp.Ynm(l, m, th, ph).expand(func=True)
    lam_full = l * (l + 1)
    gam = {
        (th, ph, ph): -sp.sin(th) * sp.cos(th),
        (ph, th, ph): sp.cos(th) / sp.sin(th),
        (ph, ph, th): sp.cos(th) / sp.sin(th),
    }
    sig = {(th, th): sp.Integer(1), (ph, ph): sp.sin(th) ** 2, (th, ph): 0}

    def hess(a, b):
        expr = sp.diff(Y, a, b)
        for c in (th, ph):
            gg = gam.get((c, a, b), gam.get((c, b, a), 0))
            if gg != 0:
                expr -= gg * sp.diff(Y, c)
        return expr

    Z = {}
    for a in (th, ph):
        for b in (th, ph):
            s_ab = sig.get((a, b), sig.get((b, a), 0))
            Z[(a, b)] = sp.simplify(hess(a, b) + lam_full * s_ab * Y / 2)

    def sphere_integral(expr):
        expr = sp.simplify(sp.expand(expr, func=True))
        return complex(
            sp.integrate(
                sp.integrate(expr * sp.sin(th), (th, 0, sp.pi)),
                (ph, 0, 2 * sp.pi),
            )
        )

    s2 = sp.sin(th) ** 2
    N_Z = sphere_integral(
        Z[(th, th)] * sp.conjugate(Z[(th, th)])
        + 2 * Z[(th, ph)] * sp.conjugate(Z[(th, ph)]) / s2
        + Z[(ph, ph)] * sp.conjugate(Z[(ph, ph)]) / s2**2
    )
    eq = {th: sp.pi / 2, ph: 0}
    return {
        "Y_eq": complex(Y.subs(eq)),
        "dphY_eq": complex(sp.diff(Y, ph).subs(eq)),
        "Z_phph_eq": complex(Z[(ph, ph)].subs(eq)),
        "N_Z": N_Z.real,
    }


@functools.lru_cache(maxsize=None)
def _even_master_fns(l: int):
    """Lambdified S_even coefficient functions c(r) and c'(r) per source
    key, from the generated even-parity artifact (M = 1)."""
    from . import generated_even as gen

    lam_val = sp.Rational((l - 1) * (l + 2), 2)
    rsym, wsym, lsym = sp.Symbol("r"), sp.Symbol("omega"), sp.Symbol("lam")
    out = {}
    for key, srep in gen.S_EVEN.items():
        c = sp.sympify(srep).subs(lsym, lam_val)
        cf = sp.cancel(sp.together(c / (1 - 2 / rsym)))  # include 1/f of dr*
        out[key] = (
            sp.lambdify((rsym, wsym), cf, "numpy"),
            sp.lambdify((rsym, wsym), sp.diff(cf, rsym), "numpy"),
        )
    return out


def even_circular_amplitude(l: int, m: int, r0: float):
    """C_inf for the even-parity (l + m even) Zerilli master function
    psi = [r^2 K + (r - 2M) H1/(i omega)] / (lam r + 3M)   (DERIVED),
    circular orbit at r0 (M = 1, mu = 1)."""
    if (l + m) % 2 != 0:
        raise ValueError("even parity requires l + m even")
    if m == 0:
        raise ValueError("static (m = 0) modes carry no flux")
    Om, ut, E, Lz = circular_geodesic(r0)
    omega = m * Om
    ang = even_angular(l, m)
    lam_full = l * (l + 1)

    # lowered-index stress coefficients (u_t = -E, u_phi = Lz)
    pref = 1.0 / (ut * r0**2)
    c_tt = pref * E * E
    c_tv = pref * (-E) * Lz
    c_ff = pref * Lz * Lz

    q = {
        "Qtt": c_tt * np.conj(ang["Y_eq"]),
        "Qtv": c_tv * np.conj(ang["dphY_eq"]) / lam_full,
        "Qu": 0.5 * c_ff * np.conj(ang["Y_eq"]),
        "Qz": c_ff * np.conj(ang["Z_phph_eq"]) / ang["N_Z"],
    }

    hom = homogeneous_zerilli(l)
    X_in, dX_in_rs, *_ , W, Werr = hom.wronskian_and_fields(omega, [r0])
    if Werr > 1e-8:
        raise RuntimeError(f"Wronskian drift {Werr}")
    f0 = 1.0 - 2.0 / r0
    Xi = complex(X_in[0])
    dXi = complex(dX_in_rs[0]) / f0  # d/dr

    fns = _even_master_fns(l)
    total = 0.0 + 0.0j
    for (name, order), (cf, dcf) in fns.items():
        if name not in q or q[name] == 0:
            continue
        if order == 0:
            total += q[name] * Xi * cf(r0, omega)
        elif order == 1:
            total += -q[name] * (dXi * cf(r0, omega) + Xi * dcf(r0, omega))
        else:
            raise RuntimeError("unexpected source derivative order")
    return total / W, omega


def even_circular_flux_raw(l: int, m: int, r0: float):
    C, omega = even_circular_amplitude(l, m, r0)
    return omega**2 * abs(C) ** 2


if __name__ == "__main__":
    # Newtonian pinning check for (2,1): F_21 -> (32/5) x^5 * (1/36) x
    # (x = 1/r0 circular). The ratio raw/F must approach a CONSTANT K as
    # r0 -> inf; its 1/r0 slope is then compared against the 1PN series.
    for r0 in [50.0, 100.0, 200.0, 400.0, 800.0]:
        x = 1.0 / r0
        F_N = (32.0 / 5.0) * x**5 * (x / 36.0)
        raw = odd_circular_flux_raw(2, 1, r0)
        print(f"r0={r0:6.0f}  raw={raw:.6e}  F_N={F_N:.6e}  K={F_N/raw:.9e}")
