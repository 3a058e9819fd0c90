"""Derive the sourced odd-parity (Regge-Wheeler) master equation.

From ``delta G_ab = 8 pi T_ab`` (tools/rwz/gr.py linearization, no
literature transcription), in RW gauge, for symbolic (l, m, omega):

  * the three odd-parity radial field equations,
  * the vacuum reduction to  d^2 psi/dr*^2 + (omega^2 - V_RW) psi = 0
    with psi = f h1 / r  (the RW potential is DERIVED and returned),
  * the sourced master equation

        d^2 psi/dr*^2 + (omega^2 - V_RW) psi = S_odd(r),
        S_odd = c_r(r) * Sr(r) + c_s(r) * Ss(r) + c_sp(r) * dSs/dr,

    where Sr, Ss are the odd vector/tensor harmonic projections of the
    stress tensor (T_rB and T_AB respectively; the T_tB projection is
    redundant by stress-energy conservation).

Angular basis (computed, not quoted): odd vector xi_A = (-csc(th) dY/dph,
sin(th) dY/dth); odd tensor S_AB = sym. covariant derivative of xi on the
unit sphere. Projection norms: int sigma^{AB} xi_A conj(xi_B) dOmega = L,
int S_AB conj(S^{AB}) dOmega computed per (l, m) by the solver.

Run ``python tools/rwz/derive_odd.py`` to print and cache the results.
"""

from __future__ import annotations

import sympy as sp

from .gr import COORDS, L, Linearizer, M, P, legendre_reduce, m_az, ph, r, strip_angular, t, th

omega = sp.Symbol("omega")
f = 1 - 2 * M / r


def odd_basis():
    """Odd vector xi_A and tensor S_AB = sym cov deriv of xi on S^2."""
    Y = P * sp.exp(sp.I * m_az * ph)
    xi = {
        th: -sp.diff(Y, ph) / sp.sin(th),
        ph: sp.sin(th) * sp.diff(Y, th),
    }
    # unit-sphere Christoffels: Gamma^th_phph = -sin cos, Gamma^ph_thph = cot
    gam = {
        (th, ph, ph): -sp.sin(th) * sp.cos(th),
        (ph, th, ph): sp.cos(th) / sp.sin(th),
        (ph, ph, th): sp.cos(th) / sp.sin(th),
    }

    def covd(a, b):
        expr = sp.diff(xi[b], a)
        for (u, v, w_), g in gam.items():
            if (v, w_) == (a, b) or (w_, v) == (a, b):
                pass
        # explicit: nabla_a xi_b = d_a xi_b - Gamma^c_{ab} xi_c
        for c in (th, ph):
            gg = gam.get((c, a, b), 0)
            if gg != 0:
                expr -= gg * xi[c]
        return expr

    S = {}
    for a in (th, ph):
        for b in (th, ph):
            S[(a, b)] = legendre_reduce(
                sp.expand((covd(a, b) + covd(b, a)) / 2)
            )
    return xi, S


def _strip(expr, angfac):
    return strip_angular(expr, angfac)


def derive():
    E = sp.exp(-sp.I * omega * t)
    h0 = sp.Function("h0")(r)
    h1 = sp.Function("h1")(r)
    xi, S = odd_basis()

    h = sp.zeros(4, 4)
    for i, field in ((0, h0), (1, h1)):
        h[i, 2] = field * xi[th] * E
        h[2, i] = h[i, 2]
        h[i, 3] = field * xi[ph] * E
        h[3, i] = h[i, 3]

    lin = Linearizer(h)

    # sources: same angular structures, radial coefficients St, Sr, Ss
    St = sp.Function("St")(r)
    Sr = sp.Function("Sr")(r)
    Ss = sp.Function("Ss")(r)

    # field equations, angular factor stripped (odd parity => dG = dR on
    # off-diagonal components of the diagonal background)
    eq_t = _strip(lin.dRicci(0, 2), xi[th] * E) - 8 * sp.pi * St
    eq_r = _strip(lin.dRicci(1, 2), xi[th] * E) - 8 * sp.pi * Sr
    eq_s = _strip(lin.dRicci(2, 3), S[(th, ph)] * E) - 8 * sp.pi * Ss

    # --- reduction: eq_s is first order (h0, h1, h1'); solve for h0 ---
    h0_sol = sp.solve(eq_s, h0)
    if len(h0_sol) != 1:
        raise RuntimeError("eq_s not linear in h0")
    h0_of = sp.cancel(h0_sol[0])

    ode2 = eq_r.subs(
        [(sp.Derivative(h0, r), sp.diff(h0_of, r)), (h0, h0_of)]
    )
    ode2 = sp.expand(sp.cancel(sp.together(ode2)))

    # --- master variable psi = f h1 / r  =>  h1 = r psi / f ---
    psi = sp.Function("psi")(r)
    ode_psi = ode2.subs(h1, r * psi / f).doit()
    ode_psi = sp.expand(sp.cancel(sp.together(ode_psi)))

    # normalize to  f (f psi')' + (omega^2 - V) psi = S_odd
    c2 = ode_psi.coeff(sp.Derivative(psi, (r, 2)))
    scale = f**2 / c2
    ode_n = sp.expand(sp.cancel(ode_psi * scale))

    c1 = sp.cancel(ode_n.coeff(sp.Derivative(psi, r)))
    if sp.simplify(c1 - f * sp.diff(f, r)) != 0:
        raise RuntimeError(f"first-derivative term is not f f': {c1}")

    c0 = sp.cancel(ode_n.coeff(psi))
    V = sp.simplify(omega**2 - c0)

    # residual = source side:  f(f psi')' + (omega^2 - V) psi - ode_n
    src = sp.expand(
        f * sp.diff(f * sp.Derivative(psi, r), r).doit()
        + (omega**2 - V) * psi
        - ode_n
    )
    src = sp.collect(
        sp.expand(src), [Sr, Ss, sp.Derivative(Sr, r), sp.Derivative(Ss, r)]
    )
    if src.has(psi) or src.has(St):
        raise RuntimeError(f"source side still has fields: {src}")

    c_r = sp.simplify(src.coeff(Sr))
    c_s = sp.simplify(src.coeff(Ss))
    c_sp = sp.simplify(src.coeff(sp.Derivative(Sr, r)))
    c_ssp = sp.simplify(src.coeff(sp.Derivative(Ss, r)))
    rem = sp.simplify(
        src
        - c_r * Sr
        - c_s * Ss
        - c_sp * sp.Derivative(Sr, r)
        - c_ssp * sp.Derivative(Ss, r)
    )
    if rem != 0:
        raise RuntimeError(f"unparsed source remainder: {rem}")

    return {
        "V": V,
        "h0_of": h0_of,  # h0 in terms of h1, h1', Ss (gauge reconstruction)
        "src_Sr": c_r,
        "src_Ss": c_s,
        "src_dSr": c_sp,
        "src_dSs": c_ssp,
        "eq_t": eq_t,
    }


if __name__ == "__main__":
    res = derive()
    lam = sp.Symbol("Lam")
    print("V_RW derived:")
    sp.pprint(sp.collect(sp.expand(res["V"]), 1 / r))
    V_expected = (1 - 2 * M / r) * (lam / r**2 - 6 * M / r**3)
    print("matches f*(l(l+1)/r^2 - 6M/r^3):",
          sp.simplify(res["V"] - V_expected) == 0)
    for k in ("src_Sr", "src_Ss", "src_dSr", "src_dSs"):
        print(k, "=", res[k])
