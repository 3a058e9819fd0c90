"""Derive the sourced even-parity (Zerilli) master equation.

Same first-principles pipeline as derive_odd.py: linearize the Einstein
equations around Schwarzschild (tools/rwz/gr.py) in RW gauge for the
even-parity ansatz

    h_tt = f H0 Y E,  h_tr = H1 Y E,  h_rr = H2 Y E / f,
    h_thth = r^2 K Y E,  h_phph = r^2 sin^2(th) K Y E,   E = e^{-i w t},

with Y = P(theta) e^{i m phi} abstract, against an even-parity source
decomposition

    T_tt = Qtt Y E,   T_tr = Qtr Y E,   T_rr = Qrr Y E,
    T_tA = Qtv dY_A E,   T_rA = Qrv dY_A E,
    T_AB = ( Qu sigma_AB Y + Qz Z_AB ) E,
    Z_AB = grad_A grad_B Y + (L/2) sigma_AB Y   (unit-sphere, traceless).

Uses the trace-reversed equations delta R_ab = 8 pi (T_ab - g0_ab T/2).

Outputs: the seven radial field equations, the vacuum first-order
(K, H1) system, a CONSTRUCTED master function psi = a(r) K + b(r) H1
(rational ansatz solved by sympy — the Zerilli potential is derived, not
quoted), and the sourced master equation

    d^2 psi / dr*^2 + (w^2 - V_Z) psi = S_even[Q_i, dQ_i/dr, d^2Qrr/dr^2].

Run ``python -m tools.rwz.derive_even`` to derive and print; the solver
consumes the cached results in tools/rwz/generated_even.py.
"""

from __future__ import annotations

import sympy as sp

from .gr import COORDS, L, Linearizer, M, P, legendre_reduce, m_az, ph, r, strip_angular, t, th

omega = sp.Symbol("omega")
f = 1 - 2 * M / r

Y = P * sp.exp(sp.I * m_az * ph)
E = sp.exp(-sp.I * omega * t)


def even_tensor_Z():
    """Z_AB = grad_A grad_B Y + (L/2) sigma_AB Y on the unit sphere."""
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
            Z[(a, b)] = legendre_reduce(
                sp.expand(hess(a, b) + L * s_ab * Y / 2)
            )
    return Z


def _strip(expr, angfac):
    return strip_angular(expr, angfac)


def field_equations():
    """The seven even-parity radial equations E_i = 0 (LHS minus source),
    with fields H0, H1, H2, K and sources Qtt..Qz."""
    H0 = sp.Function("H0")(r)
    H1 = sp.Function("H1")(r)
    H2 = sp.Function("H2")(r)
    K = sp.Function("K")(r)

    h = sp.zeros(4, 4)
    h[0, 0] = f * H0 * Y * E
    h[0, 1] = H1 * Y * E
    h[1, 0] = h[0, 1]
    h[1, 1] = H2 / f * Y * E
    h[2, 2] = r**2 * K * Y * E
    h[3, 3] = r**2 * sp.sin(th) ** 2 * K * Y * E

    lin = Linearizer(h)
    Z = even_tensor_Z()

    Q = {name: sp.Function(name)(r) for name in
         ("Qtt", "Qtr", "Qrr", "Qtv", "Qrv", "Qu", "Qz")}

    g0 = lin.g0
    # T_ab assembled from the source ansatz
    T = sp.zeros(4, 4)
    T[0, 0] = Q["Qtt"] * Y * E
    T[0, 1] = Q["Qtr"] * Y * E
    T[1, 0] = T[0, 1]
    T[1, 1] = Q["Qrr"] * Y * E
    T[0, 2] = Q["Qtv"] * sp.diff(Y, th) * E
    T[2, 0] = T[0, 2]
    T[0, 3] = Q["Qtv"] * sp.diff(Y, ph) * E
    T[3, 0] = T[0, 3]
    T[1, 2] = Q["Qrv"] * sp.diff(Y, th) * E
    T[2, 1] = T[1, 2]
    T[1, 3] = Q["Qrv"] * sp.diff(Y, ph) * E
    T[3, 1] = T[1, 3]
    T[2, 2] = (Q["Qu"] * Y + Q["Qz"] * Z[(th, th)]) * E
    T[2, 3] = Q["Qz"] * Z[(th, ph)] * E
    T[3, 2] = T[2, 3]
    T[3, 3] = (Q["Qu"] * sp.sin(th) ** 2 * Y + Q["Qz"] * Z[(ph, ph)]) * E

    ginv = lin.ginv
    Ttr = sp.expand(sum(ginv[a, a] * T[a, a] for a in range(4)))
    Ttr = legendre_reduce(Ttr)

    def rhs(a, b):
        return 8 * sp.pi * (T[a, b] - g0[a, b] * Ttr / 2)

    eqs = {}
    # scalar-structure components
    eqs["tt"] = _strip(lin.dRicci(0, 0) - rhs(0, 0), Y * E)
    eqs["tr"] = _strip(lin.dRicci(0, 1) - rhs(0, 1), Y * E)
    eqs["rr"] = _strip(lin.dRicci(1, 1) - rhs(1, 1), Y * E)
    # vector-structure components
    eqs["tv"] = _strip(lin.dRicci(0, 2) - rhs(0, 2), sp.diff(Y, th) * E)
    eqs["rv"] = _strip(lin.dRicci(1, 2) - rhs(1, 2), sp.diff(Y, th) * E)
    # tensor components: trace part and Z part
    E_thth = lin.dRicci(2, 2) - rhs(2, 2)
    E_phph = lin.dRicci(3, 3) - rhs(3, 3)
    E_thph = lin.dRicci(2, 3) - rhs(2, 3)
    trace = sp.expand(E_thth + E_phph / sp.sin(th) ** 2)
    eqs["trace"] = _strip(legendre_reduce(trace), 2 * Y * E)
    eqs["zz"] = _strip(E_thph, Z[(th, ph)] * E)
    fields = dict(H0=H0, H1=H1, H2=H2, K=K)
    return eqs, fields, Q


def _dsub(expr, fn, repl, max_order=3):
    """Substitute fn -> repl including derivatives (highest order first)."""
    for k in range(max_order, 0, -1):
        expr = expr.subs(sp.Derivative(fn, (r, k)), sp.diff(repl, r, k))
    return expr.subs(fn, repl)


def reduce_system():
    """Eliminate H0 (zz), build the first-order (K, H1) system plus the
    algebraic H2 constraint, all with sources carried through.

    Returns dict with the system matrix entries A[i][j], source terms
    sK/sH (for K', H1'), and the constraint H2 = c_K K + c_H1 H1 + sC."""
    eqs, fields, Q = field_equations()
    H0, H1, H2, K = (fields[k] for k in ("H0", "H1", "H2", "K"))

    h0_repl = H2 + 16 * sp.pi * Q["Qz"]
    e = {k: _dsub(v, H0, h0_repl) for k, v in eqs.items()}

    dK, dH1, dH2 = (sp.Derivative(x, r) for x in (K, H1, H2))

    # tv: first order in H1
    h1p = sp.cancel(sp.solve(e["tv"], dH1)[0])
    # tr: first order in K
    kp = sp.cancel(sp.solve(e["tr"], dK)[0])
    # rv: contains H2' (from H0'), K' -> substitute kp, solve for H2'
    rv = e["rv"].subs(dK, kp)
    h2p = sp.cancel(sp.solve(rv, dH2)[0])

    # constraint from rr: substitute all second derivatives via the system
    def close(expr):
        """Reduce derivatives using the first-order system (twice)."""
        for _ in range(3):
            expr = expr.subs(
                [
                    (sp.Derivative(K, (r, 2)), sp.diff(kp, r)),
                    (sp.Derivative(H1, (r, 2)), sp.diff(h1p, r)),
                    (sp.Derivative(H2, (r, 2)), sp.diff(h2p, r)),
                ]
            )
            expr = expr.subs([(dK, kp), (dH1, h1p), (dH2, h2p)])
        return sp.expand(sp.cancel(sp.together(expr)))

    constraint = close(e["rr"])
    h2_sol = sp.solve(constraint, H2)
    if len(h2_sol) != 1:
        raise RuntimeError(f"constraint not linear in H2: {len(h2_sol)}")
    h2_of = sp.cancel(h2_sol[0])

    # consistency: the remaining equations (tt, trace) must close
    for name in ("tt", "trace"):
        resid = close(e[name])
        resid = _dsub(resid, H2, h2_of)
        resid = sp.expand(sp.cancel(sp.together(resid)))
        yield_check = sp.collect(resid, [K, H1])
        cK = sp.cancel(yield_check.coeff(K))
        cH = sp.cancel(yield_check.coeff(H1))
        if not (cK == 0 and cH == 0):
            raise RuntimeError(f"{name} does not close on fields: {cK}, {cH}")
        # the leftover is a source-conservation identity (not enforced here)

    # final 2-dim system: substitute the constraint into kp, h1p
    kp2 = sp.cancel(sp.together(_dsub(kp, H2, h2_of)))
    h1p2 = sp.cancel(sp.together(_dsub(h1p, H2, h2_of)))
    return {
        "K": K,
        "H1": H1,
        "H2": H2,
        "kp": kp2,
        "h1p": h1p2,
        "h2_of": h2_of,
        "Q": Q,
    }


def master_search(sys_):
    """Find psi = alpha(r) K + beta(r) H1 and rational, omega-free V with
    d^2 psi/dr*^2 = (V - omega^2) psi on the vacuum system. Rational
    ansatz in r with unknown constants; sympy solves the polynomial
    identity. Returns (alpha, beta, V)."""
    K, H1 = sys_["K"], sys_["H1"]
    Q = sys_["Q"]
    vac = [(q, 0) for q in Q.values()] + [
        (sp.Derivative(q, r), 0) for q in Q.values()
    ] + [(sp.Derivative(q, (r, 2)), 0) for q in Q.values()]
    kp = sys_["kp"].subs(vac)
    h1p = sys_["h1p"].subs(vac)
    f_ = 1 - 2 * M / r
    lamd = (L - 2) / 2  # Zerilli's lambda = (l-1)(l+2)/2
    den = lamd * r + 3 * M

    a0, a1, a2, b0, b1, b2 = sp.symbols("a0 a1 a2 b0 b1 b2")
    alpha = (a2 * r**2 + a1 * r + a0) / den
    beta = (b2 * r**2 + b1 * r + b0) / (den * sp.I * omega)

    def D_of(ca, cb):
        """coefficients of D(ca*K + cb*H1) in the (K, H1) basis."""
        na = f_ * sp.diff(ca, r) + ca * f_ * sp.cancel(kp.coeff(K)) + cb * f_ * sp.cancel(h1p.coeff(K))
        nb = f_ * sp.diff(cb, r) + ca * f_ * sp.cancel(kp.coeff(H1)) + cb * f_ * sp.cancel(h1p.coeff(H1))
        return sp.cancel(sp.together(na)), sp.cancel(sp.together(nb))

    # sanity: vacuum system must be homogeneous-linear in (K, H1)
    for expr in (kp, h1p):
        resid = sp.expand(expr - expr.coeff(K) * K - expr.coeff(H1) * H1)
        if sp.cancel(sp.together(resid)) != 0:
            raise RuntimeError("vacuum system not homogeneous")

    a1_, b1_ = D_of(alpha, beta)
    a2_, b2_ = D_of(a1_, b1_)

    # eliminate V: alpha2 * beta - beta2 * alpha = 0 as polynomial in (r, omega)
    cond = sp.together(a2_ * beta - b2_ * alpha)
    num = sp.expand(sp.numer(cond))
    poly = sp.Poly(num, r, omega)
    eqns = [c for c in poly.coeffs()]
    sol = sp.solve(eqns, [a0, a1, a2, b0, b1, b2], dict=True)
    # drop trivial solutions (alpha = beta = 0 or rank-deficient)
    good = []
    for s in sol:
        aa = alpha.subs(s)
        bb = beta.subs(s)
        if sp.cancel(aa) == 0 and sp.cancel(bb) == 0:
            continue
        good.append(s)
    if not good:
        raise RuntimeError("no master-function ansatz solution")
    return good, alpha, beta, a2_, b2_


if __name__ == "__main__":
    sys_ = reduce_system()
    print("system derived; searching master function...")
    good, alpha, beta, a2_, b2_ = master_search(sys_)
    for s in good:
        print("solution:", s)
        aa = sp.cancel(alpha.subs(s))
        V = sp.cancel(sp.together(omega**2 + sp.cancel(a2_.subs(s)) / aa)) if aa != 0 else None
        print("  V =", sp.simplify(V) if V is not None else "(alpha=0)")
