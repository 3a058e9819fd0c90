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


def _rat_point(seed=0):
    """Exact rational substitution point for identity checks."""
    pts = [
        {r: sp.Rational(17, 5), omega: sp.Rational(3, 7), L: sp.Rational(23, 2), M: 1},
        {r: sp.Rational(29, 9), omega: sp.Rational(5, 11), L: sp.Rational(31, 3), M: 1},
        {r: sp.Rational(41, 7), omega: sp.Rational(2, 13), L: sp.Rational(47, 5), M: 1},
    ]
    return pts[seed % len(pts)]


def darboux_partner():
    """Construct the even-parity (Zerilli) potential as the Darboux
    partner of the DERIVED Regge-Wheeler potential: find rational W(r)
    and constant kappa with

        V_RW = W^2 - f dW/dr + kappa ,  then  V_Z = W^2 + f dW/dr + kappa.

    (Chandrasekhar isospectrality, derived here by ansatz-solving, not
    quoted.) Returns (V_Z, W, kappa)."""
    f_ = 1 - 2 * M / r
    V_RW = f_ * (L / r**2 - 6 * M / r**3)
    lamd = (L - 2) / 2
    ws = sp.symbols("w0:4")
    kap = sp.Symbol("kappa")
    W = sum(ws[k] * r**k for k in range(4)) / (r**2 * (lamd * r + 3 * M))
    cond = V_RW - (W**2 - f_ * sp.diff(W, r) + kap)
    num = sp.expand(sp.numer(sp.together(cond)))
    sols = sp.solve(sp.Poly(num, r).coeffs(), list(ws) + [kap], dict=True)
    if len(sols) != 1:
        raise RuntimeError(f"Darboux ansatz: {len(sols)} solutions")
    s = sols[0]
    Ws = sp.cancel(W.subs(s))
    V_Z = sp.cancel(sp.together(Ws**2 + f_ * sp.diff(Ws, r) + s[kap]))
    return V_Z, Ws, sp.simplify(s[kap])


_QNAMES = ("Qtt", "Qtr", "Qrr", "Qtv", "Qrv", "Qu", "Qz")
_MAX_DQ = 4


def _basis_terms(K, H1, Q, with_H2=None):
    """Ordered (key, sympy term) extraction basis: highest source
    derivatives first, then fields."""
    terms = []
    for name in _QNAMES:
        q = Q[name]
        for k in range(_MAX_DQ, 0, -1):
            terms.append(((name, k), sp.Derivative(q, (r, k))))
        terms.append(((name, 0), q))
    if with_H2 is not None:
        terms.append(("H2", with_H2))
    terms.append(("K", K))
    terms.append(("H1", H1))
    return terms


def to_linform(expr, K, H1, Q, with_H2=None):
    """Decompose an expanded expression as a dict key -> rational coeff
    over the (K, H1[, H2], d^k Q_i) basis; verifies exact completeness."""
    expr = sp.expand(expr)
    out = {}
    for key, term in _basis_terms(K, H1, Q, with_H2):
        c = expr.coeff(term)
        if c != 0:
            out[key] = sp.cancel(sp.together(c))
            expr = sp.expand(expr - c * term)
    if expr != 0:
        resid = sp.cancel(sp.together(expr))
        if resid != 0:
            raise RuntimeError(f"linform remainder: {resid}")
    return out


def lf_scale(lf, s):
    return {k: sp.cancel(sp.together(v * s)) for k, v in lf.items()}


def lf_add(*lfs):
    out = {}
    for lf in lfs:
        for k, v in lf.items():
            out[k] = out.get(k, 0) + v
    return {k: sp.cancel(sp.together(v)) for k, v in out.items() if sp.cancel(v) != 0}


def lf_subs_H2(lf, h2lf):
    """Replace the 'H2' entry by its constraint linform."""
    if "H2" not in lf:
        return dict(lf)
    c = lf.pop("H2") if False else lf["H2"]
    base = {k: v for k, v in lf.items() if k != "H2"}
    return lf_add(base, lf_scale(h2lf, c))


def lf_D(lf, sysK, sysH1):
    """Apply D = f d/dr to a linform over (K, H1, d^k Q): differentiate
    coefficients, shift source-derivative orders, and close K', H1'
    through the system linforms sysK (for K') and sysH1 (for H1')."""
    f_ = 1 - 2 * M / r
    out = {}

    def acc(key, val):
        out[key] = out.get(key, 0) + val

    for key, c in lf.items():
        dc = f_ * sp.diff(c, r)
        acc(key, dc)
        if key == "K":
            for k2, v2 in sysK.items():
                acc(k2, f_ * c * v2)
        elif key == "H1":
            for k2, v2 in sysH1.items():
                acc(k2, f_ * c * v2)
        else:
            name, order = key
            if order + 1 > _MAX_DQ:
                raise RuntimeError("source derivative order overflow")
            acc((name, order + 1), f_ * c)
    return {k: sp.cancel(sp.together(v)) for k, v in out.items() if sp.cancel(v) != 0}


def reduce_system(eqs=None, fields=None, Q=None):
    """Eliminate H0 (zz), close the first-order (K, H1) system plus the
    algebraic H2 constraint, sources carried through — all in linform
    (coefficient-space) representation to avoid monolithic gcd blowups."""
    if eqs is None:
        eqs, fields, Q = field_equations()
    H0, H1, H2, K = (fields[k] for k in ("H0", "H1", "H2", "K"))

    h0_repl = H2 + 16 * sp.pi * Q["Qz"]
    e = {k: sp.expand(_dsub(v, H0, h0_repl)) for k, v in eqs.items()}

    dK, dH1, dH2 = (sp.Derivative(x, r) for x in (K, H1, H2))

    def lin_solve_raw(expr, target):
        expr = sp.expand(expr)
        c = expr.coeff(target)
        rest = sp.expand(expr - c * target)
        if rest.has(target):
            raise RuntimeError(f"not linear in {target}")
        return sp.expand(sp.cancel(sp.together(-rest / c)))

    h1p = lin_solve_raw(e["tv"], dH1)
    kp = lin_solve_raw(e["tr"], dK)
    h2p = lin_solve_raw(sp.expand(e["rv"].subs(dK, kp)), dH2)

    def close(expr):
        for _ in range(3):
            expr = expr.subs(
                [
                    (sp.Derivative(K, (r, 2)), sp.diff(kp, r)),
                    (sp.Derivative(H1, (r, 2)), sp.diff(h1p, r)),
                    (sp.Derivative(H2, (r, 2)), sp.diff(h2p, r)),
                ]
            )
            expr = sp.expand(expr.subs([(dK, kp), (dH1, h1p), (dH2, h2p)]))
        return expr

    # constraint: closed rr equation, solved for H2 in linform space
    constraint = to_linform(close(e["rr"]), K, H1, Q, with_H2=H2)
    cH2 = constraint.pop("H2")
    h2lf = {k: sp.cancel(sp.together(-v / cH2)) for k, v in constraint.items()}

    # first-order system in linform space, H2 eliminated
    sysK = lf_subs_H2(to_linform(kp, K, H1, Q, with_H2=H2), h2lf)
    sysH1 = lf_subs_H2(to_linform(h1p, K, H1, Q, with_H2=H2), h2lf)

    # vacuum closure of the unused equations at exact rational points
    for name in ("tt", "trace"):
        lf = lf_subs_H2(to_linform(close(e[name]), K, H1, Q, with_H2=H2), h2lf)
        for seed in range(2):
            pt = _rat_point(seed)
            for fkey in ("K", "H1"):
                val = sp.cancel(sp.together(lf.get(fkey, 0)).subs(pt))
                if val != 0:
                    raise RuntimeError(f"{name} does not close: {fkey} {val}")

    return {
        "K": K,
        "H1": H1,
        "sysK": sysK,
        "sysH1": sysH1,
        "h2lf": h2lf,
        "Q": Q,
    }


def _vacuum_subs(Q):
    out = []
    for q in Q.values():
        out.append((sp.Derivative(q, (r, 2)), 0))
        out.append((sp.Derivative(q, r), 0))
        out.append((q, 0))
    return out


lam = sp.Symbol("lam")  # Zerilli lambda = (l-1)(l+2)/2
_M1LAM = {M: 1, L: 2 * lam + 2}


def master_even(sys_, V_Z):
    """Construct psi = alpha(r) K + beta(r) H1 with

        D^2 psi + (omega^2 - V_Z) psi = S_even   (D = f d/dr)

    on the reduced linform system. Works in M = 1 units with
    lambda = (l-1)(l+2)/2 and the REAL field pair (K, Ht = H1/(i omega))
    — in that representation the vacuum 2x2 system is real and rational
    in omega^2, which keeps sympy's gcds tractable. Linear ansatz solve
    against the KNOWN Darboux potential, then the sourced pass extracts
    S_even as a linform over the d^k Q_i.

    Returns (alpha, beta, S_even_linform) with alpha, beta the
    coefficients of (K, H1) — beta carries the 1/(i omega)."""
    iw = sp.I * omega
    sysK = {k: sp.sympify(v).subs(_M1LAM) for k, v in sys_["sysK"].items()}
    sysH1 = {k: sp.sympify(v).subs(_M1LAM) for k, v in sys_["sysH1"].items()}
    V_Z = sp.cancel(V_Z.subs(_M1LAM))
    f_ = 1 - 2 / r

    # real-form rows: K' and Ht' in the (K, Ht) basis, sources carried
    # (source coefficients may be complex — they never enter the
    # composition chain at depth, only ride it)
    rowK = {"K": sp.cancel(sysK["K"]), "Ht": sp.cancel(sp.expand(sysK["H1"] * iw))}
    rowH = {"K": sp.cancel(sp.expand(sysH1["K"] / iw)), "Ht": sp.cancel(sysH1["H1"])}
    srcK = {k: v for k, v in sysK.items() if k not in ("K", "H1")}
    srcH = {k: sp.cancel(sp.expand(v / iw)) for k, v in sysH1.items() if k not in ("K", "H1")}

    def D(lf):
        """D = f d/dr on {field/source-key: coeff} closing K', Ht'."""
        out = {}

        def acc(k, v):
            out[k] = out.get(k, 0) + v

        for key, c in lf.items():
            acc(key, f_ * sp.diff(c, r))
            if key in ("K", "Ht"):
                row = rowK if key == "K" else rowH
                src = srcK if key == "K" else srcH
                for k2, v2 in row.items():
                    acc(k2, f_ * c * v2)
                for k2, v2 in src.items():
                    acc(k2, f_ * c * v2)
            else:
                name, order = key
                if order + 1 > _MAX_DQ:
                    raise RuntimeError("source derivative overflow")
                acc((name, order + 1), f_ * c)
        return {k: sp.cancel(sp.together(v)) for k, v in out.items()}

    den = lam * r + 3
    a0, a1, a2, b0, b1, b2 = unknowns = sp.symbols("a0 a1 a2 b0 b1 b2")
    basis = [
        ("K", 1 / den, a0),
        ("K", r / den, a1),
        ("K", r**2 / den, a2),
        ("Ht", 1 / den, b0),
        ("Ht", r / den, b1),
        ("Ht", r**2 / den, b2),
    ]
    condK = sp.S.Zero
    condH = sp.S.Zero
    for fld, c, u in basis:
        lf2 = D(D({fld: c}))
        extraK = (omega**2 - V_Z) * c if fld == "K" else 0
        extraH = (omega**2 - V_Z) * c if fld == "Ht" else 0
        condK += u * sp.together(lf2.get("K", 0) + extraK)
        condH += u * sp.together(lf2.get("Ht", 0) + extraH)
    eqns = []
    for cond in (condK, condH):
        num = sp.expand(sp.numer(sp.together(cond)))
        eqns.extend(sp.Poly(num, r, omega).coeffs())
    sol = sp.solve(eqns, list(unknowns), dict=True)
    sol = [s for s in sol if any(sp.cancel(sp.S(v)) != 0 for v in s.values())
           or any(u not in s for u in unknowns)]
    if len(sol) != 1:
        raise RuntimeError(f"master ansatz: {len(sol)} solutions")
    s = sol[0]
    subs_norm = {u: 1 for u in unknowns if u not in s}
    coeffs = {}
    for fld, c, u in basis:
        val = sp.S(s.get(u, u)).subs(subs_norm).subs(s).subs(subs_norm)
        coeffs[fld] = coeffs.get(fld, 0) + val * c
    alpha_K = sp.cancel(coeffs["K"])
    alpha_H = sp.cancel(coeffs["Ht"])
    if alpha_K == 0 and alpha_H == 0:
        raise RuntimeError("trivial master solution")

    # sourced pass: S_even = D^2 psi + (w^2 - V_Z) psi; field parts vanish
    lf = {"K": alpha_K, "Ht": alpha_H}
    lf2 = D(D(lf))
    resK = sp.cancel(sp.together(lf2.pop("K", 0) + (omega**2 - V_Z) * alpha_K))
    resH = sp.cancel(sp.together(lf2.pop("Ht", 0) + (omega**2 - V_Z) * alpha_H))
    if resK != 0 or resH != 0:
        raise RuntimeError(f"field residue: {resK}, {resH}")
    S_even = {k: sp.cancel(sp.together(v)) for k, v in lf2.items()
              if sp.cancel(v) != 0}
    beta = sp.cancel(alpha_H / iw)  # coefficient of H1 proper
    return alpha_K, beta, S_even


def derive(eqs=None, fields=None, Q=None):
    """Full even-parity derivation. Returns dict with V_Z, the master
    combination (alpha, beta), the source linform S_even (keys
    (Qname, derivative_order) -> rational coefficient in r), and the H2
    reconstruction linform."""
    V_Z, W, kappa = darboux_partner()
    sys_ = reduce_system(eqs, fields, Q)
    alpha, beta, S_even = master_even(sys_, V_Z)
    return {
        "V_Z": V_Z,
        "W": W,
        "kappa": kappa,
        "alpha": alpha,
        "beta": beta,
        "S_even": S_even,
        "h2lf": sys_["h2lf"],
        "Q": sys_["Q"],
        "K": sys_["K"],
        "H1": sys_["H1"],
    }


if __name__ == "__main__":
    res = derive()
    print("V_Z =", res["V_Z"])
    print("alpha =", res["alpha"])
    print("beta =", res["beta"])
    for key in sorted(res["S_even"]):
        print(f"S_even[{key}] =", res["S_even"][key])
