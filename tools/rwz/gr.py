"""Symbolic GR core for the Regge-Wheeler/Zerilli derivation.

First-principles linearization of the Einstein tensor around the
Schwarzschild background, used by ``derive_odd.py`` / ``derive_even.py``
to obtain the sourced master equations WITHOUT transcribing literature
formulas: every radial ODE and source coefficient in the RWZ pipeline is
generated here from ``delta G_munu = 8 pi T_munu`` and then validated
against the published PN series (tests/test_rwz.py), giving the repo an
external, relativistic anchor for amplitudes and fluxes.

Reference parity: the reference engine consumes precomputed relativistic
Teukolsky amplitudes (reference Tutorial_FD_construction_single_mode.ipynb
cell 2, ``RomanAmplitude``; emri_pe.py:55-57). Those data files are not
redistributable, so this package *computes* the same physical content
(Schwarzschild point-particle perturbation amplitudes) from scratch.

Conventions: signature (-,+,+,+), G = c = 1, coordinates (t, r, theta,
phi). Angular dependence is kept ABSTRACT: the mode shape is
``Y = P(theta) exp(i m phi)`` with ``P`` an unevaluated function reduced
by the associated-Legendre ODE

    P'' = -cot(theta) P' + (m^2/sin^2(theta) - L) P ,   L = l(l+1),

so every derived radial equation holds for symbolic (l, m). The
linearized Ricci is the standard Lichnerowicz form

    delta R_mn = 1/2 g^{ab} ( D_a D_m h_bn + D_a D_n h_bm
                              - D_a D_b h_mn - D_m D_n h_ab )

with D the background covariant derivative; on the Ricci-flat background
delta G_mn = delta R_mn - 1/2 g0_mn g0^{ab} delta R_ab.
"""

from __future__ import annotations

import sympy as sp

t, r, th, ph = sp.symbols("t r theta phi")
M = sp.Symbol("M", positive=True)
L = sp.Symbol("Lam")  # l(l+1)
m_az = sp.Symbol("m", integer=True)
COORDS = (t, r, th, ph)

P = sp.Function("P")(th)


def legendre_reduce(expr):
    """Eliminate all theta-derivatives of P of order >= 2 via the
    associated-Legendre ODE, then cancel."""
    rule = -sp.cot(th) * sp.Derivative(P, th) + (
        m_az**2 / sp.sin(th) ** 2 - L
    ) * P
    # replace highest orders first; repeated single-order substitution
    for order in (4, 3, 2):
        d = sp.Derivative(P, (th, order))
        if expr.has(d):
            expr = expr.subs(d, sp.diff(rule, th, order - 2).doit())
            # the substitution can reintroduce lower high-order derivatives
            expr = legendre_reduce(expr)
            return expr
    return expr


def strip_angular(expr, angfac):
    """Divide a field-equation component by its angular factor and verify
    the quotient is purely radial. Cheap deterministic pipeline (no
    sp.simplify): rewrite cot/tan, cancel the rational structure, reduce
    P-derivatives by the Legendre ODE, eliminate cos^2."""
    q = sp.expand(expr) / angfac
    q = q.subs(sp.cot(th), sp.cos(th) / sp.sin(th)).subs(
        sp.tan(th), sp.sin(th) / sp.cos(th)
    )
    q = sp.cancel(sp.together(q))
    q = legendre_reduce(q)
    q = sp.expand(q)
    c2 = sp.cos(th) ** 2
    for _ in range(6):
        if q.has(sp.cos(th)):
            q = sp.expand(q.subs(c2, 1 - sp.sin(th) ** 2))
        else:
            break
    q = sp.cancel(sp.together(q))
    bad = [s for s in (th, ph, t) if q.has(s)]
    if q.has(P):
        bad.append("P")
    if bad:
        raise RuntimeError(f"non-radial remainder {bad}: {q}")
    return q


def schwarzschild_metric():
    f = 1 - 2 * M / r
    return sp.diag(-f, 1 / f, r**2, r**2 * sp.sin(th) ** 2)


class Linearizer:
    """Lazy, memoized linearized curvature around Schwarzschild."""

    def __init__(self, h: sp.Matrix):
        self.h = h
        self.g0 = schwarzschild_metric()
        self.ginv = self.g0.inv()
        self.gam = self._christoffel()
        self._dh = {}
        self._ddh = {}

    def _christoffel(self):
        g, ginv = self.g0, self.ginv
        gam = [[[sp.S.Zero] * 4 for _ in range(4)] for _ in range(4)]
        for a in range(4):
            for b in range(4):
                for c in range(b, 4):
                    expr = sp.S.Zero
                    for d in range(4):
                        if ginv[a, d] == 0:
                            continue
                        expr += ginv[a, d] * (
                            sp.diff(g[d, b], COORDS[c])
                            + sp.diff(g[d, c], COORDS[b])
                            - sp.diff(g[b, c], COORDS[d])
                        )
                    expr = sp.cancel(expr / 2)
                    gam[a][b][c] = expr
                    gam[a][c][b] = expr
        return gam

    def dh(self, c, a, b):
        """D_c h_ab."""
        if a > b:
            a, b = b, a
        key = (c, a, b)
        if key not in self._dh:
            expr = sp.diff(self.h[a, b], COORDS[c])
            for d in range(4):
                expr -= (
                    self.gam[d][c][a] * self.h[d, b]
                    + self.gam[d][c][b] * self.h[a, d]
                )
            self._dh[key] = expr
        return self._dh[key]

    def ddh(self, d, c, a, b):
        """D_d D_c h_ab."""
        key = (d, c, a, b)
        if key not in self._ddh:
            expr = sp.diff(self.dh(c, a, b), COORDS[d])
            for e in range(4):
                if self.gam[e][d][c] != 0:
                    expr -= self.gam[e][d][c] * self.dh(e, a, b)
                if self.gam[e][d][a] != 0:
                    expr -= self.gam[e][d][a] * self.dh(c, e, b)
                if self.gam[e][d][b] != 0:
                    expr -= self.gam[e][d][b] * self.dh(c, a, e)
            self._ddh[key] = expr
        return self._ddh[key]

    def htrace(self):
        return sp.cancel(
            sum(self.ginv[a, a] * self.h[a, a] for a in range(4))
        )

    def hess_trace(self, m_, n_):
        """D_m D_n of the scalar trace."""
        htr = self.htrace()
        if htr == 0:
            return sp.S.Zero
        expr = sp.diff(htr, COORDS[m_], COORDS[n_])
        for d in range(4):
            if self.gam[d][m_][n_] != 0:
                expr -= self.gam[d][m_][n_] * sp.diff(htr, COORDS[d])
        return expr

    def dRicci(self, m_, n_):
        """delta R_{mn}."""
        expr = sp.S.Zero
        for a in range(4):
            ia = self.ginv[a, a]  # diagonal background
            expr += ia * (
                self.ddh(a, m_, a, n_)
                + self.ddh(a, n_, a, m_)
                - self.ddh(a, a, m_, n_)
            )
        expr = (expr - self.hess_trace(m_, n_)) / 2
        return legendre_reduce(sp.expand(expr))

    def dRicci_trace(self):
        return sp.cancel(
            sp.together(
                sum(self.ginv[a, a] * self.dRicci(a, a) for a in range(4))
            )
        )

    def dEinstein(self, m_, n_, dRtr=None):
        """delta G_{mn}; pass a precomputed dRicci_trace for diagonal
        components (off-diagonal components never need it on this
        diagonal background)."""
        dR = self.dRicci(m_, n_)
        if m_ != n_:
            return dR
        if dRtr is None:
            dRtr = self.dRicci_trace()
        return dR - self.g0[m_, n_] * dRtr / 2
