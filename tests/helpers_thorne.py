"""Spectrally-exact Thorne-4.8 brute-force waveform (test ground truth).

Compact version of the machinery in ``tools/derive_multipoles.py``: the
l <= 4 radiative field (mass quadrupole/octupole/hexadecapole + current
quadrupole/octupole) assembled from exact torus Fourier series of the STF
moments of the geodesic orbit, contracted against the null polarization
(h = h_+ - i h_x = (1/2) w^j w^k h_jk). Wholly independent of
``models.amplitude``'s mode machinery — shares only the geodesic orbit.
"""

import numpy as np
import jax.numpy as jnp

from emri_frequencydomainwaveforms_tpu.models.geodesic import darwin_orbit

N_CHI = 2048
N_MAX = 40
AX = "xyz"


def orbit_data(p, e):
    orb = darwin_orbit(jnp.float64(p), jnp.float64(e), n_chi=N_CHI)
    chi = np.asarray(orb["chi"])
    r = np.asarray(orb["r"])
    t = np.asarray(orb["t"])
    phi = np.asarray(orb["phi"])
    t_r = float(orb["T_r"])
    om_r = 2 * np.pi / t_r
    om_phi = float(orb["Dphi"]) / t_r
    ecos = e * np.cos(chi)
    rad = p - 6.0 - 2.0 * ecos
    dt_dchi = (
        p * p * np.sqrt((p - 2.0) ** 2 - 4.0 * e * e)
        / ((p - 2.0 - 2.0 * ecos) * (1.0 + ecos) ** 2 * np.sqrt(rad))
    )
    return dict(
        r=r,
        dphi=phi - om_phi * t,
        w=dt_dchi * (2 * np.pi / N_CHI) / t_r,
        th=om_r * t,
        om_r=om_r,
        om_phi=om_phi,
        ell=r**2 * np.sqrt(p / rad) / dt_dchi,
    )


class Torus:
    def __init__(self, comps):
        self.c = dict(comps)

    def __mul__(self, other):
        if isinstance(other, Torus):
            out = {}
            for m1, a in self.c.items():
                for m2, b in other.c.items():
                    out[m1 + m2] = out.get(m1 + m2, 0) + a * b
            return Torus(out)
        return Torus({m: a * other for m, a in self.c.items()})

    __rmul__ = __mul__

    def __add__(self, other):
        out = dict(self.c)
        for m, a in other.c.items():
            out[m] = out.get(m, 0) + a
        return Torus(out)

    def __sub__(self, other):
        return self + (-1.0) * other

    def coeffs(self, od):
        basis = np.exp(-1j * np.arange(-N_MAX, N_MAX + 1)[:, None] * od["th"][None, :])
        return {m: (basis * (od["w"] * g)[None, :]).sum(axis=1) for m, g in self.c.items()}


def _delta(a, b):
    return 1.0 if a == b else 0.0


# ---- generic STF machinery for the l = 5, 6 terms (mirrors
# tools/derive_multipoles.py; trace-removal coefficients solved numerically
# per rank so no hand bookkeeping) ----
import itertools as _it
import math as _math
from functools import lru_cache as _lru


def _pair_partitions(positions, k):
    positions = tuple(positions)
    if k == 0:
        return [((), positions)]
    if len(positions) < 2 * k:
        return []
    out = []
    first, rest = positions[0], positions[1:]
    for pairs, rem in _pair_partitions(rest, k):
        out.append((pairs, (first,) + rem))
    for i in range(len(rest)):
        pair = (first, rest[i])
        rr = rest[:i] + rest[i + 1:]
        for pairs, rem in _pair_partitions(rr, k - 1):
            out.append(((pair,) + pairs, rem))
    return out


def _sym_delta_term(u, s, k, idx):
    parts = _pair_partitions(tuple(range(s)), k)
    total = None
    cnt = 0
    for pairs, rem in parts:
        cnt += 1
        if not all(idx[a] == idx[b] for a, b in pairs):
            continue
        val = u[tuple(idx[i] for i in rem)]
        total = val if total is None else total + val
    if total is None:
        return None
    return (1.0 / cnt) * total


def _tensor_traces(T, s, k):
    out = T
    rank = s
    for _ in range(k):
        nxt = {}
        for idx in _it.product(AX, repeat=rank - 2):
            acc = None
            for a in AX:
                v = out[idx + (a, a)]
                acc = v if acc is None else acc + v
            nxt[idx] = acc
        out = nxt
        rank -= 2
    return out


def _distinct_perms(key):
    """All distinct permutations of a (possibly repeating) tuple."""
    if not key:
        yield ()
        return
    seen = set()
    for i, a in enumerate(key):
        if a in seen:
            continue
        seen.add(a)
        for rest in _distinct_perms(key[:i] + key[i + 1:]):
            yield (a,) + rest


@_lru(maxsize=None)
def _stf_coeffs(s):
    rng = np.random.default_rng(12345)
    raw = rng.standard_normal((3,) * s)
    sym = np.zeros_like(raw)
    for perm in _it.permutations(range(s)):
        sym += np.transpose(raw, perm)
    sym /= _math.factorial(s)
    tdict = {
        idx: sym[tuple(AX.index(a) for a in idx)]
        for idx in _it.product(AX, repeat=s)
    }
    kmax = s // 2
    trs = [_tensor_traces(tdict, s, k) for k in range(kmax + 1)]
    rows, rhs = [], []
    # sorted leads only: permutations of a lead give the identical trace
    # condition on a symmetric tensor (round-5 rank-9/10 speedup, same as
    # tools/derive_multipoles.py)
    for lead in _it.combinations_with_replacement(AX, s - 2):
        coef = np.zeros(kmax)
        base = 0.0
        for a in AX:
            idx = lead + (a, a)
            base += tdict[idx]
            for k in range(1, kmax + 1):
                v = _sym_delta_term(trs[k], s, k, idx)
                if v is not None:
                    coef[k - 1] += v
        rows.append(coef)
        rhs.append(-base)
    c, *_ = np.linalg.lstsq(np.array(rows), np.array(rhs), rcond=None)
    assert np.abs(np.array(rows) @ c - np.array(rhs)).max() < 1e-10
    return tuple(c)


def _stf(T, s):
    cks = _stf_coeffs(s)
    trs = [None] + [_tensor_traces(T, s, k) for k in range(1, s // 2 + 1)]
    out = {}
    # evaluate at sorted index tuples, mirror to distinct permutations
    # (symmetric input => symmetric STF; round-5 rank-9/10 speedup)
    for key in _it.combinations_with_replacement(AX, s):
        val = T[key]
        for k in range(1, s // 2 + 1):
            v = _sym_delta_term(trs[k], s, k, key)
            if v is not None:
                val = val + cks[k - 1] * v
        for perm in _distinct_perms(key):
            out[perm] = val
    return out


def thorne_h(p, e, theta, phi_v, t_grid,
             terms=("T1", "T2", "T3", "T4", "T5", "T6")):
    """h_+ - i h_x from the selected Thorne-4.8 terms, mu/D stripped."""
    od = orbit_data(p, e)
    r, dphi, ell = od["r"], od["dphi"], od["ell"]
    E = np.exp(1j * dphi)
    zero = Torus({})
    xv = {
        "x": Torus({+1: 0.5 * r * E, -1: 0.5 * r * np.conj(E)}),
        "y": Torus({+1: -0.5j * r * E, -1: +0.5j * r * np.conj(E)}),
        "z": zero,
    }
    Lv = {"x": zero, "y": zero, "z": Torus({0: ell})}
    rsq = Torus({0: r * r})

    ct, st = np.cos(theta), np.sin(theta)
    cp, sp = np.cos(phi_v), np.sin(phi_v)
    w = {"x": ct * cp + 1j * sp, "y": ct * sp - 1j * cp, "z": -st}
    N = {"x": st * cp, "y": st * sp, "z": ct}
    eps = {}
    for i, a in enumerate(AX):
        for j, b in enumerate(AX):
            for k, c in enumerate(AX):
                eps[a + b + c] = ((i - j) * (j - k) * (k - i)) / 2.0

    def add_h(tab, L, out):
        ns = np.arange(-N_MAX, N_MAX + 1)
        for m, u in tab.coeffs(od).items():
            om = m * od["om_phi"] + ns * od["om_r"]
            fac = (1j * om) ** L * u
            out += (fac[None, :] * np.exp(1j * om[None, :] * t_grid[:, None])).sum(axis=1)
        return out

    h = np.zeros(len(t_grid), dtype=complex)

    if "T1" in terms:
        tab = Torus({})
        for j in AX:
            for k in AX:
                m2 = xv[j] * xv[k] - (_delta(j, k) / 3.0) * rsq
                tab = tab + (w[j] * w[k] * 2.0 * 0.5) * m2
        h = add_h(tab, 2, h)

    if "T2" in terms:
        tab = Torus({})
        for j in AX:
            for k in AX:
                for l in AX:
                    m3 = xv[j] * xv[k] * xv[l] - (1.0 / 5.0) * (
                        _delta(j, k) * (rsq * xv[l])
                        + _delta(j, l) * (rsq * xv[k])
                        + _delta(k, l) * (rsq * xv[j])
                    )
                    tab = tab + (w[j] * w[k] * N[l] * (2.0 / 3.0) * 0.5) * m3
        h = add_h(tab, 3, h)

    if "T3" in terms:
        S2 = {
            (k, pp): 0.5 * (Lv[k] * xv[pp]) + 0.5 * (Lv[pp] * xv[k])
            for k in AX
            for pp in AX
        }
        tab = Torus({})
        for j in AX:
            for k in AX:
                for pp in AX:
                    for q in AX:
                        e1 = eps[pp + q + j]
                        if e1:
                            tab = tab + (0.5 * (8.0 / 3.0) * e1 * N[q] * w[j] * w[k] * 0.5) * S2[(k, pp)]
                        e2 = eps[pp + q + k]
                        if e2:
                            tab = tab + (0.5 * (8.0 / 3.0) * e2 * N[q] * w[j] * w[k] * 0.5) * S2[(j, pp)]
        h = add_h(tab, 2, h)

    if "T4" in terms:
        tab = Torus({})
        for j in AX:
            for k in AX:
                for l in AX:
                    for mm in AX:
                        raw = xv[j] * xv[k] * xv[l] * xv[mm]
                        tr1 = (1.0 / 7.0) * (
                            _delta(j, k) * (rsq * (xv[l] * xv[mm]))
                            + _delta(j, l) * (rsq * (xv[k] * xv[mm]))
                            + _delta(j, mm) * (rsq * (xv[k] * xv[l]))
                            + _delta(k, l) * (rsq * (xv[j] * xv[mm]))
                            + _delta(k, mm) * (rsq * (xv[j] * xv[l]))
                            + _delta(l, mm) * (rsq * (xv[j] * xv[k]))
                        )
                        tr2 = (1.0 / 35.0) * (
                            _delta(j, k) * _delta(l, mm)
                            + _delta(j, l) * _delta(k, mm)
                            + _delta(j, mm) * _delta(k, l)
                        ) * (rsq * rsq)
                        tab = tab + (
                            w[j] * w[k] * N[l] * N[mm] * (1.0 / 6.0) * 0.5
                        ) * (raw - tr1 + tr2)
        h = add_h(tab, 4, h)

    if "T5" in terms:
        Tr = {"x": zero, "y": zero, "z": (1.0 / 3.0) * (Lv["z"] * rsq)}
        S3 = {}
        for k in AX:
            for pp in AX:
                for l in AX:
                    sym = (1.0 / 3.0) * (
                        Lv[k] * xv[pp] * xv[l]
                        + Lv[pp] * xv[k] * xv[l]
                        + Lv[l] * xv[k] * xv[pp]
                    )
                    S3[(k, pp, l)] = sym - (1.0 / 5.0) * (
                        _delta(k, pp) * Tr[l] + _delta(k, l) * Tr[pp] + _delta(pp, l) * Tr[k]
                    )
        tab = Torus({})
        for j in AX:
            for k in AX:
                for pp in AX:
                    for q in AX:
                        for l in AX:
                            e1 = eps[pp + q + j]
                            if e1:
                                tab = tab + (0.5 * e1 * N[q] * N[l] * w[j] * w[k] * 0.5) * S3[(k, pp, l)]
                            e2 = eps[pp + q + k]
                            if e2:
                                tab = tab + (0.5 * e2 * N[q] * N[l] * w[j] * w[k] * 0.5) * S3[(j, pp, l)]
        h = add_h(tab, 3, h)

    # ---- l = 5, 6 extension: generic STF moments ----
    def mass_moment(s):
        cache = {}
        out = {}
        for idx in _it.product(AX, repeat=s):
            key = tuple(sorted(idx))
            if key not in cache:
                v = xv[key[0]]
                for a in key[1:]:
                    v = v * xv[a]
                cache[key] = v
            out[idx] = cache[key]
        return _stf(out, s)

    def current_moment(s):
        cache = {}
        out = {}
        for idx in _it.product(AX, repeat=s):
            key = tuple(sorted(idx))
            if key not in cache:
                acc = None
                for i in range(s):
                    v = Lv[key[i]]
                    for j2, a in enumerate(key):
                        if j2 != i:
                            v = v * xv[a]
                    acc = v if acc is None else acc + v
                cache[key] = (1.0 / s) * acc
            out[idx] = cache[key]
        return _stf(out, s)

    def _rest_combos(s2):
        """Sorted index multisets of length s2 with their multiplicities —
        the contracted moment is fully symmetric, so the 3^s2 ordered
        N-index tuples collapse to C(s2+2, 2) weighted terms (round-5
        speedup: the rank-9/10 assembly was ~100x slower without this)."""
        out = []
        for rest in _it.combinations_with_replacement(AX, s2):
            cnt = _math.factorial(s2)
            for a in set(rest):
                cnt //= _math.factorial(rest.count(a))
            out.append((rest, cnt))
        return out

    def mass_term(s, coeff):
        M = mass_moment(s)
        tab = Torus({})
        for j in AX:
            for k in AX:
                wjk = w[j] * w[k] * coeff * 0.5
                for rest, cnt in _rest_combos(s - 2):
                    wgt = wjk * cnt
                    for a in rest:
                        wgt = wgt * N[a]
                    if wgt != 0.0:
                        tab = tab + wgt * M[(j, k) + rest]
        return tab

    def current_term(s, coeff):
        S = current_moment(s)
        rests = _rest_combos(s - 2)
        tab = Torus({})
        for j in AX:
            for k in AX:
                for pp in AX:
                    for q in AX:
                        e1 = eps[pp + q + j]
                        e2 = eps[pp + q + k]
                        if e1 == 0.0 and e2 == 0.0:
                            continue
                        for rest, cnt in rests:
                            nw = float(cnt)
                            for a in rest:
                                nw *= N[a]
                            if nw == 0.0:
                                continue
                            base = 0.5 * coeff * N[q] * nw * w[j] * w[k] * 0.5
                            if e1 != 0.0:
                                tab = tab + (base * e1) * S[(k, pp) + rest]
                            if e2 != 0.0:
                                tab = tab + (base * e2) * S[(j, pp) + rest]
        return tab

    if "T6" in terms:  # current hexadecapole (l = 4 B-type)
        h = add_h(current_term(4, 4.0 / 15.0), 4, h)
    if "T7" in terms:  # mass 2^5-pole
        h = add_h(mass_term(5, 1.0 / 30.0), 5, h)
    if "T8" in terms:  # current 2^5-pole
        h = add_h(current_term(5, 1.0 / 18.0), 5, h)
    if "T9" in terms:  # mass 2^6-pole
        h = add_h(mass_term(6, 1.0 / 180.0), 6, h)
    if "T10" in terms:  # current 2^6-pole
        h = add_h(current_term(6, 1.0 / 105.0), 6, h)
    if "T11" in terms:  # mass 2^7-pole (4/7!)
        h = add_h(mass_term(7, 1.0 / 1260.0), 7, h)
    if "T12" in terms:  # current 2^7-pole (8*7/8!)
        h = add_h(current_term(7, 1.0 / 720.0), 7, h)
    if "T13" in terms:  # mass 2^8-pole (4/8!)
        h = add_h(mass_term(8, 1.0 / 10080.0), 8, h)
    if "T14" in terms:  # current 2^8-pole (8*8/9!)
        h = add_h(current_term(8, 1.0 / 5670.0), 8, h)
    if "T15" in terms:  # mass 2^9-pole (4/9!)
        h = add_h(mass_term(9, 1.0 / 90720.0), 9, h)
    if "T16" in terms:  # current 2^9-pole (8*9/10!)
        h = add_h(current_term(9, 1.0 / 50400.0), 9, h)
    if "T17" in terms:  # mass 2^10-pole (4/10!)
        h = add_h(mass_term(10, 1.0 / 907200.0), 10, h)
    if "T18" in terms:  # current 2^10-pole (8*10/11!)
        h = add_h(current_term(10, 1.0 / 498960.0), 10, h)

    return h
