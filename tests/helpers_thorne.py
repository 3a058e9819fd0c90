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


def thorne_h(p, e, theta, phi_v, t_grid, terms=("T1", "T2", "T3", "T4", "T5")):
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

    return h
