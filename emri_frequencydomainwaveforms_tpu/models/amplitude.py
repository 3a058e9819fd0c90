"""Teukolsky-style mode amplitudes A_lmn(p, e) — quadrupole-order, on the fly.

Replaces the reference engine's amplitude backends
(``few.amplitude.romannet.RomanAmplitude`` — a CUDA MLP over reduced-order
Teukolsky data — and ``few.amplitude.interp2dcubicspline.Interp2DAmplitude``;
call contract pinned at reference ``Tutorial_FD_construction_single_mode.ipynb``
cells 5, 19, 26: ``amp(p, e, specific_modes=[(l, m, n)]) -> complex A along
the trajectory``). The upstream Teukolsky datasets are not redistributable,
so this module computes the amplitudes from first principles at quadrupole
order over the *exact relativistic orbit* (geodesic r(chi), phi(chi), t(chi)
from `models.geodesic`), which preserves the full (m, n) harmonic structure
the FD summation needs. Higher multipoles / calibrated data drop into the
same interface.

Derivation (equatorial orbit in the x-y plane, observer direction (Th, Ph),
units G = c = 1, central mass M = 1, reduced mass mu stripped — the
detector-frame wrapper applies the reference's distance factor
``(dist Gpc)/(mu MRSUN_SI)``, notebook cell 23):

  h = h_+ - i h_x = (1/R) [Qdd_ThTh - Qdd_PhPh - 2 i Qdd_ThPh],
  Q_ij = mu x_i x_j.

Expanding the transverse basis in (Th, Ph) and matching e^{i m Ph} terms to
the spin-weighted harmonics -2Y_2m gives exactly (verified in tests against
a brute-force TT projection):

  h_22   = 2 sqrt(pi/5) (mu/R) conj(u-dd),    u = (x + i y)^2
  h_2-2  = 2 sqrt(pi/5) (mu/R) u-dd
  h_20   = - sqrt(8 pi/15) (mu/R) (r^2)-dd

On a geodesic, u(t) = g2(t) e^{2 i Omega_phi t} with g2 = r^2 e^{2 i dphi}
(dphi = phi - Omega_phi t is Omega_r-periodic), so with Fourier series
g2 = sum_n b_n e^{i n Omega_r t} and r^2 = sum_n d_n e^{i n Omega_r t}:

  A_{2,2,n}  = -2 sqrt(pi/5) (2 Omega_phi + n Omega_r)^2 conj(b_n)
  A_{2,0,n}  =   sqrt(8 pi/15) n^2 Omega_r^2 conj(d_n)      (n >= 1)

in the convention  h = sum_{lmn} A_lmn * (-2)Y_lm(Th, Ph) * e^{-i(m Phi_phi
+ n Phi_r)}  (reference notebook cell 5/23), with the negative-m partners
fixed by the equatorial symmetry  A_{l,-m,-n} = (-1)^l conj(A_{l,m,n}).

The Fourier projections are spectrally-convergent trapezoid sums over the
Darwin angle; cos/sin of n*Omega_r*t(chi) come from a Chebyshev-style
recurrence over n (2 fma per harmonic instead of a transcendental), and the
chi-axis contraction is a dense matmul — MXU-shaped when batched over
trajectory knots.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .geodesic import darwin_orbit

_SQRT_PI_5 = float(np.sqrt(np.pi / 5.0))
_SQRT_8PI_15 = float(np.sqrt(8.0 * np.pi / 15.0))


class ModeTable(NamedTuple):
    """Static (l, m, n) mode inventory (host-side numpy; fixed at trace time).

    Only m >= 0 modes are tabulated; the summation applies the equatorial
    conjugate symmetry for -m (same convention as the reference's
    ``assume_positive_m`` / ``include_minus_m`` machinery).
    """

    ls: np.ndarray
    ms: np.ndarray
    ns: np.ndarray

    @property
    def num_modes(self) -> int:
        return len(self.ls)


def default_mode_table(n_max: int = 30) -> ModeTable:
    """Quadrupole inventory: (2,2,n) for n in [-n_max, n_max], (2,0,n) n>=1."""
    ls, ms, ns = [], [], []
    for n in range(-n_max, n_max + 1):
        ls.append(2)
        ms.append(2)
        ns.append(n)
    for n in range(1, n_max + 1):
        ls.append(2)
        ms.append(0)
        ns.append(n)
    return ModeTable(np.array(ls), np.array(ms), np.array(ns))


@partial(jnp.vectorize, signature="(),()->(k),(k),(k)", excluded=(2,))
def _orbit_harmonics(p, e, n_max: int):
    """Fourier coefficients b_n (complex as re/im) of g2 and d_n of r^2.

    Returns (b_re, b_im, d_re) each of shape (2*n_max+1,) indexed by
    n = -n_max..n_max (d_im is -odd symmetric and folded in by the caller:
    d_{-n} = conj(d_n); we return the full b and the n>=0 half of d packed
    into one array for a single vectorized signature).
    """
    orbit = darwin_orbit(p, e)
    t = orbit["t"]
    phi = orbit["phi"]
    r = orbit["r"]
    t_r = orbit["T_r"]
    dphi_total = orbit["Dphi"]
    n_chi = t.shape[0]

    omega_r = 2.0 * jnp.pi / t_r
    omega_phi = dphi_total / t_r

    dphi = phi - omega_phi * t  # periodic part of the azimuth
    r2 = r * r
    g_re = r2 * jnp.cos(2.0 * dphi)
    g_im = r2 * jnp.sin(2.0 * dphi)

    theta = omega_r * t  # in [0, 2pi)
    c1, s1 = jnp.cos(theta), jnp.sin(theta)

    # quadrature weight: (dt/dchi) dchi / T_r; we already have t on a uniform
    # chi grid, so use the spectral identity sum f(chi_j) w_j with
    # w_j = dt/dchi * (2pi/n)/T_r. dt/dchi is recovered exactly from the
    # orbit dict by differentiating? -- darwin_orbit returns t built from
    # dt/dchi; recompute the integrand weights directly instead.
    ecos = e * jnp.cos(orbit["chi"])
    rad = p - 6.0 - 2.0 * ecos
    dt_dchi = (
        p * p * jnp.sqrt((p - 2.0) ** 2 - 4.0 * e * e)
        / ((p - 2.0 - 2.0 * ecos) * (1.0 + ecos) ** 2 * jnp.sqrt(rad))
    )
    w = dt_dchi * (2.0 * jnp.pi / n_chi) / t_r  # sums to 1

    def scan_body(carry, _):
        cn, sn = carry  # cos(n theta), sin(n theta)
        # projections at this n (for +n and -n):
        #   b_{+n} = sum w (g_re + i g_im)(cn - i sn)
        #   b_{-n} = sum w (g_re + i g_im)(cn + i sn)
        wgc = jnp.sum(w * g_re * cn)
        wgs = jnp.sum(w * g_re * sn)
        wic = jnp.sum(w * g_im * cn)
        wis = jnp.sum(w * g_im * sn)
        wrc = jnp.sum(w * r2 * cn)
        wrs = jnp.sum(w * r2 * sn)
        out = jnp.stack(
            [
                wgc + wis,  # Re b_{+n}
                wic - wgs,  # Im b_{+n}
                wgc - wis,  # Re b_{-n}
                wic + wgs,  # Im b_{-n}
                wrc,  # Re d_{+n} (= Re d_{-n})
                -wrs,  # Im d_{+n} (= -Im d_{-n})
            ]
        )
        cn1 = cn * c1 - sn * s1
        sn1 = sn * c1 + cn * s1
        return (cn1, sn1), out

    (_, _), outs = jax.lax.scan(
        scan_body, (jnp.ones_like(c1), jnp.zeros_like(s1)), None, length=n_max + 1
    )
    # outs: (n_max+1, 6) for n = 0..n_max
    b_re = jnp.concatenate([outs[1:, 2][::-1], outs[:, 0]])  # n=-n_max..n_max
    b_im = jnp.concatenate([outs[1:, 3][::-1], outs[:, 1]])
    # d: pack n=0..n_max re then im in one (2*n_max+1,) array:
    d_pack = jnp.concatenate([outs[:, 4], outs[1:, 5]])
    return b_re, b_im, d_pack


def mode_amplitudes(
    p: jax.Array, e: jax.Array, table: ModeTable
) -> tuple[jax.Array, jax.Array]:
    """A_lmn(p, e) for every mode in ``table`` -> (re, im), shape (..., n_modes).

    ``p``/``e`` may be arrays (trajectory knots, batches); the mode axis is
    appended last. Requires ``table`` to be within quadrupole coverage
    (l = 2, m in {0, 2}); other modes return 0 (the interface accepts the
    full generic inventory so richer amplitude backends can swap in).
    """
    n_max = int(np.max(np.abs(table.ns))) if table.num_modes else 0
    from .geodesic import fundamental_frequencies

    omega_phi, omega_r = fundamental_frequencies(p, e)
    b_re, b_im, d_pack = _orbit_harmonics(p, e, n_max)

    n_idx_b = table.ns + n_max  # index into n=-n_max..n_max axis
    is_m2 = (table.ls == 2) & (table.ms == 2)
    is_m0 = (table.ls == 2) & (table.ms == 0) & (table.ns >= 1)

    # gather b_n for each mode
    bn_re = jnp.take(b_re, jnp.asarray(n_idx_b), axis=-1)
    bn_im = jnp.take(b_im, jnp.asarray(n_idx_b), axis=-1)
    n_f = jnp.asarray(table.ns.astype(np.float64))
    omega_mn = 2.0 * omega_phi[..., None] + n_f * omega_r[..., None]
    fac22 = -2.0 * _SQRT_PI_5 * omega_mn * omega_mn
    a22_re = fac22 * bn_re
    a22_im = -fac22 * bn_im  # conj(b_n)

    # m=0: A = sqrt(8pi/15) n^2 Omega_r^2 conj(d_n), n>=1
    dn_idx = np.clip(table.ns, 0, n_max)
    d_re = jnp.take(d_pack, jnp.asarray(dn_idx), axis=-1)
    d_im_idx = np.clip(n_max + table.ns, n_max, 2 * n_max)  # n>=1 -> packed im
    d_im = jnp.where(
        jnp.asarray(table.ns >= 1),
        jnp.take(d_pack, jnp.asarray(d_im_idx), axis=-1),
        0.0,
    )
    fac20 = _SQRT_8PI_15 * (n_f * omega_r[..., None]) ** 2
    a20_re = fac20 * d_re
    a20_im = -fac20 * d_im

    re = jnp.where(jnp.asarray(is_m2), a22_re, jnp.where(jnp.asarray(is_m0), a20_re, 0.0))
    im = jnp.where(jnp.asarray(is_m2), a22_im, jnp.where(jnp.asarray(is_m0), a20_im, 0.0))
    return re, im


class NewtonianAmplitude:
    """OO facade pinning the reference amplitude-module call contract.

    ``amp(p, e, specific_modes=[(l, m, n)]) -> {(l,m,n): complex array}``
    (reference notebook cells 5/19). Negative-m requests are served via the
    equatorial symmetry A_{l,-m,-n} = (-1)^l conj(A_{l,m,n}).
    """

    def __init__(self, **kwargs):
        del kwargs  # max_init_len / use_gpu knobs are irrelevant under jit

    def __call__(self, p, e, specific_modes=None, n_max: int = 30):
        p = jnp.asarray(p)
        e = jnp.asarray(e)
        if specific_modes is None:
            table = default_mode_table(n_max)
            re, im = mode_amplitudes(p, e, table)
            return {
                (int(l), int(m), int(n)): np.asarray(re[..., i]) + 1j * np.asarray(im[..., i])
                for i, (l, m, n) in enumerate(zip(table.ls, table.ms, table.ns))
            }
        out = {}
        req = []
        flips = []
        for l, m, n in specific_modes:
            if m < 0:
                req.append((l, -m, -n))
                flips.append((-1.0) ** l)
            else:
                req.append((l, m, n))
                flips.append(None)
        table = ModeTable(
            np.array([r[0] for r in req]),
            np.array([r[1] for r in req]),
            np.array([r[2] for r in req]),
        )
        re, im = mode_amplitudes(p, e, table)
        for i, (lmn, flip) in enumerate(zip(specific_modes, flips)):
            a = np.asarray(re[..., i]) + 1j * np.asarray(im[..., i])
            out[lmn] = flip * np.conj(a) if flip is not None else a
        return out


__all__ = ["ModeTable", "default_mode_table", "mode_amplitudes", "NewtonianAmplitude"]
