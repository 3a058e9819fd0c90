"""Schwarzschild eccentric geodesics: energy, angular momentum, frequencies.

TPU-native replacement for the reference engine's C++ utilities
``get_fundamental_frequencies`` / ``get_separatrix`` (behavior pinned at
reference ``Tutorial_FD_construction_single_mode.ipynb`` cells 11-15 and 26:
``OmegaPhi, OmegaTheta, OmegaR = get_fundamental_frequencies(0., p, e, 0.)``
with ``f_mn = (m OmegaPhi + n OmegaR) / (2 pi M MTSUN_SI)``).

Everything is in geometric units with the central mass M = 1; frequencies are
dimensionless (radians per M of coordinate time). Orbits are parametrized by
(p, e): semi-latus rectum and eccentricity, with Darwin anomaly chi such that
``r = p / (1 + e cos chi)``.

Design note: instead of the closed forms with complete elliptic integrals
(Cutler-Kennefick-Poisson 1994), the radial period and periapsis advance are
computed by trapezoidal quadrature of the smooth 2*pi-periodic Darwin
integrands — spectrally accurate, branch-free, and vmappable, which is the
right shape for TPU (a fixed-size reduction instead of iterative AGM loops).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Quadrature resolution for the periodic Darwin integrands. 256 nodes keeps
# spectral accuracy down to p - p_sep ~ 0.05 (integrand peak width
# ~ sqrt((p - 6 - 2e)/e) in chi); the trajectory stops at p_sep + ~0.1.
_N_CHI = 256


def separatrix(e: jax.Array) -> jax.Array:
    """Schwarzschild separatrix p_s(e) = 6 + 2e (unstable-orbit boundary)."""
    return 6.0 + 2.0 * e


def energy_angmom(p: jax.Array, e: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Specific orbital energy E and angular momentum L of the geodesic.

    E^2 = ((p-2)^2 - 4 e^2) / (p (p - 3 - e^2)),  L^2 = p^2 / (p - 3 - e^2).
    """
    denom = p - 3.0 - e * e
    energy = jnp.sqrt(((p - 2.0 - 2.0 * e) * (p - 2.0 + 2.0 * e)) / (p * denom))
    angmom = p / jnp.sqrt(denom)
    return energy, angmom


@partial(jnp.vectorize, signature="(),()->(),()")
def fundamental_frequencies(p: jax.Array, e: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dimensionless (Omega_phi, Omega_r) for a bound eccentric orbit.

    Darwin-parametrization integrands (Cutler-Kennefick-Poisson 1994):
      dphi/dchi = sqrt(p / (p - 6 - 2 e cos chi))
      dt/dchi   = p^2 sqrt((p-2)^2 - 4e^2)
                  / ((p - 2 - 2 e cos chi) (1 + e cos chi)^2
                     sqrt(p - 6 - 2 e cos chi))
    T_r = int_0^{2pi} dt/dchi, Dphi = int_0^{2pi} dphi/dchi;
    Omega_r = 2 pi / T_r, Omega_phi = Dphi / T_r.

    The circular limit e -> 0 is handled by the same quadrature (integrands
    become constant): Omega_phi -> p^{-3/2}... (exactly 1/(p^{3/2}) * ...),
    matching the closed forms.
    """
    chi = (2.0 * jnp.pi / _N_CHI) * jnp.arange(_N_CHI)
    ecos = e * jnp.cos(chi)
    rad = p - 6.0 - 2.0 * ecos  # > 0 for p above separatrix
    dphi_dchi = jnp.sqrt(p / rad)
    dt_dchi = (
        p
        * p
        * jnp.sqrt((p - 2.0) ** 2 - 4.0 * e * e)
        / ((p - 2.0 - 2.0 * ecos) * (1.0 + ecos) ** 2 * jnp.sqrt(rad))
    )
    # periodic trapezoid == mean * period
    h = 2.0 * jnp.pi / _N_CHI
    t_r = jnp.sum(dt_dchi) * h
    dphi = jnp.sum(dphi_dchi) * h
    omega_r = 2.0 * jnp.pi / t_r
    omega_phi = dphi / t_r
    return omega_phi, omega_r


def fundamental_frequencies_seconds(
    p: jax.Array, e: jax.Array, mass_sun: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """(Omega_phi, Omega_r) in rad/s for a central mass in solar masses."""
    from ..utils.constants import MTSUN_SI

    omega_phi, omega_r = fundamental_frequencies(p, e)
    scale = 1.0 / (mass_sun * MTSUN_SI)
    return omega_phi * scale, omega_r * scale


_ANTIDERIV_CACHE: dict[int, "object"] = {}


def _antiderivative_matrix(n: int):
    """Real (n, n) matrix A with (A g)_i = antiderivative of zero-mean
    periodic g at chi_i, vanishing at chi_0 = 0. Built host-side via numpy
    FFT of the identity; cached per resolution."""
    if n not in _ANTIDERIV_CACHE:
        import numpy as np

        eye = np.eye(n)
        gk = np.fft.rfft(eye, axis=0)  # spectrum of each basis vector
        k = np.arange(gk.shape[0])
        scale = np.zeros_like(k, dtype=np.complex128)
        scale[1:] = 1.0 / (1j * k[1:])
        gint = np.fft.irfft(gk * scale[:, None], n=n, axis=0)
        gint = gint - gint[0:1, :]
        _ANTIDERIV_CACHE[n] = gint
    return _ANTIDERIV_CACHE[n]


def darwin_orbit(p: jax.Array, e: jax.Array, n_chi: int = _N_CHI):
    """One radial period of the bound geodesic, sampled uniformly in chi.

    Returns dict with chi, r, t (coordinate time from periapsis, t(0)=0),
    phi (azimuth from periapsis, phi(0)=0), and the period/advance (T_r,
    Dphi). Used by the amplitude module to Fourier-decompose source
    multipoles over the orbital torus.

    Integrals of the periodic integrands are done spectrally: cumulative
    t(chi) and phi(chi) via a precomputed real spectral-antiderivative matrix
    (the operator is linear, so it is baked host-side with numpy FFTs into a
    dense (n, n) f64 matmul — complex dtypes never reach the device, and the
    contraction maps onto the MXU).
    """
    chi = (2.0 * jnp.pi / n_chi) * jnp.arange(n_chi)
    ecos = e * jnp.cos(chi)
    rad = p - 6.0 - 2.0 * ecos
    r = p / (1.0 + ecos)
    dphi_dchi = jnp.sqrt(p / rad)
    dt_dchi = (
        p
        * p
        * jnp.sqrt((p - 2.0) ** 2 - 4.0 * e * e)
        / ((p - 2.0 - 2.0 * ecos) * (1.0 + ecos) ** 2 * jnp.sqrt(rad))
    )

    a_op = jnp.asarray(_antiderivative_matrix(n_chi))

    def periodic_antiderivative(g):
        """Antiderivative of periodic g(chi) with zero value at chi=0."""
        mean = jnp.mean(g)
        gint = a_op @ (g - mean)
        return gint + mean * chi

    t = periodic_antiderivative(dt_dchi)
    phi = periodic_antiderivative(dphi_dchi)
    h = 2.0 * jnp.pi / n_chi
    t_r = jnp.sum(dt_dchi) * h
    dphi_total = jnp.sum(dphi_dchi) * h
    return {"chi": chi, "r": r, "t": t, "phi": phi, "T_r": t_r, "Dphi": dphi_total}


__all__ = [
    "separatrix",
    "energy_angmom",
    "fundamental_frequencies",
    "fundamental_frequencies_seconds",
    "darwin_orbit",
]
