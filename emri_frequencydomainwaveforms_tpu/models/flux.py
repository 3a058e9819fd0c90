"""Radiation-reaction fluxes and the inspiral ODE right-hand side.

TPU-native stand-in for the reference engine's ``SchwarzEccFlux`` trajectory
RHS (C++ flux interpolants upstream; behavioral contract pinned at reference
``emri_pe.py:620`` and ``Tutorial_FD_construction_single_mode.ipynb`` cell 5:
``traj(M, mu, 0.0, p0, e0, 1.0, T=T) -> (t, p, e, x, Phi_phi, Phi_theta,
Phi_r)``).

Scheme: a flux-driven hybrid ("kludge") evolution —

* **conservative sector exact**: E(p, e), L(p, e) and (Omega_phi, Omega_r)
  are the exact Schwarzschild-geodesic expressions (`models.geodesic`);
* **dissipative sector post-Newtonian**: orbit-averaged GW fluxes
  <dE/dt>, <dL/dt> at Peters-Mathews order with optional higher-order terms;
* (pdot, edot) follow by inverting the exact 2x2 Jacobian
  d(E, L)/d(p, e) (computed by forward-mode autodiff, so the conservative
  sector stays exactly self-consistent), which reproduces the correct
  separatrix divergence as the Jacobian degenerates at p -> 6 + 2e.

The upstream engine instead interpolates Teukolsky flux data; those data are
not redistributable here, so the flux model is an analytic PN series behind
the same interface (swap `pn_flux_e_l` for a data-driven interpolant to
recover Teukolsky accuracy without touching the integrator or anything
downstream).

Units: time is dimensionless coordinate time per central mass M
(t_sec = t_geo * M * MTSUN_SI); fluxes carry one power of the mass ratio
nu = mu/M.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geodesic import energy_angmom, fundamental_frequencies, separatrix


def pn_flux_e_l(p: jax.Array, e: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Orbit-averaged specific-energy and angular-momentum fluxes / nu.

    Peters-Mathews (1963/64) quadrupole fluxes expressed in (p, e):
      <dE/dt> = -(32/5) p^-5   (1-e^2)^{3/2} (1 + 73/24 e^2 + 37/96 e^4)
      <dL/dt> = -(32/5) p^-7/2 (1-e^2)^{3/2} (1 + 7/8 e^2)
    with the 1PN (Peters-Mathews -> Junker-Schafer style) correction factors
    applied as a series in 1/p. Higher-order calibration slots in here.
    """
    one_m_e2 = 1.0 - e * e
    fac = one_m_e2 * jnp.sqrt(one_m_e2)
    de = -(32.0 / 5.0) * p**-5 * fac * (1.0 + (73.0 / 24.0) * e * e + (37.0 / 96.0) * e**4)
    dl = -(32.0 / 5.0) * p**-3.5 * fac * (1.0 + (7.0 / 8.0) * e * e)
    return de, dl


def pdot_edot(p: jax.Array, e: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(dp/dt, de/dt) per unit mass ratio, via exact-Jacobian flux balance.

    Solves  [dE/dp dE/de; dL/dp dL/de] [pdot; edot] = [Edot; Ldot].
    """
    de_flux, dl_flux = pn_flux_e_l(p, e)

    def en(pe):
        return jnp.stack(energy_angmom(pe[0], pe[1]))

    jac = jax.jacfwd(en)(jnp.stack([p, e]))  # (2 [E,L], 2 [p,e])
    det = jac[0, 0] * jac[1, 1] - jac[0, 1] * jac[1, 0]
    pdot = (jac[1, 1] * de_flux - jac[0, 1] * dl_flux) / det
    edot = (-jac[1, 0] * de_flux + jac[0, 0] * dl_flux) / det
    return pdot, edot


class InspiralRHS(NamedTuple):
    """Parameters of the inspiral ODE (static under jit)."""

    nu: jax.Array  # mass ratio mu/M


def inspiral_rhs(state: jax.Array, args: InspiralRHS) -> jax.Array:
    """RHS of d/dt [p, e, Phi_phi, Phi_r] in geometric time (units of M).

    Matches the reference trajectory's evolved variables (x fixed at 1 and
    Phi_theta unused for Schwarzschild-eccentric, cf. reference notebook
    cell 5 trajectory unpack).
    """
    p, e = state[0], state[1]
    # clamp eccentricity away from exactly 0 for the edot/e terms
    e_safe = jnp.maximum(e, 1.0e-9)
    pdot, edot = pdot_edot(p, e_safe)
    omega_phi, omega_r = fundamental_frequencies(p, e_safe)
    return jnp.stack([args.nu * pdot, args.nu * edot, omega_phi, omega_r])


def stop_condition(state: jax.Array, delta_p_stop: float = 0.12) -> jax.Array:
    """True when the orbit reaches the near-separatrix cutoff.

    The reference engine stops integrating a small offset above
    p_sep = 6 + 2e (Schwarzschild); we use delta_p_stop above it.
    """
    p, e = state[0], state[1]
    return p <= separatrix(e) + delta_p_stop


__all__ = ["pn_flux_e_l", "pdot_edot", "InspiralRHS", "inspiral_rhs", "stop_condition"]
