"""FEW-parity utility facades.

Pins the exact call signatures the reference drivers import from
``few.utils.utility`` (reference notebook cell 2, FD notebook cell 1,
``check_mode_by_mode.py:218-219``): ``get_fundamental_frequencies(a, p, e,
x)``, ``get_separatrix(a, e, x)``, ``get_overlap``/``get_mismatch``,
``get_p_at_t``/``get_mu_at_t`` (list-style argument contract), the
``SchwarzschildEccentric.sanity_check_init`` domain guard, and the
``cuda_set_device`` shim (device placement is jax's job here).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .geodesic import fundamental_frequencies as _fund_freq, separatrix as _sep
from . import inspiral as _inspiral


def get_fundamental_frequencies(a, p, e, x):
    """(OmegaPhi, OmegaTheta, OmegaR) for generic (a, p, e, x = cos I).

    a = 0, |x| = 1 takes the spectrally-exact Schwarzschild quadrature;
    a != 0, |x| = 1 the equatorial Kerr path
    (`geodesic.fundamental_frequencies_kerr`: divided-difference (E, L)
    Newton solve + Darwin quadrature, validated against the Bardeen
    circular-orbit/epicyclic closed forms); generic inclination
    (round 4) the Schmidt-style generic solve
    (`geodesic.fundamental_frequencies_kerr_generic`: (E, L_z, Q) Newton
    + Darwin/polar spectral quadratures, validated against both limits
    and a direct Mino-time geodesic integration). Matches the reference
    ``few.utils.utility.get_fundamental_frequencies`` signature (FD
    notebook cell 1).
    """
    if np.all(np.asarray(a) == 0.0) and np.all(np.abs(np.asarray(x)) == 1.0):
        om_phi, om_r = _fund_freq(jnp.asarray(p), jnp.asarray(e))
        sign = np.sign(np.asarray(x, dtype=np.float64))
        om_phi = np.asarray(om_phi) * np.where(sign == 0, 1.0, sign)
        return om_phi, np.abs(om_phi), np.asarray(om_r)
    if np.all(np.abs(np.asarray(x)) == 1.0):
        from .geodesic import fundamental_frequencies_kerr

        om_phi, om_theta, om_r = fundamental_frequencies_kerr(
            a, jnp.asarray(p), jnp.asarray(e), x
        )
        return np.asarray(om_phi), np.asarray(om_theta), np.asarray(om_r)
    from .geodesic import fundamental_frequencies_kerr_generic

    om_phi, om_theta, om_r = fundamental_frequencies_kerr_generic(
        a, jnp.asarray(p), jnp.asarray(e), x
    )
    return np.asarray(om_phi), np.asarray(om_theta), np.asarray(om_r)


def get_separatrix(a, e, x):
    """Separatrix p_s(a, e, x); exact 6 + 2e at a = 0, equatorial Kerr
    bisection at |x| = 1, generic-inclination bisection otherwise."""
    if np.all(np.asarray(a) == 0.0):
        return np.asarray(_sep(jnp.asarray(e)))
    if np.all(np.abs(np.asarray(x)) == 1.0):
        from .geodesic import separatrix_kerr

        return np.asarray(separatrix_kerr(a, jnp.asarray(e), x))
    from .geodesic import separatrix_kerr_generic

    return np.asarray(separatrix_kerr_generic(a, jnp.asarray(e), x))


def get_overlap(time_series_1, time_series_2, use_gpu=False):
    """Plain (unweighted) normalized overlap of two complex series."""
    a = np.asarray(time_series_1).ravel()
    b = np.asarray(time_series_2).ravel()
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    num = np.real(np.vdot(a, b))
    den = np.sqrt(np.real(np.vdot(a, a)) * np.real(np.vdot(b, b)))
    return num / den


def get_mismatch(time_series_1, time_series_2, use_gpu=False):
    return 1.0 - get_overlap(time_series_1, time_series_2)


def get_p_at_t(traj_module, t_out, traj_args, *, bounds=None, **kwargs):
    """Reference-style signature: traj_args = [M, mu, a, e0, x0]."""
    m, mu = traj_args[0], traj_args[1]
    e0 = traj_args[3] if len(traj_args) > 3 else traj_args[-1]
    kw = {}
    if bounds is not None:
        kw = {"p_lo": bounds[0], "p_hi": bounds[1]}
    return float(_inspiral.get_p_at_t(m, mu, e0, t_out, **kw))


def get_mu_at_t(traj_module, t_out, traj_args, **kwargs):
    """traj_args = [M, a, p0, e0, x0] (reference ordering)."""
    m, p0, e0 = traj_args[0], traj_args[2], traj_args[3]
    return float(_inspiral.get_mu_at_t(m, p0, e0, t_out))


def cuda_set_device(dev):
    """Shim: device selection is jax's concern (reference parity no-op)."""
    return None


class SchwarzschildEccentric:
    """Domain guard facade (reference ``SchwarzschildEccentric
    .sanity_check_init``, used at ``check_mode_by_mode.py:218-219``)."""

    p_min_offset = 0.1
    e_max = 0.75

    def __init__(self, use_gpu=False):
        del use_gpu

    def sanity_check_init(self, M, mu, p0, e0):
        if not (M > 0 and mu > 0):
            raise ValueError("masses must be positive")
        if mu / M > 1e-3:
            raise ValueError(f"mass ratio {mu / M:.2e} outside the EMRI regime")
        if e0 < 0 or e0 > self.e_max:
            raise ValueError(f"e0 = {e0} outside [0, {self.e_max}]")
        p_sep = 6.0 + 2.0 * e0
        if p0 < p_sep + self.p_min_offset:
            raise ValueError(f"p0 = {p0} too close to the separatrix {p_sep}")
        return True

    def sanity_check_angles(self, qS, phiS, qK, phiK):
        for name, v in (("qS", qS), ("qK", qK)):
            if not (0 <= v <= np.pi):
                raise ValueError(f"{name} outside [0, pi]")
        return True


__all__ = [
    "get_fundamental_frequencies",
    "get_separatrix",
    "get_overlap",
    "get_mismatch",
    "get_p_at_t",
    "get_mu_at_t",
    "cuda_set_device",
    "SchwarzschildEccentric",
]
