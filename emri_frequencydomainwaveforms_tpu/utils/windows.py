"""Taper windows (jittable) matching the numpy/scipy definitions.

The reference sweeps [boxcar, blackman, hann, nuttall] windows in its
accuracy scans (reference ``check_mode_by_mode.py:264-309``) and applies a
hann window to TD injections (``emri_pe.py:260-267``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cosine_window(n: int, coefs) -> jax.Array:
    k = jnp.arange(n)
    x = 2.0 * jnp.pi * k / (n - 1)
    out = jnp.zeros((n,), jnp.float64)
    for j, a in enumerate(coefs):
        out = out + ((-1.0) ** j) * a * jnp.cos(j * x)
    return out


def boxcar(n: int) -> jax.Array:
    return jnp.ones((n,), jnp.float64)


def hann(n: int) -> jax.Array:
    """Matches ``np.hanning(n)``."""
    return _cosine_window(n, (0.5, 0.5))


def blackman(n: int) -> jax.Array:
    """Matches ``np.blackman(n)``."""
    return _cosine_window(n, (0.42, 0.5, 0.08))


def nuttall(n: int) -> jax.Array:
    """Matches ``scipy.signal.windows.nuttall(n)`` (sym)."""
    return _cosine_window(n, (0.3635819, 0.4891775, 0.1365995, 0.0106411))


WINDOWS = {"boxcar": boxcar, "hann": hann, "blackman": blackman, "nuttall": nuttall}

__all__ = ["boxcar", "hann", "blackman", "nuttall", "WINDOWS"]
