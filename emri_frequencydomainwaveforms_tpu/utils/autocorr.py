"""Integrated autocorrelation time (Sokal / Goodman-Weare estimators).

Rebuilds the ACT utilities the reference keeps in two places:
Eryn's ``utils/utility.py`` (``get_acf``:42, ``get_integrated_act``:76,
``thermodynamic_integration_log_evidence``:142) and the standalone Sokal
copies in ``FDutils.py:219-262`` (``auto_window``, ``autocorr_func_1d``,
``autocorr_gw2010``, ``autocorr_new``). Host-side numpy (chain analysis).
"""

from __future__ import annotations

import numpy as np


def next_pow_two(n: int) -> int:
    i = 1
    while i < n:
        i <<= 1
    return i


def autocorr_func_1d(x, norm: bool = True):
    """FFT-based autocorrelation function of a 1-D series."""
    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    if x.ndim != 1:
        raise ValueError("invalid dimensions for 1D autocorrelation function")
    n = next_pow_two(len(x))
    f = np.fft.fft(x - np.mean(x), n=2 * n)
    acf = np.fft.ifft(f * np.conjugate(f))[: len(x)].real
    acf /= 4 * n
    if norm and acf[0] != 0:
        acf /= acf[0]
    return acf


def auto_window(taus, c: float):
    """Sokal automated windowing (1989)."""
    m = np.arange(len(taus)) < c * taus
    if np.any(m):
        return int(np.argmin(m))
    return len(taus) - 1


def autocorr_gw2010(y, c: float = 5.0):
    """Goodman-Weare 2010 estimator: ACF of the walker-mean chain."""
    f = autocorr_func_1d(np.mean(np.atleast_2d(y), axis=0))
    taus = 2.0 * np.cumsum(f) - 1.0
    return taus[auto_window(taus, c)]


def autocorr_new(y, c: float = 5.0):
    """emcee-style estimator: mean of per-walker ACFs."""
    y = np.atleast_2d(y)
    f = np.zeros(y.shape[1])
    for yy in y:
        f += autocorr_func_1d(yy)
    f /= len(y)
    taus = 2.0 * np.cumsum(f) - 1.0
    return taus[auto_window(taus, c)]


def get_acf(x, axis: int = 0, average_walkers: bool = False):
    """ACF along an axis of a chain array (Eryn ``get_acf`` parity)."""
    x = np.asarray(x)
    x = np.moveaxis(x, axis, 0)
    if average_walkers and x.ndim > 1:
        x = np.mean(x, axis=1)
    flat = x.reshape(x.shape[0], -1)
    acfs = np.stack([autocorr_func_1d(flat[:, i]) for i in range(flat.shape[1])], axis=-1)
    return acfs.reshape((x.shape[0],) + x.shape[1:])

def get_integrated_act(x, c: float = 5.0, average_walkers: bool = True):
    """Integrated ACT per parameter of a (nsteps, nwalkers, ndim) chain."""
    x = np.asarray(x)
    if x.ndim == 1:
        return autocorr_new(x[None, :], c=c)
    if x.ndim == 2:
        return autocorr_new(x.T, c=c)
    nsteps, nwalkers, ndim = x.shape[0], x.shape[1], int(np.prod(x.shape[2:]))
    flat = x.reshape(nsteps, nwalkers, ndim)
    return np.array([autocorr_new(flat[:, :, d].T, c=c) for d in range(ndim)]).reshape(x.shape[2:])


def thermodynamic_integration_log_evidence(betas, logls):
    """log Z via TI over the temperature ladder (Eryn ``:142``).

    Args:
      betas: (ntemps,) inverse temperatures, descending, beta[0] = 1.
      logls: (ntemps,) mean log-likelihood per rung.

    Returns:
      (logZ, dlogZ-estimate) using trapezoid + half-grid error estimate.
    """
    betas = np.asarray(betas)
    logls = np.asarray(logls)
    order = np.argsort(betas)[::-1]
    betas, logls = betas[order], logls[order]
    if betas[-1] != 0.0:
        betas = np.append(betas, 0.0)
        logls = np.append(logls, logls[-1])
    logz = -np.trapezoid(logls, betas)
    logz2 = -np.trapezoid(logls[::2], betas[::2])
    return logz, np.abs(logz - logz2)


__all__ = [
    "next_pow_two",
    "autocorr_func_1d",
    "auto_window",
    "autocorr_gw2010",
    "autocorr_new",
    "get_acf",
    "get_integrated_act",
    "thermodynamic_integration_log_evidence",
]
