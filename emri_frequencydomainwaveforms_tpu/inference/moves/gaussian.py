"""Metropolis-Hastings moves: Gaussian (iso/diag/full-cov), AM, DE.

Rebuilds Eryn's MH family (reference ``Eryn/eryn/moves/mh.py:11`` generic
propose loop; ``moves/gaussian.py:42``: "Gaussian" proposals from scalar /
diagonal / full covariance, adaptive **AM** via covariance of the current
ensemble (``propose_AM``:277), differential-evolution **DE**
(``propose_DE``:322), symmetric factors = 0 at :198).

Same jittable ``propose(key, coords, log_like, log_prior, betas, logp_fn,
logl_fn)`` contract as `StretchMove`, so the sampler can swap them freely.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


class MHMove:
    """Generic symmetric-proposal MH over (ntemps, nwalkers, ndim)."""

    def __init__(self, periodic=None):
        self.periodic = periodic

    def get_proposal(self, key, coords):
        raise NotImplementedError

    def _wrap(self, x):
        if self.periodic is None:
            return x
        per = jnp.asarray(self.periodic)
        return jnp.where(per > 0, jnp.mod(x, jnp.where(per > 0, per, 1.0)), x)

    def propose(
        self,
        key: jax.Array,
        coords: jax.Array,
        log_like: jax.Array,
        log_prior: jax.Array,
        betas: jax.Array,
        logp_fn: Callable,
        logl_fn: Callable,
    ):
        ntemps, nwalkers, ndim = coords.shape
        key, k_prop, k_u = jax.random.split(key, 3)
        prop, factors = self.get_proposal(k_prop, coords)
        prop = self._wrap(prop)

        lp_new = logp_fn(prop.reshape(-1, ndim)).reshape(ntemps, nwalkers)
        ll_new = logl_fn(prop.reshape(-1, ndim)).reshape(ntemps, nwalkers)
        ll_new = jnp.where(jnp.isnan(ll_new), -1e300, ll_new)
        ll_new = jnp.where(jnp.isfinite(lp_new), ll_new, -1e300)

        lnpdiff = factors + betas[:, None] * (ll_new - log_like) + (lp_new - log_prior)
        accept = (jnp.log(jax.random.uniform(k_u, (ntemps, nwalkers))) < lnpdiff) & jnp.isfinite(
            lp_new
        )
        coords = jnp.where(accept[..., None], prop, coords)
        log_like = jnp.where(accept, ll_new, log_like)
        log_prior = jnp.where(accept, lp_new, log_prior)
        return coords, log_like, log_prior, jnp.sum(accept, axis=1).astype(jnp.int32)


class GaussianMove(MHMove):
    """Gaussian random-walk MH.

    ``cov``: scalar (isotropic), (ndim,) diagonal, or (ndim, ndim) full
    covariance; ``mode``: "Gaussian" (fixed cov), "AM" (scales the empirical
    ensemble covariance per temperature), or "DE" (differential evolution:
    gamma * (x_a - x_b) difference proposal with occasional gamma = 1 jumps).
    """

    def __init__(self, cov, mode: str = "Gaussian", factor: float | None = None,
                 sky_periodic=None, periodic=None, indx_list=None, **kwargs):
        super().__init__(periodic=periodic)
        del kwargs
        self.mode = mode
        self.factor = factor
        self.indx_list = indx_list
        if isinstance(cov, dict):
            # branch-keyed covariances (reference multi-branch form): the
            # sampler lifts this into a TreeGaussianMove
            self.cov_dict = cov
            self._chol = None
            self._scale = None
            self.ndim_cov = None
            return
        self.cov_dict = None
        if np.isscalar(cov):
            self._chol = None
            self._scale = float(np.sqrt(cov))
            self.ndim_cov = None
        else:
            cov = np.asarray(cov)
            if cov.ndim == 1:
                self._chol = np.diag(np.sqrt(cov))
            else:
                self._chol = np.linalg.cholesky(cov)
            self._scale = None
            self.ndim_cov = cov.shape[0]

    def get_proposal(self, key, coords):
        ntemps, nwalkers, ndim = coords.shape
        if self.mode == "DE":
            k_pair, k_g, k_n = jax.random.split(key, 3)
            ia = jax.random.randint(k_pair, (ntemps, nwalkers), 0, nwalkers)
            ib = jax.random.randint(k_g, (ntemps, nwalkers), 0, nwalkers)
            xa = jnp.take_along_axis(coords, ia[..., None], axis=1)
            xb = jnp.take_along_axis(coords, ib[..., None], axis=1)
            gamma = 2.38 / jnp.sqrt(2.0 * ndim)
            jump = jax.random.uniform(k_n, (ntemps, nwalkers, 1)) < 0.1
            g = jnp.where(jump, 1.0, gamma)
            prop = coords + g * (xa - xb)
            return prop, jnp.zeros(coords.shape[:2])
        if self.mode == "AM":
            # adaptive Metropolis: empirical per-temperature covariance
            mean = jnp.mean(coords, axis=1, keepdims=True)
            xc = coords - mean
            cov = jnp.einsum("twi,twj->tij", xc, xc) / (nwalkers - 1)
            cov = cov + 1e-12 * jnp.eye(ndim)
            chol = jnp.linalg.cholesky(cov)
            z = jax.random.normal(key, coords.shape)
            step = jnp.einsum("tij,twj->twi", chol, z)
            return coords + (2.38 / jnp.sqrt(ndim)) * step, jnp.zeros(coords.shape[:2])
        z = jax.random.normal(key, coords.shape)
        if self._chol is not None:
            step = z @ jnp.asarray(self._chol).T
        else:
            step = z * self._scale
        return coords + step, jnp.zeros(coords.shape[:2])


__all__ = ["MHMove", "GaussianMove"]
