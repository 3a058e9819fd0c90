"""Goodman-Weare affine-invariant stretch move (jittable, tempered).

Rebuilds Eryn's ``StretchMove`` (reference ``Eryn/eryn/moves/stretch.py:14``:
``z = ((a-1) u + 1)^2 / a`` at :121-124, periodic-aware difference/wrap at
:128-145, complement draw at :68-94, factors ``(ndim-1) log z`` at :214) and
the red-blue ensemble-split driver (``moves/red_blue.py:89``: two halves,
proposal -> prior -> likelihood -> ``lnpdiff = factors + beta dlogl + dlogp``
accept at :286-290).

The whole proposal — both halves, for every temperature — is one pure
function of (state, key), vmapped over temperatures and walkers.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class StretchMove:
    """Tempered stretch move over (ntemps, nwalkers, ndim) coordinates.

    Args:
      a: stretch scale (reference default 2.0).
      periodic: optional per-dimension period vector (ndim,), 0/None entries
        mean non-periodic (built from a PeriodicContainer by the sampler).
      live_dangerously: accepted for API parity (small-ensemble guard is the
        caller's concern under jit).
    """

    def __init__(self, a: float = 2.0, periodic=None, use_gpu=None, live_dangerously=False,
                 return_gpu=False, random_seed=None):
        del use_gpu, return_gpu, random_seed
        self.a = a
        self.periodic = periodic
        self.live_dangerously = live_dangerously
        # running acceptance diagnostics (host-side, updated by the sampler)
        self.acceptance_fraction = None

    def _diff(self, x1, x2, periods):
        d = x1 - x2
        if periods is None:
            return d
        per = jnp.asarray(periods)
        wrapped = d - per * jnp.round(d / jnp.where(per > 0, per, 1.0))
        return jnp.where(per > 0, wrapped, d)

    def _wrap(self, x, periods):
        if periods is None:
            return x
        per = jnp.asarray(periods)
        return jnp.where(per > 0, jnp.mod(x, jnp.where(per > 0, per, 1.0)), x)

    def propose(
        self,
        key: jax.Array,
        coords: jax.Array,  # (ntemps, nwalkers, ndim)
        log_like: jax.Array,  # (ntemps, nwalkers)
        log_prior: jax.Array,
        betas: jax.Array,  # (ntemps,)
        logp_fn: Callable,  # (n, ndim) -> (n,)
        logl_fn: Callable,  # (n, ndim) -> (n,)
    ):
        """One full stretch update (both halves). Returns
        (coords, log_like, log_prior, n_accepted)."""
        ntemps, nwalkers, ndim = coords.shape
        nh = nwalkers // 2
        a = self.a

        def update_half(carry, half_idx):
            coords, log_like, log_prior, key, n_acc = carry
            key, k_z, k_c, k_u = jax.random.split(key, 4)

            # moving set S = this half, complement C = other half
            s_slice = jax.lax.dynamic_slice_in_dim(coords, half_idx * nh, nh, axis=1)
            c_slice = jax.lax.dynamic_slice_in_dim(coords, (1 - half_idx) * nh, nh, axis=1)
            ll_s = jax.lax.dynamic_slice_in_dim(log_like, half_idx * nh, nh, axis=1)
            lp_s = jax.lax.dynamic_slice_in_dim(log_prior, half_idx * nh, nh, axis=1)

            z = ((a - 1.0) * jax.random.uniform(k_z, (ntemps, nh)) + 1.0) ** 2 / a
            partner = jax.random.randint(k_c, (ntemps, nh), 0, nh)
            c_pick = jnp.take_along_axis(c_slice, partner[..., None], axis=1)

            diff = self._diff(s_slice, c_pick, self.periodic)
            prop = self._wrap(c_pick + z[..., None] * diff, self.periodic)

            lp_new = logp_fn(prop.reshape(-1, ndim)).reshape(ntemps, nh)
            ll_new = logl_fn(prop.reshape(-1, ndim)).reshape(ntemps, nh)
            ll_new = jnp.where(jnp.isnan(ll_new), -1e300, ll_new)
            ll_new = jnp.where(jnp.isfinite(lp_new), ll_new, -1e300)

            factors = (ndim - 1.0) * jnp.log(z)
            lnpdiff = (
                factors
                + betas[:, None] * (ll_new - ll_s)
                + (lp_new - lp_s)
            )
            accept = jnp.log(jax.random.uniform(k_u, (ntemps, nh))) < lnpdiff
            accept = accept & jnp.isfinite(lp_new)

            new_s = jnp.where(accept[..., None], prop, s_slice)
            new_ll = jnp.where(accept, ll_new, ll_s)
            new_lp = jnp.where(accept, lp_new, lp_s)

            coords = jax.lax.dynamic_update_slice_in_dim(coords, new_s, half_idx * nh, axis=1)
            log_like = jax.lax.dynamic_update_slice_in_dim(log_like, new_ll, half_idx * nh, axis=1)
            log_prior = jax.lax.dynamic_update_slice_in_dim(log_prior, new_lp, half_idx * nh, axis=1)
            return (coords, log_like, log_prior, key, n_acc + jnp.sum(accept, axis=1).astype(jnp.int32)), None

        carry = (coords, log_like, log_prior, key, jnp.zeros((ntemps,), jnp.int32))
        (coords, log_like, log_prior, _, n_acc), _ = jax.lax.scan(
            update_half, carry, jnp.arange(2)
        )
        return coords, log_like, log_prior, n_acc


class DIMEMove:
    """Adaptive independence-mixture proposal (reference ``stretch.py:245``).

    The reference's DIME move (Boehl 2022) maintains an exponential-memory
    global proposal distribution mixed with differential evolution. This
    jit-native rebuild uses the stateless core of that idea: with
    probability ``prob_dime`` a walker proposes from a Gaussian fitted to
    the CURRENT ensemble (per temperature, an adaptive independence
    sampler with the full Metropolis-Hastings q-ratio correction), else a
    differential-evolution jump (symmetric). Exponential memory across
    iterations and t-distribution tails are simplifications documented
    here — the ensemble-moment refitting each call plays the same
    adaptive role under jit without carried state.
    """

    def __init__(self, prob_dime: float = 0.5, sigma_scale: float = 1.2,
                 gamma: float | None = None, periodic=None, **kwargs):
        del kwargs
        self.prob_dime = prob_dime
        self.sigma_scale = sigma_scale
        self.gamma = gamma
        self.periodic = periodic

    def propose(self, key, coords, log_like, log_prior, betas, logp_fn, logl_fn):
        ntemps, nwalkers, ndim = coords.shape
        key, k_sel, k_g, k_pair, k_u = jax.random.split(key, 5)

        # per-temperature ensemble moments
        mean = jnp.mean(coords, axis=1, keepdims=True)
        xc = coords - mean
        cov = jnp.einsum("twi,twj->tij", xc, xc) / (nwalkers - 1)
        cov = cov + 1e-10 * jnp.eye(ndim)
        chol = jnp.linalg.cholesky(cov) * self.sigma_scale

        z = jax.random.normal(k_g, coords.shape)
        prop_ind = mean + jnp.einsum("tij,twj->twi", chol, z)

        # q-ratio for the independence proposal: log q(x) - log q(y)
        inv_chol = jax.vmap(
            lambda c: jax.scipy.linalg.solve_triangular(c, jnp.eye(ndim), lower=True)
        )(chol)

        def logq(x):
            u = jnp.einsum("tij,twj->twi", inv_chol, x - mean)
            return -0.5 * jnp.sum(u * u, axis=-1)

        factors_ind = logq(coords) - logq(prop_ind)

        # differential-evolution branch (symmetric; factors 0)
        gamma = self.gamma if self.gamma is not None else 2.38 / jnp.sqrt(2.0 * ndim)
        ia = jax.random.randint(k_pair, (ntemps, nwalkers), 0, nwalkers)
        ib = jax.random.randint(k_u, (ntemps, nwalkers), 0, nwalkers)
        xa = jnp.take_along_axis(coords, ia[..., None], axis=1)
        xb = jnp.take_along_axis(coords, ib[..., None], axis=1)
        prop_de = coords + gamma * (xa - xb)

        use_ind = jax.random.uniform(k_sel, (ntemps, nwalkers)) < self.prob_dime
        prop = jnp.where(use_ind[..., None], prop_ind, prop_de)
        factors = jnp.where(use_ind, factors_ind, 0.0)

        lp_new = logp_fn(prop.reshape(-1, ndim)).reshape(ntemps, nwalkers)
        ll_new = logl_fn(prop.reshape(-1, ndim)).reshape(ntemps, nwalkers)
        ll_new = jnp.where(jnp.isnan(ll_new), -1e300, ll_new)
        ll_new = jnp.where(jnp.isfinite(lp_new), ll_new, -1e300)

        key, k_acc = jax.random.split(key)
        lnpdiff = factors + betas[:, None] * (ll_new - log_like) + (lp_new - log_prior)
        accept = jnp.log(jax.random.uniform(k_acc, (ntemps, nwalkers))) < lnpdiff
        accept = accept & jnp.isfinite(lp_new)

        coords = jnp.where(accept[..., None], prop, coords)
        log_like = jnp.where(accept, ll_new, log_like)
        log_prior = jnp.where(accept, lp_new, log_prior)
        return coords, log_like, log_prior, jnp.sum(accept, axis=1).astype(jnp.int32)


__all__ = ["StretchMove", "DIMEMove"]
