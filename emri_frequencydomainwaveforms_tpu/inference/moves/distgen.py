"""Independence MH move drawing from a fixed distribution (jittable).

Rebuilds Eryn's ``DistributionGenerate`` (reference
``Eryn/eryn/moves/distgen.py:10``): propose brand-new coordinates for every
active leaf from a supplied distribution q, with the asymmetric-proposal
factors ``+log q(old) - log q(new)`` entering the MH ratio (reference
``get_proposal`` accumulates exactly these per leaf). Useful as a
mode-hopping / prior-exploration move in schedules alongside local moves.

Both ensemble contracts are provided: flat single-branch ``propose`` and
multi-branch ``propose_tree`` (all branches redrawn in one proposal with
summed factors, matching the reference's single accept).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ppf_draw(dist, u):
    """Unit-cube -> coordinates via the container's per-index ppf."""
    cols = []
    for i in range(u.shape[-1]):
        d = dist.priors_in[i]
        cols.append(d.ppf(u[..., i]))
    return jnp.stack(cols, axis=-1)


class DistributionGenerate:
    """Prior/distribution-draw MH (independence sampler).

    ``generate_dist``: a ProbDistContainer (flat use) or a dict
    ``branch -> ProbDistContainer`` (tree use).
    """

    def __init__(self, generate_dist, periodic=None, **kwargs):
        del kwargs
        self.dist = generate_dist
        self.periodic = periodic  # unused (draws are already in-support)

    def propose(self, key, coords, *args):
        """Dispatch on state shape: dict coords -> tree contract (the
        ensemble's multi-branch ``_step_tree`` passes ``inds`` second), flat
        array -> single-branch contract."""
        if isinstance(coords, dict):
            return self.propose_tree(key, coords, *args)
        return self._propose_flat(key, coords, *args)

    # ---- flat single-branch contract ----
    def _propose_flat(self, key, coords, log_like, log_prior, betas, logp_fn, logl_fn):
        ntemps, nwalkers, ndim = coords.shape
        dist = (
            next(iter(self.dist.values())) if isinstance(self.dist, dict) else self.dist
        )
        key, k_draw, k_u = jax.random.split(key, 3)

        u = jax.random.uniform(k_draw, (ntemps, nwalkers, ndim))
        q = _ppf_draw(dist, u)
        factors = dist.logpdf(coords) - dist.logpdf(q)

        lp_new = logp_fn(q.reshape(-1, ndim)).reshape(ntemps, nwalkers)
        ll_new = logl_fn(q.reshape(-1, ndim)).reshape(ntemps, nwalkers)
        ll_new = jnp.where(jnp.isnan(ll_new), -1e300, ll_new)
        ll_new = jnp.where(jnp.isfinite(lp_new), ll_new, -1e300)

        lnpdiff = (
            factors
            + betas[:, None] * (ll_new - log_like)
            + lp_new
            - log_prior
        )
        accept = jnp.log(jax.random.uniform(k_u, (ntemps, nwalkers))) < lnpdiff
        accept = accept & jnp.isfinite(lp_new)

        coords = jnp.where(accept[..., None], q, coords)
        log_like = jnp.where(accept, ll_new, log_like)
        log_prior = jnp.where(accept, lp_new, log_prior)
        return coords, log_like, log_prior, jnp.sum(accept, axis=1).astype(jnp.int32)

    # ---- tree multi-branch contract ----
    def propose_tree(self, key, coords, inds, log_like, log_prior, betas,
                     logp_fn, logl_fn):
        dists = self.dist if isinstance(self.dist, dict) else {
            name: self.dist for name in coords
        }
        key, k_u = jax.random.split(key)
        some = next(iter(coords.values()))
        ntemps, nwalkers = some.shape[:2]

        q = {}
        factors = jnp.zeros((ntemps, nwalkers))
        for name, c in coords.items():
            key, k_draw = jax.random.split(key)
            dist = dists[name]
            u = jax.random.uniform(k_draw, c.shape)
            drawn = _ppf_draw(dist, u)
            # redraw ACTIVE leaves only (reference ``inds_here`` selection)
            q[name] = jnp.where(inds[name][..., None], drawn, c)
            lq_old = dist.logpdf(c)  # (T, W, L)
            lq_new = dist.logpdf(drawn)
            factors = factors + jnp.sum(
                jnp.where(inds[name], lq_old - lq_new, 0.0), axis=-1
            )

        lp_new = logp_fn(q, inds)
        ll_new = logl_fn(q, inds)
        ll_new = jnp.where(jnp.isnan(ll_new), -1e300, ll_new)
        ll_new = jnp.where(jnp.isfinite(lp_new), ll_new, -1e300)

        lnpdiff = (
            factors + betas[:, None] * (ll_new - log_like) + lp_new - log_prior
        )
        accept = jnp.log(jax.random.uniform(k_u, (ntemps, nwalkers))) < lnpdiff
        accept = accept & jnp.isfinite(lp_new)

        coords = {
            name: jnp.where(accept[..., None, None], q[name], c)
            for name, c in coords.items()
        }
        log_like = jnp.where(accept, ll_new, log_like)
        log_prior = jnp.where(accept, lp_new, log_prior)
        return coords, inds, log_like, log_prior, jnp.sum(accept, axis=1).astype(jnp.int32)


__all__ = ["DistributionGenerate"]
