"""Multiple-try Metropolis with independent distribution draws (jittable).

Rebuilds Eryn's ``MTDistGenMove`` (reference
``Eryn/eryn/moves/multipletry.py:36`` vectorized multiple-try with
logsumexp weights at :25; independence-sampler variant
``mtdistgen.py:7``): per walker, draw ``num_try`` candidates from a fixed
distribution q, weight each by the tempered posterior over q, select one
with probability proportional to its weight, and accept with the
multiple-try ratio

  alpha = sum_j w(y_j) / ( sum_{j != I} w(y_j) + w(x) ),

which for independent draws needs no second candidate cloud (the reverse
cloud reuses the forward draws with the current point swapped in for the
selected candidate — the standard I-MTM estimator).

TPU-native shape: all ``(ntemps, nwalkers, num_try)`` candidates evaluate
in ONE batched likelihood call; selection is a Gumbel-max over log
weights (no per-walker loops).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


class MTDistGenMove:
    """Independent multiple-try Metropolis from a ProbDistContainer."""

    def __init__(self, generate_dist, num_try: int = 10, independent: bool = True,
                 rj: bool = False, **kwargs):
        del kwargs
        if not independent:
            raise NotImplementedError("only independent proposal MT is implemented")
        self.dist = generate_dist
        self.num_try = int(num_try)
        self.rj = rj

    def _draw(self, key, shape):
        """Unit-cube ppf draws -> candidate coordinates, + their log q."""
        u = jax.random.uniform(key, shape)
        cols = []
        for i in range(shape[-1]):
            d = self.dist.priors_in[i]
            cols.append(d.ppf(u[..., i]))
        x = jnp.stack(cols, axis=-1)
        logq = self.dist.logpdf(x)
        return x, logq

    def propose(
        self,
        key: jax.Array,
        coords: jax.Array,  # (ntemps, nwalkers, ndim)
        log_like: jax.Array,  # (ntemps, nwalkers)
        log_prior: jax.Array,
        betas: jax.Array,
        logp_fn: Callable,
        logl_fn: Callable,
    ):
        ntemps, nwalkers, ndim = coords.shape
        j = self.num_try
        key, k_draw, k_sel, k_u = jax.random.split(key, 4)

        cands, logq = self._draw(k_draw, (ntemps, nwalkers, j, ndim))
        flat = cands.reshape(-1, ndim)
        lp_c = logp_fn(flat).reshape(ntemps, nwalkers, j)
        ll_c = logl_fn(flat).reshape(ntemps, nwalkers, j)
        ll_c = jnp.where(jnp.isnan(ll_c), -1e300, ll_c)
        ll_c = jnp.where(jnp.isfinite(lp_c), ll_c, -1e300)

        # log importance weights: tempered posterior over the draw density
        logw = betas[:, None, None] * ll_c + lp_c - logq
        logw = jnp.where(jnp.isfinite(logw), logw, -jnp.inf)

        # Gumbel-max selection ~ categorical(softmax(logw))
        g = -jnp.log(-jnp.log(jax.random.uniform(k_sel, logw.shape)))
        sel = jnp.argmax(logw + g, axis=-1)  # (T, W)

        take = lambda arr: jnp.take_along_axis(arr, sel[..., None], axis=-1)[..., 0]
        y = jnp.take_along_axis(cands, sel[..., None, None], axis=2)[..., 0, :]
        ll_y = take(ll_c)
        lp_y = take(lp_c)

        # current point's weight under the same scheme
        logq_x = self.dist.logpdf(coords)
        logw_x = betas[:, None] * log_like + log_prior - logq_x
        logw_x = jnp.where(jnp.isfinite(logw_x), logw_x, -jnp.inf)

        num = jax.nn.logsumexp(logw, axis=-1)
        # denominator: forward cloud with x replacing the selected draw
        logw_masked = jnp.where(
            jnp.arange(j)[None, None, :] == sel[..., None], -jnp.inf, logw
        )
        den = jnp.logaddexp(jax.nn.logsumexp(logw_masked, axis=-1), logw_x)

        lnpdiff = num - den
        accept = jnp.log(jax.random.uniform(k_u, (ntemps, nwalkers))) < lnpdiff
        accept = accept & jnp.isfinite(lp_y)

        coords = jnp.where(accept[..., None], y, coords)
        log_like = jnp.where(accept, ll_y, log_like)
        log_prior = jnp.where(accept, lp_y, log_prior)
        return coords, log_like, log_prior, jnp.sum(accept, axis=1).astype(jnp.int32)


__all__ = ["MTDistGenMove"]
