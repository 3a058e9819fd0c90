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


class DIMEState(NamedTuple):
    """Carried DIME adaptation state (reference move-object attributes,
    ``Eryn/eryn/moves/stretch.py:287-289``): the exponential-memory AIMH
    proposal moments and the log of their cumulative ensemble weight, plus
    the previous iteration's accepted count feeding the next weight."""

    mean: jax.Array  # (ndim,)
    cov: jax.Array  # (ndim, ndim)
    cumlweight: jax.Array  # scalar
    naccepted: jax.Array  # scalar int32


def _mvt_logpdf(x, mean, scale_cov, df, ndim):
    """Multivariate Student-t logpdf with scale matrix ``scale_cov``.

    The reference evaluates ``multivariate_t.logpdf(..., prop_cov *
    (df-2)/df, df)`` (stretch.py:354-359) — same convention here: the
    caller passes the already-(df-2)/df-scaled matrix.
    """
    chol = jnp.linalg.cholesky(scale_cov + 1e-12 * jnp.eye(ndim))
    u = jax.scipy.linalg.solve_triangular(chol, (x - mean).T, lower=True).T
    maha = jnp.sum(u * u, axis=-1)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    return (
        jax.scipy.special.gammaln(0.5 * (df + ndim))
        - jax.scipy.special.gammaln(0.5 * df)
        - 0.5 * ndim * jnp.log(df * jnp.pi)
        - 0.5 * logdet
        - 0.5 * (df + ndim) * jnp.log1p(maha / df)
    )


class DIMEMove:
    """Differential-Independence Mixture Ensemble move (Boehl 2022).

    Full rebuild of the reference ``DIMEMove`` (``Eryn/eryn/moves/
    stretch.py:245-366``) including the pieces the round-2 version
    simplified away:

    * **exponential memory**: the AIMH proposal moments are a cumulative
      log-sum-exp-weighted average over ALL past ensembles (reference
      ``update_proposal_dist``, :293-320), each weighted by
      ``logsumexp(lprobs) + log(n_accepted) - log(nchain)`` — carried
      across jitted iterations in a `DIMEState` threaded through the
      sampler's ``State.move_info`` slot;
    * **t-distribution tails**: AIMH candidates are multivariate
      Student-t draws with ``df_proposal_dist`` dof and scale
      ``cov (df-2)/df`` (reference ``mvt_sample``, :225-244), with the
      exact t-density MH correction;
    * DE branch ``x + g0 (x_a - x_b) + sigma N(0,1)`` with distinct
      non-self partners (reference :333-339).

    As in the reference, the proposal distribution pools all temperatures
    (one global AIMH mixture). The stateless ``propose`` entry remains for
    schedule mixing; the sampler calls ``propose_stateful`` when it
    threads move state.
    """

    def __init__(self, sigma: float = 1.0e-5, gamma: float | None = None,
                 aimh_prob: float = 0.1, df_proposal_dist: float = 10.0,
                 periodic=None, **kwargs):
        del kwargs
        self.sigma = sigma
        self.gamma = gamma
        self.aimh_prob = aimh_prob
        self.dft = df_proposal_dist
        self.periodic = periodic

    def init_move_state(self, ntemps: int, nwalkers: int, ndim: int) -> DIMEState:
        # reference setup(): prop_cov = I, prop_mean = 0, accepted = ones,
        # cumlweight = -inf (stretch.py:283-291)
        return DIMEState(
            mean=jnp.zeros((ndim,)),
            cov=jnp.eye(ndim),
            cumlweight=jnp.asarray(-jnp.inf),
            naccepted=jnp.asarray(ntemps * nwalkers, jnp.int32),
        )

    def propose(self, key, coords, log_like, log_prior, betas, logp_fn, logl_fn):
        """Stateless entry: one-shot state initialized from the ensemble."""
        ntemps, nwalkers, ndim = coords.shape
        st = self.init_move_state(ntemps, nwalkers, ndim)
        c, ll, lp, n_acc, _ = self.propose_stateful(
            key, coords, log_like, log_prior, betas, logp_fn, logl_fn, st
        )
        return c, ll, lp, n_acc

    def propose_stateful(self, key, coords, log_like, log_prior, betas,
                         logp_fn, logl_fn, move_state: DIMEState):
        ntemps, nwalkers, ndim = coords.shape
        nchain = ntemps * nwalkers
        x = coords.reshape(nchain, ndim)

        # ---- update_proposal_dist (reference :293-320) ----
        lprobs = (betas[:, None] * log_like + log_prior).reshape(nchain)
        lweight = (
            jax.scipy.special.logsumexp(lprobs)
            + jnp.log(jnp.maximum(move_state.naccepted, 1).astype(x.dtype))
            - jnp.log(float(nchain))
        )
        lweight = jnp.where(move_state.naccepted > 0, lweight, -jnp.inf)
        nmean = jnp.mean(x, axis=0)
        xc = x - nmean
        ncov = (xc.T @ xc) / (nchain - 1)
        newcum = jnp.logaddexp(move_state.cumlweight, lweight)
        # guard the -inf/-inf start: weights fall back to (old=0, new=1)
        w_old = jnp.where(
            jnp.isfinite(newcum), jnp.exp(move_state.cumlweight - newcum), 0.0
        )
        w_new = jnp.where(jnp.isfinite(newcum), jnp.exp(lweight - newcum), 1.0)
        mean = w_old * move_state.mean + w_new * nmean
        cov = w_old * move_state.cov + w_new * ncov
        newcum = jnp.where(jnp.isfinite(newcum), newcum, lweight)

        key, k_i0, k_i1, k_f, k_sel, k_z, k_chi, k_acc = jax.random.split(key, 8)

        # ---- DE branch: distinct non-self partners (reference :333-339) ----
        gamma = self.gamma if self.gamma is not None else 2.38 / jnp.sqrt(2.0 * ndim)
        ar = jnp.arange(nchain)
        i0 = ar + jax.random.randint(k_i0, (nchain,), 1, nchain)
        i1 = ar + jax.random.randint(k_i1, (nchain,), 1, nchain - 1)
        i1 = i1 + (i1 >= i0)
        f = self.sigma * jax.random.normal(k_f, (nchain,))
        q = x + gamma * (x[i0 % nchain] - x[i1 % nchain]) + f[:, None]
        factors = jnp.zeros((nchain,), x.dtype)

        # ---- AIMH branch: multivariate-t candidates (reference :341-362) ----
        scale_cov = cov * (self.dft - 2.0) / self.dft
        chol = jnp.linalg.cholesky(scale_cov + 1e-12 * jnp.eye(ndim))
        z = jax.random.normal(k_z, (nchain, ndim)) @ chol.T
        chi2 = jax.random.chisquare(k_chi, self.dft, (nchain,)) / self.dft
        xcand = mean + z / jnp.sqrt(chi2)[:, None]
        lq_old = _mvt_logpdf(x, mean, scale_cov, self.dft, ndim)
        lq_new = _mvt_logpdf(xcand, mean, scale_cov, self.dft, ndim)

        xchnge = jax.random.uniform(k_sel, (nchain,)) <= self.aimh_prob
        q = jnp.where(xchnge[:, None], xcand, q)
        factors = jnp.where(xchnge, lq_old - lq_new, factors)

        prop = q.reshape(ntemps, nwalkers, ndim)
        factors = factors.reshape(ntemps, nwalkers)

        lp_new = logp_fn(prop.reshape(-1, ndim)).reshape(ntemps, nwalkers)
        ll_new = logl_fn(prop.reshape(-1, ndim)).reshape(ntemps, nwalkers)
        ll_new = jnp.where(jnp.isnan(ll_new), -1e300, ll_new)
        ll_new = jnp.where(jnp.isfinite(lp_new), ll_new, -1e300)

        lnpdiff = factors + betas[:, None] * (ll_new - log_like) + (lp_new - log_prior)
        accept = jnp.log(jax.random.uniform(k_acc, (ntemps, nwalkers))) < lnpdiff
        accept = accept & jnp.isfinite(lp_new)

        coords = jnp.where(accept[..., None], prop, coords)
        log_like = jnp.where(accept, ll_new, log_like)
        log_prior = jnp.where(accept, lp_new, log_prior)
        n_acc = jnp.sum(accept, axis=1).astype(jnp.int32)
        new_state = DIMEState(
            mean=mean, cov=cov, cumlweight=newcum,
            naccepted=jnp.sum(accept).astype(jnp.int32),
        )
        return coords, log_like, log_prior, n_acc, new_state


__all__ = ["StretchMove", "DIMEMove", "DIMEState"]
