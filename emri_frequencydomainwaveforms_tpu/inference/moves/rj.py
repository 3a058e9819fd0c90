"""Reversible-jump birth/death move (prior-draw births), jittable.

Rebuilds the core of Eryn's RJ machinery (reference ``Eryn/eryn/moves/rj.py:14``
— birth/death across the ``nleaves`` axis with ``get_model_change_proposal``
:122 — and ``moves/distgenrj.py:11`` ``DistributionGenerateRJ``: births drawn
from the prior, so the prior density cancels the proposal density and the
acceptance factors reduce to the leaf-count combinatorics).

State layout follows the Eryn contract: ``coords (ntemps, nwalkers,
nleaves_max, ndim)`` with boolean ``inds`` activating leaves. One call makes
one birth-or-death proposal per walker:

  * birth: activate a uniformly-chosen inactive leaf at a prior draw;
    q(birth) selects among ``n_inactive`` slots, reverse death selects among
    ``n_active + 1`` -> factors = log(n_inactive) - log(n_active + 1);
  * death: deactivate a uniformly-chosen active leaf;
    factors = log(n_active) - log(n_inactive + 1).

The log-likelihood callable receives ``(coords, inds)`` for a whole
(ntemps*nwalkers) batch and must handle masked leaves (e.g. a
GlobalLikelihood-style summed template). Ensemble-sampler integration of the
trans-dimensional bookkeeping is tracked in PARITY.md; this move is usable
standalone or from custom loops.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


class DistributionGenerateRJ:
    """Prior-draw RJ birth/death.

    Two interfaces, matching the reference's evolution:
    * single-branch arrays via `propose` (``prior`` a ProbDistContainer,
      ``nleaves_min/max`` ints) — standalone/custom-loop use;
    * multi-branch trees via `propose_tree` (``prior`` a dict
      ``branch -> ProbDistContainer``, ``nleaves_min/max`` dicts), the form
      `EnsembleSampler(rj_moves=...)` consumes: one birth-or-death proposal
      per walker per branch, branches updated in sequence (Gibbs).
    """

    def __init__(self, prior, nleaves_min=0, nleaves_max=1):
        self.prior = prior  # ProbDistContainer (or dict of them, tree mode)
        self.nleaves_min = nleaves_min
        self.nleaves_max = nleaves_max

    def _make_sub(self, prior_b, lo, hi):
        """Per-branch sub-mover factory (overridden by DelayedRejectionRJ)."""
        return DistributionGenerateRJ(prior_b, nleaves_min=lo, nleaves_max=hi)

    def propose_tree(self, key, coords: dict, inds: dict, log_like, log_prior,
                     betas, logp_fn, logl_fn):
        """Tree-contract RJ: per-branch birth/death, sequential accepts.

        ``logp_fn(coords, inds)`` / ``logl_fn(coords, inds)`` -> (T, W).
        Returns (coords, inds, log_like, log_prior, n_accepted).
        """
        priors = self.prior if isinstance(self.prior, dict) else {
            next(iter(coords)): self.prior
        }
        n_acc_total = None
        coords = dict(coords)
        inds = dict(inds)
        for name in coords:
            key, k_b = jax.random.split(key)
            prior_b = priors[name]
            lo = self.nleaves_min[name] if isinstance(self.nleaves_min, dict) else self.nleaves_min
            hi = self.nleaves_max[name] if isinstance(self.nleaves_max, dict) else self.nleaves_max
            sub = self._make_sub(prior_b, lo, hi)

            def logl_branch(c_b, i_b, _name=name):
                c_all = {**coords, _name: c_b}
                i_all = {**inds, _name: i_b}
                return logl_fn(c_all, i_all)

            def logp_branch(c_b, i_b, _name=name):
                c_all = {**coords, _name: c_b}
                i_all = {**inds, _name: i_b}
                return logp_fn(c_all, i_all)

            c_new, i_new, log_like, log_prior, n_acc = sub._propose_arrays(
                k_b, coords[name], inds[name], log_like, log_prior, betas,
                logl_branch, logp_branch,
            )
            coords[name] = c_new
            inds[name] = i_new
            n_acc_total = n_acc if n_acc_total is None else n_acc_total + n_acc
        return coords, inds, log_like, log_prior, n_acc_total

    def propose(
        self,
        key: jax.Array,
        coords: jax.Array,  # (ntemps, nwalkers, nleaves_max, ndim)
        inds: jax.Array,  # bool (ntemps, nwalkers, nleaves_max)
        log_like: jax.Array,  # (ntemps, nwalkers)
        log_prior: jax.Array,
        betas: jax.Array,
        logl_fn: Callable,  # (coords, inds) -> (ntemps, nwalkers)
    ):
        return self._propose_arrays(
            key, coords, inds, log_like, log_prior, betas, logl_fn, None
        )

    def _propose_arrays(self, key, coords, inds, log_like, log_prior, betas,
                        logl_fn, logp_fn):
        ntemps, nwalkers, nleaves_max, ndim = coords.shape
        k_bd, k_slot, k_draw, k_u = jax.random.split(key, 4)

        n_active = jnp.sum(inds, axis=-1)  # (T, W)
        can_birth = n_active < self.nleaves_max
        can_death = n_active > self.nleaves_min
        do_birth = jnp.where(
            can_birth & can_death,
            jax.random.uniform(k_bd, (ntemps, nwalkers)) < 0.5,
            can_birth,
        )

        # choose a slot: among inactive for birth, among active for death.
        u_slot = jax.random.uniform(k_slot, (ntemps, nwalkers, nleaves_max))
        score_birth = jnp.where(inds, -jnp.inf, u_slot)
        score_death = jnp.where(inds, u_slot, -jnp.inf)
        slot = jnp.where(
            do_birth,
            jnp.argmax(score_birth, axis=-1),
            jnp.argmax(score_death, axis=-1),
        )  # (T, W)

        # prior draw for births via the unit-cube ppf (jit-safe: uniform
        # component-wise ppf; multi-index priors draw componentwise too)
        u = jax.random.uniform(k_draw, (ntemps, nwalkers, ndim))
        new_leaf = self._ppf(u)

        onehot = jax.nn.one_hot(slot, nleaves_max, dtype=bool)
        inds_new = jnp.where(do_birth[..., None], inds | onehot, inds & ~onehot)
        coords_new = jnp.where(
            (do_birth[..., None] & onehot)[..., None], new_leaf[..., None, :], coords
        )

        if logp_fn is not None:
            lp_new = logp_fn(coords_new, inds_new)  # full-tree prior
        else:
            lp_new = self._leaf_logprior(coords_new, inds_new)
        ll_new = logl_fn(coords_new, inds_new)
        ll_new = jnp.where(jnp.isnan(ll_new), -1e300, ll_new)

        n_inactive = nleaves_max - n_active
        factors_birth = jnp.log(jnp.maximum(n_inactive, 1)) - jnp.log(n_active + 1.0)
        factors_death = jnp.log(jnp.maximum(n_active, 1)) - jnp.log(n_inactive + 1.0)
        factors = jnp.where(do_birth, factors_birth, factors_death)
        # prior-draw births: prior density of the new leaf cancels q(draw),
        # so only the delta of the REMAINING prior terms enters; with
        # independent leaves that is zero for birth and zero for death.
        lnpdiff = factors + betas[:, None] * (ll_new - log_like)

        accept = jnp.log(jax.random.uniform(k_u, (ntemps, nwalkers))) < lnpdiff
        legal = jnp.where(do_birth, can_birth, can_death)
        accept = accept & legal

        coords = jnp.where(accept[..., None, None], coords_new, coords)
        inds = jnp.where(accept[..., None], inds_new, inds)
        log_like = jnp.where(accept, ll_new, log_like)
        log_prior = jnp.where(accept, lp_new, log_prior)
        return coords, inds, log_like, log_prior, jnp.sum(accept, axis=1).astype(jnp.int32)

    def _ppf(self, u):
        cols = []
        for i in range(u.shape[-1]):
            dist = self.prior.priors_in.get(i)
            if dist is None or not hasattr(dist, "min_val"):
                raise NotImplementedError("RJ prior draws need per-index uniform-like dists")
            cols.append(dist.min_val + u[..., i] * (dist.max_val - dist.min_val))
        return jnp.stack(cols, axis=-1)

    def _leaf_logprior(self, coords, inds):
        lp_leaf = self.prior.logpdf(coords)  # (T, W, L)
        return jnp.sum(jnp.where(inds, lp_leaf, 0.0), axis=-1)


class DelayedRejectionRJ(DistributionGenerateRJ):
    """RJ birth/death with delayed rejection on rejected births.

    Rebuilds Eryn's RJ-specific ``DelayedRejection`` (reference
    ``Eryn/eryn/moves/delayedrejection.py:31``: "We apply the DR algorithm
    only on the cases where we have rejected a +1 proposal"): after the
    standard birth/death stage, walkers whose BIRTH was rejected redraw the
    born leaf up to ``max_iter`` times, each stage accepted with the
    Tierney-Mira recursion the reference implements at ``:100-113``:

      alpha_1(y_k)  = min(1, exp(lndiff_k))
      dr_alpha(y_k) = min(1, exp(lndiff_k + log(1 - alpha_1(y_k))
                                          - log(1 - past_alpha)))

    with ``past_alpha`` the previous stage's dr_alpha (stage 0: the plain
    acceptance probability) and NaNs auto-rejected. Prior-draw births keep
    the prior/proposal cancellation, so ``lndiff_k`` carries only the
    leaf-count combinatorics plus the tempered likelihood delta — each DR
    stage costs one batched likelihood call.
    """

    def __init__(self, prior, nleaves_min=0, nleaves_max=1, max_iter: int = 5):
        super().__init__(prior, nleaves_min=nleaves_min, nleaves_max=nleaves_max)
        self.max_iter = int(max_iter)

    def _make_sub(self, prior_b, lo, hi):
        return DelayedRejectionRJ(
            prior_b, nleaves_min=lo, nleaves_max=hi, max_iter=self.max_iter
        )

    def _propose_arrays(self, key, coords, inds, log_like, log_prior, betas,
                        logl_fn, logp_fn):
        ntemps, nwalkers, nleaves_max, ndim = coords.shape
        key, k0 = jax.random.split(key)

        # ---- stage 0: standard birth/death, tracking rejected births ----
        k_bd, k_slot, k_draw, k_u = jax.random.split(k0, 4)
        n_active = jnp.sum(inds, axis=-1)
        can_birth = n_active < self.nleaves_max
        can_death = n_active > self.nleaves_min
        do_birth = jnp.where(
            can_birth & can_death,
            jax.random.uniform(k_bd, (ntemps, nwalkers)) < 0.5,
            can_birth,
        )
        u_slot = jax.random.uniform(k_slot, (ntemps, nwalkers, nleaves_max))
        score_birth = jnp.where(inds, -jnp.inf, u_slot)
        score_death = jnp.where(inds, u_slot, -jnp.inf)
        slot = jnp.where(
            do_birth, jnp.argmax(score_birth, axis=-1), jnp.argmax(score_death, axis=-1)
        )
        onehot = jax.nn.one_hot(slot, nleaves_max, dtype=bool)

        n_inactive = nleaves_max - n_active
        factors_birth = jnp.log(jnp.maximum(n_inactive, 1)) - jnp.log(n_active + 1.0)
        factors_death = jnp.log(jnp.maximum(n_active, 1)) - jnp.log(n_inactive + 1.0)
        factors = jnp.where(do_birth, factors_birth, factors_death)
        legal = jnp.where(do_birth, can_birth, can_death)

        def eval_candidate(k_draw_i):
            u = jax.random.uniform(k_draw_i, (ntemps, nwalkers, ndim))
            new_leaf = self._ppf(u)
            inds_new = jnp.where(do_birth[..., None], inds | onehot, inds & ~onehot)
            coords_new = jnp.where(
                (do_birth[..., None] & onehot)[..., None],
                new_leaf[..., None, :],
                coords,
            )
            if logp_fn is not None:
                lp_new = logp_fn(coords_new, inds_new)
            else:
                lp_new = self._leaf_logprior(coords_new, inds_new)
            ll_new = logl_fn(coords_new, inds_new)
            ll_new = jnp.where(jnp.isnan(ll_new), -1e300, ll_new)
            lndiff = factors + betas[:, None] * (ll_new - log_like)
            return coords_new, inds_new, ll_new, lp_new, lndiff

        coords_new, inds_new, ll_new, lp_new, lndiff = eval_candidate(k_draw)
        accept = (jnp.log(jax.random.uniform(k_u, (ntemps, nwalkers))) < lndiff) & legal

        out_coords = jnp.where(accept[..., None, None], coords_new, coords)
        out_inds = jnp.where(accept[..., None], inds_new, inds)
        out_ll = jnp.where(accept, ll_new, log_like)
        out_lp = jnp.where(accept, lp_new, log_prior)

        # ---- DR stages on rejected births only ----
        # past_alpha: stage-0 acceptance probability of the rejected path
        past_alpha = jnp.clip(jnp.exp(jnp.minimum(lndiff, 0.0)), 0.0, 1.0 - 1e-12)
        in_dr = (~accept) & do_birth & legal

        for _ in range(self.max_iter):
            key, k_draw_i, k_u_i = jax.random.split(key, 3)
            c_k, i_k, ll_k, lp_k, lndiff_k = eval_candidate(k_draw_i)
            alpha_1 = jnp.clip(jnp.exp(jnp.minimum(lndiff_k, 0.0)), 0.0, 1.0 - 1e-12)
            log_dr = lndiff_k + jnp.log1p(-alpha_1) - jnp.log1p(-past_alpha)
            dr_alpha = jnp.clip(jnp.exp(jnp.minimum(log_dr, 0.0)), 0.0, 1.0)
            dr_alpha = jnp.where(jnp.isnan(dr_alpha), 0.0, dr_alpha)
            acc_k = in_dr & (jax.random.uniform(k_u_i, (ntemps, nwalkers)) < dr_alpha)

            out_coords = jnp.where(acc_k[..., None, None], c_k, out_coords)
            out_inds = jnp.where(acc_k[..., None], i_k, out_inds)
            out_ll = jnp.where(acc_k, ll_k, out_ll)
            out_lp = jnp.where(acc_k, lp_k, out_lp)
            accept = accept | acc_k
            in_dr = in_dr & ~acc_k
            past_alpha = jnp.where(in_dr, jnp.clip(dr_alpha, 0.0, 1.0 - 1e-12), past_alpha)

        return out_coords, out_inds, out_ll, out_lp, jnp.sum(accept, axis=1).astype(jnp.int32)


__all__ = ["DistributionGenerateRJ", "DelayedRejectionRJ"]
