"""Parallel-tempering ladder, swaps and adaptation (jittable).

Rebuilds Eryn's tempering machinery (reference
``Eryn/eryn/moves/tempering.py``: ``make_ladder``:10 with the 25%-swap-target
geometric spacing and ``Tmax=inf -> beta=0`` top rung at :170-195;
``TemperatureControl``:200 with the nearest-neighbor swap cascade hot->cold
using permuted walkers and accept rule ``dbeta (logl_i - logl_{i-1}) >
log u`` at :479-541; adaptive ladder per arXiv:1501.05823 at :543-577).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Geometric temperature-step targets for ~25% swap acceptance vs ndim
# (asymptotic form 1 + 2.84/sqrt(d) from the Vousden-Farr-Mandel analysis;
# exact for large d, adequate seeding for small d since the ladder adapts).
def _tstep(ndim: int) -> float:
    return 1.0 + 2.84 / np.sqrt(ndim)


def make_ladder(ndim: int, ntemps: int | None = None, Tmax: float | None = None) -> np.ndarray:
    """Geometric inverse-temperature ladder (reference ``make_ladder``).

    Returns betas descending from 1. ``Tmax=inf`` pins the top rung at
    beta = 0 (prior sampling), as the reference does for evidence estimates.
    """
    if ntemps is None:
        if Tmax is None:
            raise ValueError("specify ntemps and/or Tmax")
        ntemps = int(np.ceil(np.log(Tmax) / np.log(_tstep(ndim)))) + 1
    step = _tstep(ndim)
    if Tmax is not None and not np.isinf(Tmax) and ntemps > 1:
        step = Tmax ** (1.0 / (ntemps - 1))
    betas = step ** (-np.arange(ntemps, dtype=np.float64))
    if Tmax is not None and np.isinf(Tmax):
        betas[-1] = 0.0
    return betas


class TemperatureControl:
    """Swap cascade + ladder adaptation over (ntemps, nwalkers) ensembles."""

    def __init__(
        self,
        ndim: int,
        nwalkers: int,
        ntemps: int = 1,
        betas=None,
        Tmax=None,
        adaptive: bool = True,
        adaptation_lag: float = 10000.0,
        adaptation_time: float = 100.0,
        stop_adaptation: int = -1,
        permute: bool = True,
    ):
        if betas is None:
            betas = make_ladder(ndim, ntemps, Tmax)
        self.betas = jnp.asarray(betas)
        self.ntemps = len(betas)
        self.nwalkers = nwalkers
        self.adaptive = adaptive and self.ntemps > 1
        self.adaptation_lag = adaptation_lag
        self.adaptation_time = adaptation_time
        self.stop_adaptation = stop_adaptation
        self.permute = permute

    def temperature_swaps(self, key, coords, log_like, log_prior, betas):
        """Nearest-neighbor swap cascade from the hottest pair down.

        Returns (coords, log_like, log_prior, swap_accept_frac (ntemps-1,)).
        """
        ntemps, nwalkers = log_like.shape
        ratios = []
        for i in range(ntemps - 1, 0, -1):
            key, k_perm1, k_perm2, k_u = jax.random.split(key, 4)
            if self.permute:
                p_hot = jax.random.permutation(k_perm1, nwalkers)
                p_cold = jax.random.permutation(k_perm2, nwalkers)
            else:
                p_hot = jnp.arange(nwalkers)
                p_cold = jnp.arange(nwalkers)

            ll_hot = log_like[i, p_hot]
            ll_cold = log_like[i - 1, p_cold]
            dbeta = betas[i - 1] - betas[i]
            raccept = jnp.log(jax.random.uniform(k_u, (nwalkers,)))
            sel = raccept < dbeta * (ll_hot - ll_cold)
            ratios.append(jnp.mean(sel.astype(jnp.float64)))

            # swap accepted pairs between rungs i and i-1
            x_hot = coords[i, p_hot]
            x_cold = coords[i - 1, p_cold]
            lp_hot = log_prior[i, p_hot]
            lp_cold = log_prior[i - 1, p_cold]

            new_hot_x = jnp.where(sel[:, None], x_cold, x_hot)
            new_cold_x = jnp.where(sel[:, None], x_hot, x_cold)
            new_hot_ll = jnp.where(sel, ll_cold, ll_hot)
            new_cold_ll = jnp.where(sel, ll_hot, ll_cold)
            new_hot_lp = jnp.where(sel, lp_cold, lp_hot)
            new_cold_lp = jnp.where(sel, lp_hot, lp_cold)

            coords = coords.at[i, p_hot].set(new_hot_x).at[i - 1, p_cold].set(new_cold_x)
            log_like = log_like.at[i, p_hot].set(new_hot_ll).at[i - 1, p_cold].set(new_cold_ll)
            log_prior = log_prior.at[i, p_hot].set(new_hot_lp).at[i - 1, p_cold].set(new_cold_lp)

        swap_frac = jnp.stack(ratios[::-1]) if ratios else jnp.zeros((0,))
        return coords, log_like, log_prior, swap_frac

    def temperature_swaps_tree(self, key, tree, log_like, log_prior, betas):
        """Swap cascade over an arbitrary state pytree.

        ``tree``: any pytree whose leaves are (ntemps, nwalkers, ...) arrays
        (multi-branch coords/inds dicts). Same cascade as
        `temperature_swaps`, applied leaf-wise.
        """
        ntemps, nwalkers = log_like.shape
        ratios = []
        for i in range(ntemps - 1, 0, -1):
            key, k_perm1, k_perm2, k_u = jax.random.split(key, 4)
            if self.permute:
                p_hot = jax.random.permutation(k_perm1, nwalkers)
                p_cold = jax.random.permutation(k_perm2, nwalkers)
            else:
                p_hot = jnp.arange(nwalkers)
                p_cold = jnp.arange(nwalkers)

            ll_hot = log_like[i, p_hot]
            ll_cold = log_like[i - 1, p_cold]
            dbeta = betas[i - 1] - betas[i]
            raccept = jnp.log(jax.random.uniform(k_u, (nwalkers,)))
            sel = raccept < dbeta * (ll_hot - ll_cold)
            ratios.append(jnp.mean(sel.astype(jnp.float64)))

            def swap_leaf(x, i=i, p_hot=p_hot, p_cold=p_cold, sel=sel):
                x_hot = x[i, p_hot]
                x_cold = x[i - 1, p_cold]
                selb = sel.reshape((nwalkers,) + (1,) * (x.ndim - 2))
                new_hot = jnp.where(selb, x_cold, x_hot)
                new_cold = jnp.where(selb, x_hot, x_cold)
                return x.at[i, p_hot].set(new_hot).at[i - 1, p_cold].set(new_cold)

            tree = jax.tree.map(swap_leaf, tree)
            lp_hot = log_prior[i, p_hot]
            lp_cold = log_prior[i - 1, p_cold]
            log_like = (
                log_like.at[i, p_hot].set(jnp.where(sel, ll_cold, ll_hot))
                .at[i - 1, p_cold].set(jnp.where(sel, ll_hot, ll_cold))
            )
            log_prior = (
                log_prior.at[i, p_hot].set(jnp.where(sel, lp_cold, lp_hot))
                .at[i - 1, p_cold].set(jnp.where(sel, lp_hot, lp_cold))
            )

        swap_frac = jnp.stack(ratios[::-1]) if ratios else jnp.zeros((0,))
        return tree, log_like, log_prior, swap_frac

    def adapt_ladder(self, betas, swap_frac, time):
        """Vousden et al. adaptation step (reference ``:543-577``).

        ``swap_frac``: (ntemps-1,) acceptance per adjacent pair (cold-first).
        """
        if not self.adaptive:
            return betas
        decay = self.adaptation_lag / (time + self.adaptation_lag)
        kappa = decay / self.adaptation_time
        # adjust the temperature spacings of the non-top rungs by the
        # difference of adjacent swap rates (drives all rates equal)
        dss = kappa * (swap_frac[:-1] - swap_frac[1:])  # (ntemps-2,)
        ts = 1.0 / jnp.maximum(betas[:-1], 1e-300)  # temperatures, cold->hot
        delta_ts = jnp.diff(ts) * jnp.exp(dss)  # (ntemps-2,)
        ts_new = jnp.cumsum(delta_ts) + ts[0]
        # beta[0] stays 1; the top rung (possibly beta=0) stays fixed
        return betas.at[1:-1].set(1.0 / ts_new)


__all__ = ["make_ladder", "TemperatureControl"]
