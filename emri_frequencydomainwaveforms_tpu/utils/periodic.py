"""Periodic-parameter handling for ensemble moves.

Rebuilds Eryn's ``PeriodicContainer`` (reference
``Eryn/eryn/utils/periodic.py:11-128``): shortest signed distances and
wrapping for angle-like parameters, keyed by branch name and parameter
index (sampler usage pinned at reference ``emri_pe.py:158``:
``periodic = {"emri": {4: 2 pi, 5: pi}}``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class PeriodicContainer:
    """Distance/wrap helpers over {branch: {param_index: period}}."""

    def __init__(self, periodic: dict):
        self.periodic = {k: dict(v) for k, v in periodic.items()} if periodic else {}

    def _vectors(self, name: str, ndim: int):
        inds = np.array(sorted(self.periodic.get(name, {})), dtype=np.int64)
        periods = np.array([self.periodic[name][i] for i in inds])
        mask = np.zeros((ndim,))
        pvec = np.ones((ndim,))
        mask[inds] = 1.0
        pvec[inds] = periods
        return jnp.asarray(mask), jnp.asarray(pvec)

    def distance(self, p1: dict, p2: dict) -> dict:
        """Shortest signed distance p2 - p1 per branch (reference ``:32``)."""
        out = {}
        for name, x1 in p1.items():
            x1 = jnp.asarray(x1)
            x2 = jnp.asarray(p2[name])
            mask, period = self._vectors(name, x1.shape[-1])
            d = x2 - x1
            wrapped = d - period * jnp.round(d / period)
            out[name] = jnp.where(mask > 0, wrapped, d)
        return out

    def wrap(self, params: dict) -> dict:
        """Wrap periodic components into [0, period) (reference ``:96``)."""
        out = {}
        for name, x in params.items():
            x = jnp.asarray(x)
            mask, period = self._vectors(name, x.shape[-1])
            wrapped = jnp.mod(x, period)
            out[name] = jnp.where(mask > 0, wrapped, x)
        return out

    def wrap_array(self, name: str, x):
        """Array-level wrap for a single branch (jit-friendly)."""
        x = jnp.asarray(x)
        mask, period = self._vectors(name, x.shape[-1])
        return jnp.where(mask > 0, jnp.mod(x, period), x)

    def distance_array(self, name: str, x1, x2):
        x1 = jnp.asarray(x1)
        x2 = jnp.asarray(x2)
        mask, period = self._vectors(name, x1.shape[-1])
        d = x2 - x1
        return jnp.where(mask > 0, d - period * jnp.round(d / period), d)


__all__ = ["PeriodicContainer"]
