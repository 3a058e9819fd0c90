"""In-memory chain backend.

Rebuilds Eryn's ``Backend`` (reference ``Eryn/eryn/backends/backend.py:11``:
``reset``:71 allocating growable ``(nsteps, ntemps, nwalkers, nleaves_max,
ndim)`` chains, ``grow``:679, ``save_step``:825, getters including
``get_chain``, ``get_log_like``, ``get_last_sample``:548,
``get_autocorr_time``:561 and the stepping-stone/TI evidence estimate
``get_evidence_estimate``:604).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..state import Branch, State, make_state


class Backend:
    """Growable numpy chain store with Eryn-compatible getters."""

    def __init__(self, dtype=np.float64):
        self.dtype = dtype
        self.initialized = False
        self.info = {}

    def reset(self, nwalkers, ndims, ntemps=1, nleaves_max=1, branch_names=None, **kwargs):
        self.nwalkers = nwalkers
        self.branch_names = branch_names or ["model_0"]
        if isinstance(ndims, dict):
            self.ndims = {k: int(v) for k, v in ndims.items()}
        elif isinstance(ndims, (list, tuple, np.ndarray)):
            self.ndims = {k: int(d) for k, d in zip(self.branch_names, ndims)}
        else:
            self.ndims = {k: int(ndims) for k in self.branch_names}
        self.ndim = self.ndims[self.branch_names[0]]
        self.ntemps = ntemps
        if isinstance(nleaves_max, dict):
            self.nleaves_max = {k: int(v) for k, v in nleaves_max.items()}
        elif isinstance(nleaves_max, (list, tuple, np.ndarray)):
            self.nleaves_max = {k: int(v) for k, v in zip(self.branch_names, nleaves_max)}
        else:
            self.nleaves_max = {k: int(nleaves_max) for k in self.branch_names}
        self.iteration = 0
        self._chain = {k: [] for k in self.branch_names}
        self._inds = {k: [] for k in self.branch_names}
        self._log_like = []
        self._log_prior = []
        self._betas = []
        self._accepted = np.zeros((ntemps, nwalkers))
        self._rj_accepted = np.zeros((ntemps, nwalkers))
        self._swaps_accepted = np.zeros((max(ntemps - 1, 0),))
        self._rstate = None
        self.initialized = True

    def grow(self, ngrow, blobs=None):
        pass  # python lists grow dynamically

    def save_step(self, state: State, accepted, rj_accepted=None, swaps_accepted=None, swap_frac=None):
        for name in self.branch_names:
            b = state.branches[name]
            coords = np.asarray(b.coords)
            inds = np.asarray(b.inds)
            # inactive leaves stored as NaN (reference save_step missing-leaf
            # fill) so flat chains can be filtered with ~isnan
            coords = np.where(inds[..., None], coords, np.nan)
            self._chain[name].append(coords)
            self._inds[name].append(inds)
        self._log_like.append(np.asarray(state.log_like))
        self._log_prior.append(np.asarray(state.log_prior))
        self._betas.append(np.asarray(state.betas))
        acc = np.asarray(accepted)
        if acc.ndim == 1:
            self._accepted += acc[:, None] / max(self.nwalkers, 1)
        else:
            self._accepted += acc
        if rj_accepted is not None:
            rj = np.asarray(rj_accepted)
            if rj.ndim == 1:
                self._rj_accepted += rj[:, None] / max(self.nwalkers, 1)
            else:
                self._rj_accepted += rj
        if swap_frac is not None and len(swap_frac):
            self._swaps_accepted += np.asarray(swap_frac)
        self._rstate = state.random_state
        self.iteration += 1

    # ---- getters ----
    def _stack(self, lst, discard=0, thin=1):
        if not lst:
            return None
        return np.stack(lst[discard::thin], axis=0)

    def get_chain(self, discard: int = 0, thin: int = 1, temp_index=None, **kwargs):
        out = {}
        for name in self.branch_names:
            chain = self._stack(self._chain[name], discard, thin)
            if chain is not None and temp_index is not None:
                chain = chain[:, temp_index]
            out[name] = chain
        return out

    def get_inds(self, discard: int = 0, thin: int = 1, **kwargs):
        return {
            name: self._stack(self._inds[name], discard, thin)
            for name in self.branch_names
        }

    def get_nleaves(self, discard: int = 0, thin: int = 1, **kwargs):
        return {
            name: (self._stack(self._inds[name], discard, thin)).sum(axis=-1)
            for name in self.branch_names
        }

    def get_log_like(self, discard: int = 0, thin: int = 1, **kwargs):
        return self._stack(self._log_like, discard, thin)

    def get_log_prior(self, discard: int = 0, thin: int = 1, **kwargs):
        return self._stack(self._log_prior, discard, thin)

    def get_betas(self, discard: int = 0, thin: int = 1, **kwargs):
        return self._stack(self._betas, discard, thin)

    def get_value(self, name, **kwargs):
        return {
            "chain": self.get_chain,
            "log_like": self.get_log_like,
            "log_prior": self.get_log_prior,
            "betas": self.get_betas,
        }[name](**kwargs)

    def get_last_sample(self) -> State:
        coords = {}
        inds = {}
        for name in self.branch_names:
            c = np.asarray(self._chain[name][-1])
            i = np.asarray(self._inds[name][-1])
            coords[name] = jnp.asarray(np.where(i[..., None], c, 0.0))
            inds[name] = jnp.asarray(i)
        st = make_state(
            coords,
            inds=inds,
            log_like=jnp.asarray(self._log_like[-1]),
            log_prior=jnp.asarray(self._log_prior[-1]),
            betas=jnp.asarray(self._betas[-1]),
            random_state=self._rstate,
        )
        return st

    @property
    def acceptance_fraction(self):
        return self._accepted / max(self.iteration, 1)

    @property
    def swap_acceptance_fraction(self):
        return self._swaps_accepted / max(self.iteration, 1)

    @property
    def rj_acceptance_fraction(self):
        """Per-(temp, walker-averaged) RJ acceptance (reference backend's
        per-move acceptance tracking, ``backend.py:816``)."""
        return self._rj_accepted / max(self.iteration, 1)

    def get_autocorr_time(self, discard: int = 0, thin: int = 1, c: float = 5.0, **kwargs):
        from ...utils.autocorr import get_integrated_act

        name = self.branch_names[0]
        chain = self.get_chain(discard=discard, thin=thin)[name]  # (n, T, W, L, D)
        cold = chain[:, 0, :, 0, :]  # cold chain
        return {name: get_integrated_act(cold, c=c)}

    def get_evidence_estimate(self, discard: int = 0, thin: int = 1, return_error: bool = True):
        """Thermodynamic-integration evidence from the tempered ladder."""
        from ...utils.autocorr import thermodynamic_integration_log_evidence

        logls = self.get_log_like(discard=discard, thin=thin)  # (n, T, W)
        betas = self.get_betas(discard=discard, thin=thin)[-1]
        mean_logls = logls.mean(axis=(0, 2))
        logz, dlogz = thermodynamic_integration_log_evidence(betas, mean_logls)
        if return_error:
            return logz, dlogz
        return logz


__all__ = ["Backend"]
