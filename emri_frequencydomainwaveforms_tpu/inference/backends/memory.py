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
        self.ndim = int(ndims[0] if isinstance(ndims, (list, tuple, np.ndarray)) else ndims)
        self.ntemps = ntemps
        self.nleaves_max = nleaves_max if isinstance(nleaves_max, int) else int(nleaves_max[0])
        self.branch_names = branch_names or ["model_0"]
        self.iteration = 0
        self._chain = []
        self._log_like = []
        self._log_prior = []
        self._betas = []
        self._accepted = np.zeros((ntemps, nwalkers))
        self._swaps_accepted = np.zeros((max(ntemps - 1, 0),))
        self._rstate = None
        self.initialized = True

    def grow(self, ngrow, blobs=None):
        pass  # python lists grow dynamically

    def save_step(self, state: State, accepted, rj_accepted=None, swaps_accepted=None, swap_frac=None):
        name = self.branch_names[0]
        self._chain.append(np.asarray(state.branches[name].coords))
        self._log_like.append(np.asarray(state.log_like))
        self._log_prior.append(np.asarray(state.log_prior))
        self._betas.append(np.asarray(state.betas))
        acc = np.asarray(accepted)
        if acc.ndim == 1:
            self._accepted += acc[:, None] / max(self.nwalkers, 1)
        else:
            self._accepted += acc
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
        name = self.branch_names[0]
        chain = self._stack(self._chain, discard, thin)
        if temp_index is not None:
            chain = chain[:, temp_index]
        return {name: chain}

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
        name = self.branch_names[0]
        st = make_state(
            jnp.asarray(self._chain[-1]),
            log_like=jnp.asarray(self._log_like[-1]),
            log_prior=jnp.asarray(self._log_prior[-1]),
            betas=jnp.asarray(self._betas[-1]),
            random_state=self._rstate,
            name=name,
        )
        return st

    @property
    def acceptance_fraction(self):
        return self._accepted / max(self.iteration, 1)

    @property
    def swap_acceptance_fraction(self):
        return self._swaps_accepted / max(self.iteration, 1)

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
