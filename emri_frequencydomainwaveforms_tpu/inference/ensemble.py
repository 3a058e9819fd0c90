"""Tempered affine-invariant ensemble sampler (jit-stepped).

Rebuilds Eryn's ``EnsembleSampler`` orchestration (reference
``Eryn/eryn/ensemble.py:31``: branch/ndim bookkeeping :256-309,
TemperatureControl setup :311-324, move schedule :341-474, backend
init/resume :520-571, ``sample`` generator :734-945, ``run_mcmc`` with burn
+ stopping/update hooks :947-1037, ``compute_log_prior``:1046 /
``compute_log_like``:1133 with -inf-prior masking and NaN->-1e300 fill
:1397-1424) for the single-branch fixed-dimension configuration the
reference drivers use (plain StretchMove at ``emri_pe.py:478-482``;
reversible-jump/multiple-try layers are tracked extensions).

TPU-native structure: one full iteration — stretch proposal on both walker
halves at every temperature, likelihood/prior evaluation, accept blending,
temperature swap cascade, ladder adaptation — is a single pure jitted
function of (State, iteration); the Python loop only pumps iterations and
streams thinned samples to the backend. The likelihood must be
jnp-traceable over a (n, ndim) batch (``vectorize=True`` semantics — the
reference's pool.map path is subsumed by vmap/XLA).
"""

from __future__ import annotations

import time as _time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .backends.memory import Backend
from .moves.stretch import StretchMove
from .moves.tempering import TemperatureControl
from .prior import ProbDistContainer
from .state import State, make_state


class EnsembleSampler:
    """Parallel-tempered ensemble MCMC over a single model branch."""

    def __init__(
        self,
        nwalkers: int,
        ndims,
        log_like_fn: Callable,
        priors,
        *,
        tempering_kwargs=None,
        moves=None,
        args=None,
        kwargs=None,
        backend=None,
        vectorize: bool = True,
        periodic=None,
        update_fn=None,
        update_iterations: int = -1,
        stopping_fn=None,
        stopping_iterations: int = -1,
        branch_names=None,
        nbranches: int = 1,
        nleaves_max=1,
        info=None,
        seed: int = 0,
        **extra,
    ):
        del vectorize, nbranches, extra
        self.nwalkers = nwalkers
        self.ndim = int(ndims[0] if isinstance(ndims, (list, tuple, np.ndarray)) else ndims)
        self.branch_name = (branch_names[0] if branch_names else "model_0")
        self.log_like_fn = log_like_fn
        self.args = tuple(args or ())
        self.kwargs = dict(kwargs or {})

        if isinstance(priors, dict) and not isinstance(
            next(iter(priors.values())), ProbDistContainer
        ):
            priors = {self.branch_name: ProbDistContainer(priors)}
        elif isinstance(priors, ProbDistContainer):
            priors = {self.branch_name: priors}
        self.priors = priors
        self._prior = priors[self.branch_name]

        tempering_kwargs = dict(tempering_kwargs or {})
        ntemps = tempering_kwargs.pop("ntemps", 1)
        self.temperature_control = TemperatureControl(
            self.ndim, nwalkers, ntemps=ntemps, **tempering_kwargs
        )
        self.ntemps = self.temperature_control.ntemps

        per_vec = None
        if periodic is not None:
            per = periodic.get(self.branch_name, periodic) if isinstance(periodic, dict) else periodic
            vec = np.zeros(self.ndim)
            for idx, p in per.items():
                vec[int(idx)] = p
            per_vec = jnp.asarray(vec)
        self.periodic_vec = per_vec

        # move schedule: a single move, a list of moves (equal weights), or
        # a list of (move, weight) pairs — one is drawn per iteration
        # (reference ``ensemble.py:341-474`` weighted move schedule),
        # lowered to a `lax.switch` inside the jitted step.
        if moves is None:
            moves = StretchMove(periodic=per_vec)
        if isinstance(moves, (list, tuple)):
            pairs = [m if isinstance(m, tuple) else (m, 1.0) for m in moves]
            self.moves = [m for m, _ in pairs]
            w = np.array([float(wt) for _, wt in pairs])
            self.move_weights = w / w.sum()
        else:
            self.moves = [moves]
            self.move_weights = np.array([1.0])
        for m in self.moves:
            if getattr(m, "periodic", None) is None:
                m.periodic = per_vec
        self.move = self.moves[0]

        self.backend = backend if backend is not None else Backend()
        if not self.backend.initialized:
            self.backend.reset(
                nwalkers,
                self.ndim,
                ntemps=self.ntemps,
                branch_names=[self.branch_name],
            )
        if info:
            self.backend.info.update(info)

        self.update_fn = update_fn
        self.update_iterations = update_iterations
        self.stopping_fn = stopping_fn
        self.stopping_iterations = stopping_iterations
        self._key = jax.random.PRNGKey(seed)
        self._step_jit = jax.jit(self._step)

    # ---- model evaluation ----
    def compute_log_prior(self, coords, inds=None):
        return self._prior.logpdf(jnp.asarray(coords))

    def compute_log_like(self, coords, inds=None, logp=None):
        coords = jnp.asarray(coords)
        flat = coords.reshape(-1, self.ndim)
        ll = self.log_like_fn(flat, *self.args, **self.kwargs)
        ll = jnp.asarray(ll).reshape(coords.shape[:-1])
        ll = jnp.where(jnp.isnan(ll), -1e300, ll)
        if logp is not None:
            ll = jnp.where(jnp.isfinite(jnp.asarray(logp)), ll, -1e300)
        return ll

    # ---- one jitted iteration ----
    def _step(self, coords, log_like, log_prior, betas, key, iteration):
        logp_fn = lambda x: self._prior.logpdf(x)

        def logl_fn(x):
            ll = self.log_like_fn(x, *self.args, **self.kwargs)
            return jnp.asarray(ll)

        key, k_move, k_sel, k_swap = jax.random.split(key, 4)
        if len(self.moves) == 1:
            coords, log_like, log_prior, n_acc = self.move.propose(
                k_move, coords, log_like, log_prior, betas, logp_fn, logl_fn
            )
        else:
            branches = [
                (
                    lambda args, m=m: m.propose(
                        args[0], args[1], args[2], args[3], betas, logp_fn, logl_fn
                    )
                )
                for m in self.moves
            ]
            idx = jax.random.choice(
                k_sel, len(self.moves), p=jnp.asarray(self.move_weights)
            )
            coords, log_like, log_prior, n_acc = jax.lax.switch(
                idx, branches, (k_move, coords, log_like, log_prior)
            )
        tc = self.temperature_control
        if self.ntemps > 1:
            coords, log_like, log_prior, swap_frac = tc.temperature_swaps(
                k_swap, coords, log_like, log_prior, betas
            )
            betas = tc.adapt_ladder(betas, swap_frac, iteration.astype(jnp.float64))
        else:
            swap_frac = jnp.zeros((0,))
        return coords, log_like, log_prior, betas, key, n_acc, swap_frac

    # ---- public API ----
    def run_mcmc(
        self,
        initial_state,
        nsteps: int,
        burn: int = 0,
        thin_by: int = 1,
        progress: bool = False,
        **kwargs,
    ) -> State:
        state = self._coerce_state(initial_state)
        if burn:
            for state in self.sample(state, iterations=burn, thin_by=1, store=False):
                pass
        last = state
        for last in self.sample(state, iterations=nsteps, thin_by=thin_by, store=True,
                                progress=progress):
            pass
        return last

    def sample(self, initial_state, iterations: int, thin_by: int = 1, store: bool = True,
               progress: bool = False):
        state = self._coerce_state(initial_state)
        coords = state.branches[self.branch_name].coords[:, :, 0, :]
        log_like = state.log_like
        log_prior = state.log_prior
        betas = state.betas
        key = state.random_state

        it0 = self.backend.iteration * thin_by
        accepted_total = np.zeros((self.ntemps, self.nwalkers))
        for i in range(iterations):
            for _ in range(thin_by):
                coords, log_like, log_prior, betas, key, n_acc, swap_frac = self._step_jit(
                    coords, log_like, log_prior, betas, key,
                    jnp.asarray(it0 + i, jnp.float64),
                )
                accepted_total += np.asarray(n_acc)[:, None] / self.nwalkers
            state = State(
                branches={
                    self.branch_name: state.branches[self.branch_name]._replace(
                        coords=coords[:, :, None, :]
                    )
                },
                log_like=log_like,
                log_prior=log_prior,
                betas=betas,
                random_state=key,
            )
            if store:
                self.backend.save_step(state, np.asarray(n_acc), swap_frac=np.asarray(swap_frac))
            if (
                self.stopping_fn is not None
                and self.stopping_iterations > 0
                and (i + 1) % self.stopping_iterations == 0
            ):
                if self.stopping_fn(i, state, self):
                    yield state
                    return
            if (
                self.update_fn is not None
                and self.update_iterations > 0
                and (i + 1) % self.update_iterations == 0
            ):
                self.update_fn(i, state, self)
            yield state

    def _coerce_state(self, s) -> State:
        if isinstance(s, State):
            st = s
        elif isinstance(s, dict):
            st = make_state(**s, name=self.branch_name)
        else:
            st = make_state(jnp.asarray(s), name=self.branch_name)
        # fill betas/posteriors if fresh
        betas = st.betas
        if betas.shape[0] != self.ntemps or (
            self.ntemps > 1 and bool(jnp.all(betas == 1.0))
        ):
            # raw-array initial states carry placeholder unit betas; install
            # the temperature ladder
            betas = self.temperature_control.betas
        coords = st.branches[self.branch_name].coords[:, :, 0, :]
        lp = self.compute_log_prior(coords)
        ll = st.log_like
        if bool(jnp.all(ll == 0)):
            ll = self.compute_log_like(coords, logp=lp)
        return State(
            branches=st.branches,
            log_like=ll,
            log_prior=lp,
            betas=betas,
            random_state=st.random_state if st.random_state is not None else self._key,
        )

    # ---- accessors (reference parity) ----
    def get_chain(self, **kwargs):
        return self.backend.get_chain(**kwargs)

    def get_log_like(self, **kwargs):
        return self.backend.get_log_like(**kwargs)

    def get_autocorr_time(self, **kwargs):
        return self.backend.get_autocorr_time(**kwargs)

    @property
    def acceptance_fraction(self):
        return self.backend.acceptance_fraction

    def walkers_independent(self, coords=None) -> bool:
        """Condition-number guard (reference ``ensemble.py:1586``)."""
        if coords is None:
            last = self.backend.get_last_sample()
            coords = last.branches[self.branch_name].coords[0, :, 0, :]
        x = np.asarray(coords)
        x = x - x.mean(axis=0)
        sigma = x.std(axis=0)
        sigma[sigma == 0] = 1.0
        cond = np.linalg.cond((x / sigma).astype(np.float64))
        return cond < 1e8


__all__ = ["EnsembleSampler"]
