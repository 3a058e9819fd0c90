"""HDF5 chain backend with resume.

Rebuilds Eryn's ``HDFBackend`` (reference
``Eryn/eryn/backends/hdfbackend.py:41``: schema creation at ``reset``:154,
``grow``:583, per-step persistence ``save_step``:636 including the sampler
random state, resume via ``get_last_sample``, and the context-managed
throwaway ``TempHDFBackend``:730 used as test fixture infrastructure).

Same getter surface as the in-memory `Backend`; every step lands on disk so
a killed run resumes from the file (reference resume flow
``emri_pe.py:498-511``).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..state import State, make_state
from .memory import Backend


class HDFBackend(Backend):
    def __init__(self, filename: str, name: str = "mcmc", dtype=np.float64):
        super().__init__(dtype=dtype)
        self.filename = filename
        self.group = name
        self.initialized = self._probe()

    def _probe(self) -> bool:
        import h5py

        if not os.path.exists(self.filename):
            return False
        with h5py.File(self.filename, "r") as f:
            if self.group not in f:
                return False
            g = f[self.group]
            self.nwalkers = int(g.attrs["nwalkers"])
            self.ntemps = int(g.attrs["ntemps"])
            self.branch_names = list(g.attrs["branch_names"])
            self.ndims = {k: int(v) for k, v in zip(self.branch_names, g.attrs["ndims"])}
            self.nleaves_max = {
                k: int(v) for k, v in zip(self.branch_names, g.attrs["nleaves_max"])
            }
            self.ndim = self.ndims[self.branch_names[0]]
            self.iteration = int(g.attrs["iteration"])
            self._accepted = g["accepted"][:]
            self._swaps_accepted = g["swaps_accepted"][:]
            self.info = {k: g["info"].attrs[k] for k in g["info"].attrs} if "info" in g else {}
        return True

    def reset(self, nwalkers, ndims, ntemps=1, nleaves_max=1, branch_names=None, **kwargs):
        import h5py

        super().reset(nwalkers, ndims, ntemps=ntemps, nleaves_max=nleaves_max,
                      branch_names=branch_names, **kwargs)
        with h5py.File(self.filename, "w") as f:
            g = f.create_group(self.group)
            g.attrs["nwalkers"] = self.nwalkers
            g.attrs["ndim"] = self.ndim
            g.attrs["ntemps"] = self.ntemps
            g.attrs["branch_names"] = self.branch_names
            g.attrs["ndims"] = [self.ndims[k] for k in self.branch_names]
            g.attrs["nleaves_max"] = [self.nleaves_max[k] for k in self.branch_names]
            g.attrs["iteration"] = 0
            for name in self.branch_names:
                shape = (0, self.ntemps, self.nwalkers,
                         self.nleaves_max[name], self.ndims[name])
                g.create_dataset(f"chain_{name}", shape=shape,
                                 maxshape=(None,) + shape[1:], dtype=self.dtype)
                g.create_dataset(f"inds_{name}", shape=shape[:-1],
                                 maxshape=(None,) + shape[1:-1], dtype=bool)
            ll_shape = (0, self.ntemps, self.nwalkers)
            g.create_dataset("log_like", shape=ll_shape, maxshape=(None,) + ll_shape[1:], dtype=self.dtype)
            g.create_dataset("log_prior", shape=ll_shape, maxshape=(None,) + ll_shape[1:], dtype=self.dtype)
            g.create_dataset("betas", shape=(0, self.ntemps), maxshape=(None, self.ntemps), dtype=self.dtype)
            g.create_dataset("accepted", data=np.zeros((self.ntemps, self.nwalkers)))
            g.create_dataset("swaps_accepted", data=np.zeros((max(self.ntemps - 1, 0),)))
            g.create_dataset("random_state", shape=(2,), dtype=np.uint32)
            g.create_group("info")

    def save_step(self, state: State, accepted, rj_accepted=None, swaps_accepted=None, swap_frac=None):
        import h5py

        with h5py.File(self.filename, "a") as f:
            g = f[self.group]
            it = int(g.attrs["iteration"])
            entries = [
                ("log_like", np.asarray(state.log_like)),
                ("log_prior", np.asarray(state.log_prior)),
                ("betas", np.asarray(state.betas)),
            ]
            for name in self.branch_names:
                b = state.branches[name]
                coords = np.asarray(b.coords)
                inds = np.asarray(b.inds)
                coords = np.where(inds[..., None], coords, np.nan)
                entries.append((f"chain_{name}", coords))
                entries.append((f"inds_{name}", inds))
            for ds_name, val in entries:
                ds = g[ds_name]
                ds.resize(it + 1, axis=0)
                ds[it] = val
            acc = np.asarray(accepted)
            if acc.ndim == 1:
                acc = np.broadcast_to(acc[:, None] / max(self.nwalkers, 1), (self.ntemps, self.nwalkers))
            g["accepted"][:] = g["accepted"][:] + acc
            if swap_frac is not None and len(np.atleast_1d(swap_frac)):
                g["swaps_accepted"][:] = g["swaps_accepted"][:] + np.asarray(swap_frac)
            key = np.asarray(jax.random.key_data(state.random_state), dtype=np.uint32)
            g["random_state"][:] = key[:2]
            g.attrs["iteration"] = it + 1
            for k, v in self.info.items():
                try:
                    g["info"].attrs[k] = v
                except TypeError:
                    g["info"].attrs[k] = str(v)
        self.iteration = int(np.asarray(self.iteration)) + 1
        self._rstate = state.random_state

    def _read(self, ds_name, discard=0, thin=1):
        import h5py

        with h5py.File(self.filename, "r") as f:
            data = f[self.group][ds_name][discard::thin]
        return data

    def get_chain(self, discard: int = 0, thin: int = 1, temp_index=None, **kwargs):
        out = {}
        for name in self.branch_names:
            chain = self._read(f"chain_{name}", discard, thin)
            if temp_index is not None:
                chain = chain[:, temp_index]
            out[name] = chain
        return out

    def get_inds(self, discard: int = 0, thin: int = 1, **kwargs):
        return {
            name: self._read(f"inds_{name}", discard, thin)
            for name in self.branch_names
        }

    def get_nleaves(self, discard: int = 0, thin: int = 1, **kwargs):
        return {
            name: self._read(f"inds_{name}", discard, thin).sum(axis=-1)
            for name in self.branch_names
        }

    def get_log_like(self, discard: int = 0, thin: int = 1, **kwargs):
        return self._read("log_like", discard, thin)

    def get_log_prior(self, discard: int = 0, thin: int = 1, **kwargs):
        return self._read("log_prior", discard, thin)

    def get_betas(self, discard: int = 0, thin: int = 1, **kwargs):
        return self._read("betas", discard, thin)

    def get_last_sample(self) -> State:
        import h5py

        with h5py.File(self.filename, "r") as f:
            g = f[self.group]
            it = int(g.attrs["iteration"])
            coords = {}
            inds = {}
            for name in self.branch_names:
                c = g[f"chain_{name}"][it - 1]
                i = g[f"inds_{name}"][it - 1]
                coords[name] = jnp.asarray(np.where(i[..., None], c, 0.0))
                inds[name] = jnp.asarray(i)
            ll = g["log_like"][it - 1]
            lp = g["log_prior"][it - 1]
            betas = g["betas"][it - 1]
            key_data = g["random_state"][:]
        key = jax.random.wrap_key_data(np.asarray(key_data, dtype=np.uint32))
        return make_state(
            coords,
            inds=inds,
            log_like=jnp.asarray(ll),
            log_prior=jnp.asarray(lp),
            betas=jnp.asarray(betas),
            random_state=key,
        )

    @property
    def acceptance_fraction(self):
        import h5py

        with h5py.File(self.filename, "r") as f:
            acc = f[self.group]["accepted"][:]
            it = int(f[self.group].attrs["iteration"])
        return acc / max(it, 1)


class TempHDFBackend:
    """Context-managed throwaway HDF backend (reference test fixture)."""

    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.filename = None

    def __enter__(self) -> HDFBackend:
        import tempfile

        fd, self.filename = tempfile.mkstemp(suffix=".h5")
        os.close(fd)
        os.unlink(self.filename)
        return HDFBackend(self.filename, **self.kwargs)

    def __exit__(self, *exc):
        if self.filename and os.path.exists(self.filename):
            os.unlink(self.filename)
        return False


__all__ = ["HDFBackend", "TempHDFBackend"]
