"""Guided-sampler presets (SamplerGuide / EMRIGuide equivalents).

Rebuilds the convenience layer of the reference's
``lisatools/sampling/samplingguide.py`` (``SamplerGuide``:52,
``EMRIGuide``:1022 — off the reference's main path, kept for parity):
bundle the standard EMRI PE configuration (transforms, priors, periodic
info, tempering, walker initialization, backend) into one object that
builds a ready-to-run `EnsembleSampler` around a jittable likelihood.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .backends.hdf import HDFBackend
from .backends.memory import Backend
from .ensemble import EnsembleSampler
from .prior import ProbDistContainer, uniform_dist


class SamplerGuide:
    """Base preset: wire likelihood + priors + tempering + backend."""

    branch_name = "model_0"

    def __init__(self, like_fn, priors: ProbDistContainer, *, nwalkers=32,
                 ntemps=1, periodic=None, backend=None, fp=None, info=None, seed=0):
        self.like_fn = like_fn
        self.priors = priors
        self.nwalkers = nwalkers
        self.ntemps = ntemps
        self.periodic = periodic
        if backend is None:
            backend = HDFBackend(fp) if fp else Backend()
        self.backend = backend
        self.info = info or {}
        self.seed = seed

    def build(self) -> EnsembleSampler:
        return EnsembleSampler(
            self.nwalkers,
            [self.priors.ndim],
            self.like_fn,
            {self.branch_name: self.priors},
            tempering_kwargs=(
                {"ntemps": self.ntemps, "Tmax": np.inf} if self.ntemps > 1 else None
            ),
            periodic=self.periodic,
            backend=self.backend,
            branch_names=[self.branch_name],
            info=self.info,
            seed=self.seed,
        )

    def start_from_ball(self, center, rel_scale=1e-7, seed=None):
        rng = np.random.default_rng(self.seed if seed is None else seed)
        center = np.asarray(center, dtype=np.float64)
        scales = np.abs(center) * rel_scale + 1e-9
        return jnp.asarray(
            center[None, None, :]
            + rng.normal(0, 1.0, (self.ntemps, self.nwalkers, len(center)))
            * scales[None, None, :]
        )


class EMRIGuide(SamplerGuide):
    """EMRI preset: the reference drivers' 6-parameter sampling setup
    (log M, log eta, p0, e0, Phi_phi0, Phi_r0) with its standard priors and
    periodic wrapping (reference ``emri_pe.py:176-206``)."""

    branch_name = "emri"

    def __init__(self, like_fn, *, p0_center=12.0, **kwargs):
        priors = ProbDistContainer(
            {
                0: uniform_dist(np.log(5e5), np.log(1e7)),
                1: uniform_dist(np.log(1e-6), np.log(1e-4)),
                2: uniform_dist(max(p0_center - 2.0, 7.0), p0_center + 3.0),
                3: uniform_dist(0.001, 0.7),
                4: uniform_dist(0.0, 2 * np.pi),
                5: uniform_dist(0.0, 2 * np.pi),
            }
        )
        kwargs.setdefault("periodic", {"emri": {4: 2 * np.pi, 5: np.pi}})
        super().__init__(like_fn, priors, **kwargs)


__all__ = ["SamplerGuide", "EMRIGuide"]
