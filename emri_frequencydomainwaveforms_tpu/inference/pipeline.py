"""Staged analysis pipeline: module orchestration + sampler stages.

Rebuilds the reference's pipeline layer (reference
``LISAanalysistools/lisatools/pipeline/pipeline.py``: ``InfoManager``:32
shared-state container with data bookkeeping, ``PipelineModule``:55 stage
interface, ``PipelineGuide``:76 sequential orchestration; the concrete
``MBHRelBinSearch``:270 / ``MBHRelBinPE``:410 stages wrap bbhx waveforms,
which are external to the reference too).

Here the orchestration layer is waveform-agnostic and the concrete stage
(`SamplerModule`) wraps this package's sampler guides — a search stage
(hot start, SNR/likelihood stopping) chained into a PE stage seeded from
the search maximum is the reference's MBH search -> PE pattern, runnable
with any jittable likelihood (EMRI, toy, or a user-supplied MBH/GB
model). `ResidualUpdateModule` demonstrates ``update_info`` semantics
(iterative source subtraction from the shared data).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np
import jax.numpy as jnp


class InfoManager:
    """Shared pipeline state (reference ``pipeline.py:32``).

    Carries the frequency grid, data channels, and any stage-published
    attributes (e.g. ``fp_search_init``, best-point estimates).
    """

    def __init__(self, name=None, data=None, dt=None, T=None, fd=None, **kwargs):
        self.name = name
        self.dt, self.T, self.fd = dt, T, fd
        if data is not None:
            self.data = data
        for key, value in kwargs.items():
            setattr(self, key, value)

    @property
    def data(self):
        return self._data

    @data.setter
    def data(self, data):
        self.nchannels = len(data)
        self.data_length = len(data[0])
        self._data = data

    def update_info(self, data, *args, **kwargs):
        self.data = data


class PipelineModule(ABC):
    """One pipeline stage (reference ``pipeline.py:55``)."""

    def __init__(self, name=None):
        self.name = name

    @abstractmethod
    def update_module(self, info_manager, *args, **kwargs):
        """Receive the shared state before running."""

    @abstractmethod
    def run_module(self, progress=False, **kwargs):
        """Execute the stage."""

    def update_information(self, info_manager, *args, **kwargs):
        """Publish stage outputs back into the shared state."""


class PipelineGuide:
    """Sequential stage orchestration (reference ``pipeline.py:76``)."""

    def __init__(self, info_manager: InfoManager, module_list):
        self.module_list = list(module_list)
        self.info_manager = info_manager

    def run(self, progress=False, verbose=False, **update_kwargs):
        for i, module in enumerate(self.module_list):
            if verbose:
                label = f": {module.name}" if module.name else ""
                print(f"starting module {i}{label}")
            module.update_module(self.info_manager, **update_kwargs)
            module.run_module(progress=progress)
            module.update_information(self.info_manager)
            if verbose:
                label = f": {module.name}" if module.name else ""
                print(f"finished module {i}{label}")


class SamplerModule(PipelineModule):
    """Sampler stage around a `SamplerGuide` (search or PE flavor).

    Args:
      guide: a built `inference.guide.SamplerGuide` (or subclass).
      nsteps/burn: sampling schedule.
      start: initial coordinates ``(ntemps, nwalkers, ndim)`` or None to
        draw from the guide's priors (search) / the previous stage's best
        point (PE; see ``seed_from``).
      seed_from: attribute name on the InfoManager holding a previous
        stage's best-point estimate (the search -> PE hand-off).
      publish_best: attribute name under which this stage publishes its
        maximum-likelihood point.
      stopping_snr: optional early-stop when max log-like implies
        SNR >= this value (reference search-stage ``snr_stopping``).
    """

    def __init__(self, guide, nsteps: int, burn: int = 0, start=None,
                 seed_from: str | None = None,
                 publish_best: str = "best_point",
                 stopping_snr: float | None = None, name=None):
        super().__init__(name=name)
        self.guide = guide
        self.nsteps = nsteps
        self.burn = burn
        self.start = start
        self.seed_from = seed_from
        self.publish_best = publish_best
        self.stopping_snr = stopping_snr
        self.sampler = None
        self.last_state = None

    def update_module(self, info_manager, **kwargs):
        self.info_manager = info_manager

    def run_module(self, progress=False, **kwargs):
        ens = self.guide.build()
        self.sampler = ens
        if self.start is not None:
            start = self.start
        elif self.seed_from is not None:
            center = np.asarray(getattr(self.info_manager, self.seed_from))
            start = self.guide.start_from_ball(center, rel_scale=1e-4)
        else:
            start = jnp.asarray(
                self.guide.priors.rvs(
                    size=(self.guide.ntemps, self.guide.nwalkers)
                )
            )[:, :, None, :]
        stopping = None
        if self.stopping_snr is not None:
            target = 0.5 * self.stopping_snr**2

            def stopping(i, state, sampler):  # noqa: F811
                return float(jnp.max(state.log_like)) >= -1e290 and (
                    float(jnp.max(state.log_like)) + target >= 0.0
                )

            ens.stopping_fn = stopping
            ens.stopping_iterations = 1
        self.last_state = ens.run_mcmc(start, self.nsteps, burn=self.burn)

    def update_information(self, info_manager, **kwargs):
        chain = self.sampler.get_chain()
        name = self.sampler.branch_names[0]
        coords = chain[name][:, 0].reshape(-1, self.guide.priors.ndim)
        ll = self.sampler.get_log_like()[:, 0, :].ravel()
        finite = np.isfinite(coords[:, 0])
        coords, ll = coords[finite], ll[finite]
        best = coords[int(np.argmax(ll))]
        setattr(info_manager, self.publish_best, best)
        setattr(info_manager, f"{self.publish_best}_loglike", float(ll.max()))


class ResidualUpdateModule(PipelineModule):
    """Subtract a template at the current best point from the shared data.

    The iterative-extraction pattern of the reference pipeline: after a
    search stage finds a source, later stages analyze the residual.
    ``template_fn(params) -> [channels...]`` (complex, on the info
    manager's grid).
    """

    def __init__(self, template_fn, best_attr: str = "best_point", name=None):
        super().__init__(name=name)
        self.template_fn = template_fn
        self.best_attr = best_attr

    def update_module(self, info_manager, **kwargs):
        self.info_manager = info_manager

    def run_module(self, progress=False, **kwargs):
        best = np.asarray(getattr(self.info_manager, self.best_attr))
        tmpl = self.template_fn(best)
        new_data = [
            np.asarray(d) - np.asarray(t)
            for d, t in zip(self.info_manager.data, tmpl)
        ]
        self.info_manager.update_info(new_data)


__all__ = [
    "InfoManager",
    "PipelineModule",
    "PipelineGuide",
    "SamplerModule",
    "ResidualUpdateModule",
]
