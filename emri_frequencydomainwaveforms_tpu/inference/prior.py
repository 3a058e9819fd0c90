"""Prior distributions and the ProbDistContainer.

Rebuilds Eryn's prior machinery (reference ``Eryn/eryn/prior.py``:
``UniformDistribution``:12, ``uniform_dist``:80, ``log_uniform``:99,
``MappedUniformDistribution``:123, ``ProbDistContainer``:189 with
``logpdf``:252, ``ppf``:294, ``rvs``:330; usage pinned at reference
``emri_pe.py:176-188``: dict {index: uniform_dist(...)} over the sampled
parameters).

``logpdf`` is pure jnp (jittable inside the sampler step); ``rvs``/``ppf``
are host-side numpy (used for walker initialization).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class UniformDistribution:
    """Uniform on [minimum, maximum]."""

    def __init__(self, minimum: float, maximum: float):
        self.min_val = float(minimum)
        self.max_val = float(maximum)
        self._log_pdf = -np.log(self.max_val - self.min_val)

    def logpdf(self, x):
        x = jnp.asarray(x)
        inside = (x >= self.min_val) & (x <= self.max_val)
        return jnp.where(inside, self._log_pdf, -jnp.inf)

    def pdf(self, x):
        return jnp.exp(self.logpdf(x))

    def ppf(self, q):
        # jnp: traceable from jitted samplers (MT candidate draws)
        return self.min_val + jnp.asarray(q) * (self.max_val - self.min_val)

    def rvs(self, size=1, random_state=None):
        rng = np.random.default_rng(random_state) if not isinstance(
            random_state, np.random.Generator
        ) else random_state
        return rng.uniform(self.min_val, self.max_val, size=size)


def uniform_dist(minimum, maximum) -> UniformDistribution:
    return UniformDistribution(minimum, maximum)


class log_uniform:
    """Log-uniform (Jeffreys-like) on [minimum, maximum]."""

    def __init__(self, minimum: float, maximum: float):
        self.min_val = float(minimum)
        self.max_val = float(maximum)
        self._norm = np.log(np.log(self.max_val / self.min_val))

    def logpdf(self, x):
        x = jnp.asarray(x)
        inside = (x >= self.min_val) & (x <= self.max_val)
        return jnp.where(inside, -jnp.log(x) - self._norm, -jnp.inf)

    def ppf(self, q):
        return self.min_val * (self.max_val / self.min_val) ** jnp.asarray(q)

    def rvs(self, size=1, random_state=None):
        rng = np.random.default_rng(random_state) if not isinstance(
            random_state, np.random.Generator
        ) else random_state
        return self.ppf(rng.uniform(size=size))


class MappedUniformDistribution(UniformDistribution):
    """Uniform on [0, 1] mapped linearly to [minimum, maximum] with logpdf
    evaluated in the unit coordinates (reference ``prior.py:123``)."""

    def __init__(self, minimum, maximum):
        super().__init__(minimum, maximum)

    def map_to_unit(self, x):
        return (jnp.asarray(x) - self.min_val) / (self.max_val - self.min_val)

    def logpdf(self, x):
        u = self.map_to_unit(x)
        return jnp.where((u >= 0) & (u <= 1), 0.0, -jnp.inf)


class ProbDistContainer:
    """Container mapping parameter indices (int or tuple) -> distribution.

    ``logpdf`` over (..., ndim) arrays sums component log-pdfs; ``rvs`` draws
    (size, ndim) samples; ``ppf`` maps unit-cube points.
    """

    def __init__(self, priors_in: dict):
        self.priors_in = dict(priors_in)
        self.ndim = 0
        for key in priors_in:
            inds = key if isinstance(key, tuple) else (key,)
            self.ndim = max(self.ndim, max(inds) + 1)

    def logpdf(self, x):
        x = jnp.asarray(x)
        out = jnp.zeros(x.shape[:-1], x.dtype)
        for key, dist in self.priors_in.items():
            if isinstance(key, tuple):
                vals = jnp.stack([x[..., k] for k in key], axis=-1)
                out = out + dist.logpdf(vals)
            else:
                out = out + dist.logpdf(x[..., key])
        return out

    def ppf(self, q):
        q = np.asarray(q)
        out = np.zeros(q.shape[:-1] + (self.ndim,))
        for key, dist in self.priors_in.items():
            if isinstance(key, tuple):
                raise NotImplementedError("ppf for multi-index distributions")
            out[..., key] = np.asarray(dist.ppf(q[..., key]))
        return out

    def rvs(self, size=1, random_state=None):
        if isinstance(size, int):
            size = (size,)
        rng = random_state if isinstance(random_state, np.random.Generator) else np.random.default_rng(random_state)
        out = np.zeros(tuple(size) + (self.ndim,))
        for key, dist in self.priors_in.items():
            if isinstance(key, tuple):
                draw = np.asarray(dist.rvs(size=size, random_state=rng))
                for i, k in enumerate(key):
                    out[..., k] = draw[..., i]
            else:
                out[..., key] = np.asarray(dist.rvs(size=size, random_state=rng))
        return out


__all__ = [
    "UniformDistribution",
    "uniform_dist",
    "log_uniform",
    "MappedUniformDistribution",
    "ProbDistContainer",
]
