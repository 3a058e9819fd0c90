"""emri_frequencydomainwaveforms_tpu: TPU-native frequency-domain EMRI waveforms.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
lorenzsp/EMRI_FrequencyDomainWaveforms (frequency-domain EMRI waveforms per
arXiv:2307.12585) + its vendored stack (Eryn ensemble MCMC,
LISAanalysistools likelihoods) + the external FastEMRIWaveforms compute core
it drives.

Everything on the hot path is pure-functional, jittable and vmappable:

* ``models``    — trajectory ODE, amplitudes, mode selection, TD/FD summation,
                  user-facing waveform generators.
* ``ops``       — numerics substrate: batched cubic splines, tridiagonal
                  solves, Bessel functions, Pallas kernels.
* ``lisa``      — LISA sensitivity/PSD zoo, inner products, likelihoods.
* ``inference`` — tempered ensemble MCMC (stretch moves, temperature ladder),
                  priors, transforms, backends.
* ``parallel``  — device-mesh sharding helpers (walker/frequency axes).
* ``utils``     — constants, spin-weighted harmonics, windows, ACT tools.

Precision: EMRI phases reach ~1e6 rad, so the package enables float64 at
import (disable with EMRI_TPU_DISABLE_X64=1 to experiment with compensated
f32 paths).
"""

from __future__ import annotations

import os

import jax

if not os.environ.get("EMRI_TPU_DISABLE_X64"):
    jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
