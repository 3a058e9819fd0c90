"""Relative-binning likelihood vs the full dense likelihood.

Pins the heterodyne pattern of the reference MBH pipeline stages
(``pipeline/pipeline.py:270-410``): on a PN-like chirp toy, the binned
likelihood must reproduce the full-grid log-likelihood over a posterior-
scale neighborhood of the fiducial point with a tiny fraction of the
evaluations.
"""

import numpy as np
import jax.numpy as jnp

from emri_frequencydomainwaveforms_tpu.lisa.relbin import (
    RelativeBinningLikelihood,
    select_bin_edges,
)

F = np.linspace(1e-3, 2e-2, 40000)
PSD = 1e-40 * (1.0 + (3e-3 / F) ** 4 + (F / 1e-2) ** 2)


def _chirp(params, f=None):
    """A f^{-7/6} e^{i(2 pi f t0 + phi0 + eta f^{-5/3})} — PN-like toy."""
    a, t0, phi0, eta = params
    f = F if f is None else np.asarray(f)
    psi = 2 * np.pi * f * t0 + phi0 + eta * (f / 1e-2) ** (-5.0 / 3.0)
    # amplitude scaled for SNR ~ 1e3: logL must move by >> 1 over the
    # posterior-scale displacements the test draws
    return a * (f / 1e-2) ** (-7.0 / 6.0) * np.exp(1j * psi) * 1e-19


def _full_logl(params, data):
    h = _chirp(params)
    df = F[1] - F[0]
    resid = data - h
    return float(-0.5 * np.sum(4.0 * df * np.abs(resid) ** 2 / PSD))


class TestRelativeBinning:
    def _setup(self):
        truth = np.array([1.0, 5e3, 0.8, 2.0])
        data = _chirp(truth)  # zero-noise injection
        h0 = _chirp(truth * (1.0 + 1e-4))  # fiducial near but not at truth

        def template_fn(params):
            # evaluated at the BIN EDGES, jnp-traceable (vmap/jit-able)
            f_e = jnp.asarray(np.asarray(like.f_edges))
            a, t0, phi0, eta = params[0], params[1], params[2], params[3]
            psi = (
                2 * np.pi * f_e * t0 + phi0 + eta * (f_e / 1e-2) ** (-5.0 / 3.0)
            )
            amp = a * (f_e / 1e-2) ** (-7.0 / 6.0) * 1e-19
            return [(amp * jnp.cos(psi), amp * jnp.sin(psi))]

        like = RelativeBinningLikelihood.__new__(RelativeBinningLikelihood)
        RelativeBinningLikelihood.__init__(
            like, template_fn, F, [data], [h0], PSD, max_bins=512
        )
        return truth, data, like

    def test_edges_shape(self):
        edges = select_bin_edges(F, max_bins=128)
        assert 16 <= len(edges) <= 129 + 1
        assert edges[0] == 0 and edges[-1] == len(F) - 1

    def test_matches_full_likelihood(self):
        truth, data, like = self._setup()
        rng = np.random.default_rng(3)
        # posterior-scale displacements around the fiducial
        scales = np.array([1e-3, 3e-2, 3e-3, 1e-4]) * np.abs(truth)
        max_err = 0.0
        spread = 0.0
        for _ in range(12):
            p = truth + rng.standard_normal(4) * scales
            full = _full_logl(p, data)
            rb = float(like.logl(jnp.asarray(p)))
            max_err = max(max_err, abs(rb - full))
            spread = max(spread, abs(full))
        # heterodyne truncation must be far below the logL variations
        assert spread > 1.0  # the displacements genuinely move logL
        assert max_err < 0.02 * spread

    def test_exact_at_fiducial_ratio_one(self):
        truth, data, like = self._setup()
        # at the fiducial the ratio is exactly 1 -> binning is exact
        fid = truth * (1.0 + 1e-4)
        rb = float(like.logl(jnp.asarray(fid)))
        full = _full_logl(fid, data)
        assert abs(rb - full) < 1e-6 * max(abs(full), 1.0)

    def test_batched_call(self):
        truth, data, like = self._setup()
        batch = jnp.asarray(np.stack([truth, truth * (1 + 1e-5)]))
        out = np.asarray(like(batch))
        assert out.shape == (2,)
        assert np.isfinite(out).all()
