"""Relative-binning (heterodyned) likelihood.

Rebuilds the relative-binning machinery embedded in the reference's MBH
pipeline stages (``LISAanalysistools/lisatools/pipeline/pipeline.py:270-410``
``MBHRelBinSearch`` / ``MBHRelBinPE`` — there provided by the external
``bbhx`` waveform's rel-bin mode) as a standalone, waveform-agnostic
utility: the Zackay-Dalal-Venumadhav scheme. Given a fiducial waveform
h0 close to the target region, the smooth ratio r(f) = h(f)/h0(f) is
piecewise-linear over coarse frequency bins, so the full-grid inner
products collapse onto per-bin summary coefficients:

  A0_b = 4 sum_{f in b} df d conj(h0) / S        (data x fiducial)
  A1_b = ... (f - fbar_b) ...                     (linear moment)
  B0_b = 4 sum_{f in b} df |h0|^2 / S             (fiducial norm)
  B1_b = ... (f - fbar_b) ...

  <d|h>  ~= Re sum_b [ A0_b conj(r_b) + A1_b conj(r'_b) ]
  <h|h>  ~= sum_b [ B0_b |r_b|^2 + 2 B1_b Re(r_b conj(r'_b)) ]

with r_b the bin-center ratio and r'_b its slope from the bin-edge values.
The template is then evaluated at only ``nbins + 1`` frequencies per
likelihood call — the orders-of-magnitude speedup the reference pipeline
exploits for MBH search/PE.

TPU-native shape: setup (binning + summaries) runs host-side in numpy
f64; the per-call core is pure jnp on (re, im) pairs (no complex dtypes),
jittable and vmappable over walkers.

Applicability: the scheme assumes the ratio h/h0 is SMOOTH over a coarse
bin — true for single-chirp-dominated signals (the MBH use case this
mirrors), NOT for full multi-harmonic EMRI waveforms, where overlapping
mode bands make the ratio oscillate within bins (measured on-device:
percent-level absolute logL truncation at posterior-scale displacements).
Heterodyning EMRIs requires a per-harmonic split; use the downsampled
`f_arr` likelihood path for EMRI production instead.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def select_bin_edges(f_dense: np.ndarray, max_bins: int = 512,
                     gammas=(-5.0 / 3.0, -2.0 / 3.0, 1.0, 5.0 / 3.0, 7.0 / 3.0)):
    """Frequency bin edges with the standard phase-variation criterion.

    The heterodyne ratio's phase drifts like a sum of power laws f^gamma
    (PN-like); edges are placed at equal increments of the summed
    normalized variation so each bin carries a comparable phase budget.
    """
    f = np.asarray(f_dense, dtype=np.float64)
    fmin, fmax = f[0], f[-1]
    t = np.zeros_like(f)
    for g in gammas:
        seg = np.abs(f**g - fmin**g) / max(abs(fmax**g - fmin**g), 1e-300)
        t = t + seg
    t = t / t[-1]
    targets = np.linspace(0.0, 1.0, max_bins + 1)
    idx = np.unique(np.searchsorted(t, targets))
    idx[0] = 0
    idx[-1] = len(f) - 1
    return np.unique(idx)


class RelativeBinningLikelihood:
    """Heterodyned log-likelihood around a fiducial waveform.

    Args:
      template_fn: ``params -> channels`` where each channel is an
        ``(re, im)`` pair evaluated AT ``self.f_edges`` (length nbins+1).
      f_dense: dense analysis frequencies (the full likelihood grid).
      data: list of complex data channels on ``f_dense``.
      h0: list of complex fiducial channels on ``f_dense`` (same params
        family as the templates; typically the search point).
      psd: PSD values on ``f_dense`` (scalar array or per-channel list).
      max_bins: coarse bin budget.
    """

    def __init__(self, template_fn: Callable, f_dense, data, h0, psd,
                 max_bins: int = 512):
        self.template_fn = template_fn
        f = np.asarray(f_dense, dtype=np.float64)
        data = [np.asarray(d) for d in data]
        h0 = [np.asarray(h) for h in h0]
        if not isinstance(psd, (list, tuple)):
            psd = [np.asarray(psd)] * len(data)
        psd = [np.asarray(p) for p in psd]

        df = np.empty_like(f)
        df[1:] = np.diff(f)
        df[0] = df[1] if len(f) > 1 else 1.0

        edge_idx = select_bin_edges(f, max_bins=max_bins)
        self.f_edges = f[edge_idx]
        nb = len(edge_idx) - 1
        self.nbins = nb

        # bin assignment of every dense sample (right-closed last bin)
        bin_of = np.clip(np.searchsorted(self.f_edges, f, side="right") - 1, 0, nb - 1)
        fbar = 0.5 * (self.f_edges[:-1] + self.f_edges[1:])
        self.fbar = fbar

        a0, a1, b0, b1 = [], [], [], []
        self._dd = 0.0
        # unmodelable support: samples where the fiducial vanishes (EMRI
        # FD waveforms are zero between per-mode frequency bands) carry
        # data power that the heterodyne ratio cannot represent — their
        # residual |d - h0|^2 is frozen at the fiducial value instead
        # (exact at the fiducial, second-order in the displacement near
        # it; for smooth single-band chirps like the reference's MBH use
        # case this set is empty and the scheme reduces to standard ZDV)
        self._resid0 = 0.0
        for d, h, p in zip(data, h0, psd):
            w = 4.0 * df / p
            dead = np.abs(h) == 0.0
            self._resid0 += float(np.sum(w[dead] * np.abs(d[dead]) ** 2))
            d = np.where(dead, 0.0, d)
            integ0 = w * d * np.conj(h)
            integ_b = w * np.abs(h) ** 2
            dfreq = f - fbar[bin_of]
            a0.append(np.bincount(bin_of, weights=integ0.real, minlength=nb)
                      + 1j * np.bincount(bin_of, weights=integ0.imag, minlength=nb))
            a1.append(
                np.bincount(bin_of, weights=(integ0 * dfreq).real, minlength=nb)
                + 1j * np.bincount(bin_of, weights=(integ0 * dfreq).imag, minlength=nb)
            )
            b0.append(np.bincount(bin_of, weights=integ_b, minlength=nb))
            b1.append(np.bincount(bin_of, weights=integ_b * dfreq, minlength=nb))
            self._dd += float(np.sum(w * np.abs(d) ** 2))
        self._a0 = [(jnp.asarray(x.real), jnp.asarray(x.imag)) for x in a0]
        self._a1 = [(jnp.asarray(x.real), jnp.asarray(x.imag)) for x in a1]
        self._b0 = [jnp.asarray(x) for x in b0]
        self._b1 = [jnp.asarray(x) for x in b1]
        # strain-scale normalization: |h0|^2 ~ 1e-38 underflows the TPU's
        # double-float f64 (values below the f32 normal range flush to
        # zero); the ratio r = (h/s)/(h0/s) is scale-invariant, so both
        # sides are normalized by a per-channel scale
        self._scale = [
            float(np.median(np.abs(h[edge_idx])) + 1e-300) for h in h0
        ]
        self._h0_edges = [
            (
                jnp.asarray(h[edge_idx].real / s),
                jnp.asarray(h[edge_idx].imag / s),
            )
            for h, s in zip(h0, self._scale)
        ]
        self._df_bins = jnp.asarray(np.diff(self.f_edges))
        self.f_edges_j = jnp.asarray(self.f_edges)

    def logl(self, params) -> jax.Array:
        """Heterodyned logL = <d|h> - 0.5 <h|h> - 0.5 <d|d> (one source)."""
        chans = self.template_fn(params)
        out = 0.0
        for ci, (hr, hi) in enumerate(chans):
            inv_s = 1.0 / self._scale[ci]
            hr = hr * inv_s
            hi = hi * inv_s
            h0r, h0i = self._h0_edges[ci]
            den = h0r * h0r + h0i * h0i
            # live-bin mask instead of a tiny-epsilon guard: sub-1e-38
            # constants FLUSH TO ZERO in the TPU's double-float f64, so a
            # 1e-300 floor becomes 0 and dead fiducial edges (h0 = 0
            # outside the mode bands) would yield 0/0 = NaN. Dead edges
            # carry zero summary weight (A/B integrals vanish where
            # h0 = 0), so r there is arbitrary — pin it to 0.
            live = den > 1e-30
            den_safe = jnp.where(live, den, 1.0)
            rr = jnp.where(live, (hr * h0r + hi * h0i) / den_safe, 0.0)
            ri = jnp.where(live, (hi * h0r - hr * h0i) / den_safe, 0.0)
            # bin-center value and slope from the edge samples
            rbr = 0.5 * (rr[1:] + rr[:-1])
            rbi = 0.5 * (ri[1:] + ri[:-1])
            rpr = (rr[1:] - rr[:-1]) / self._df_bins
            rpi = (ri[1:] - ri[:-1]) / self._df_bins
            a0r, a0i = self._a0[ci]
            a1r, a1i = self._a1[ci]
            dh = jnp.sum(a0r * rbr + a0i * rbi + a1r * rpr + a1i * rpi)
            hh = jnp.sum(
                self._b0[ci] * (rbr * rbr + rbi * rbi)
                + 2.0 * self._b1[ci] * (rbr * rpr + rbi * rpi)
            )
            out = out + dh - 0.5 * hh
        return out - 0.5 * (self._dd + self._resid0)

    def __call__(self, params_batch) -> jax.Array:
        """Vectorized over a leading walker axis."""
        params_batch = jnp.asarray(params_batch)
        if params_batch.ndim == 1:
            return self.logl(params_batch)
        return jax.vmap(self.logl)(params_batch)


__all__ = ["RelativeBinningLikelihood", "select_bin_edges"]
