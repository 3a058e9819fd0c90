"""FD signal-processing utilities: windowing, spectral convolution, adapters.

Rebuilds the reference's ``FDutils.py`` capability surface (behavior pinned
at reference ``FDutils.py:35-178``):

* ``get_convolution(a, b)`` — circular convolution normalized by ``len(b)``
  (``FDutils.py:35-47``: linear convolution of the doubled array, valid mode);
* ``get_fft_td_windowed(signal, window, dt)`` — ``fftshift(fft(h * w)) * dt``
  per channel (``FDutils.py:49-64``);
* ``get_fd_windowed(signal, window)`` — windowing applied *in the frequency
  domain* by spectral convolution with ``conj(fft(window))``
  (``FDutils.py:66-101``);
* adapter classes ``get_fd_waveform_fromFD`` / ``get_fd_waveform_fromTD``
  that mask positive frequencies and zero user-masked bins
  (``FDutils.py:105-178``).

These are host-side analysis utilities (run once per injection, not in the
sampler hot loop), so they use numpy FFTs — complex128 never needs to touch
the TPU. The Sokal autocorrelation tools the reference keeps here live in
``utils.autocorr``.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import fftconvolve


def get_convolution(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Circular convolution of ``a`` and ``b`` normalized by ``len(b)``.

    Matches the reference implementation: linear convolution of
    ``[a[1:], a]`` with ``b`` in 'valid' mode, i.e. the circular convolution
    evaluated at every shift, divided by the window length.
    """
    a = np.asarray(a)
    b = np.asarray(b)
    return fftconvolve(np.hstack((a[1:], a)), b, mode="valid") / len(b)


def dft_at_bins(h, bin_idx, n_t: int, chunk: int = 64):
    """DFT of a real series at selected bins (jittable, TPU-safe).

    Returns ``(re, im)`` equal to ``rfft(h)[bin_idx]`` for a length-``n_t``
    series. Replaces ``jnp.fft.rfft`` in device code: XLA's TPU FFT of the
    odd default grid length (reference ``odd_len=True``) lowers to a dense
    (N, N) DFT matrix — a ~400 GB allocation for 1-yr signals. Here the
    needed bins are evaluated directly as chunked (chunk, N) matmuls with
    EXACT modular phase arguments (k*t mod N in int64, so f32 trig sees
    angles in [-2 pi, 0]). Batched ``h`` (..., N) rides the matmul.
    """
    import jax
    import jax.numpy as jnp

    bin_idx = jnp.asarray(bin_idx, jnp.float64)
    n_bins = bin_idx.shape[0]
    pad = (-n_bins) % chunk
    idx_p = jnp.concatenate([bin_idx, jnp.zeros((pad,))]) if pad else bin_idx
    t_idx = jnp.arange(n_t, dtype=jnp.float64)
    h32 = jnp.asarray(h).astype(jnp.float32)

    def one_chunk(kc):
        # k*t <= (n/2)*n < 2^53: exact in f64 (int64 would be emulated and
        # ~100x slower on TPU); the mod keeps the product an exact integer
        kt = kc[:, None] * t_idx[None, :]
        kn = kt - n_t * jnp.floor(kt * (1.0 / n_t))
        # f32 angles: kn < n_t <= 2^24 exact in f32, |ang| <= 2 pi, so f32
        # trig costs only ~1e-7 rad (f64 transcendentals are software calls)
        ang = kn.astype(jnp.float32) * jnp.float32(-2.0 * np.pi / n_t)
        c = jnp.cos(ang)
        sn = jnp.sin(ang)
        re = jnp.tensordot(c, h32, axes=((1,), (h32.ndim - 1,)))
        im = jnp.tensordot(sn, h32, axes=((1,), (h32.ndim - 1,)))
        return re, im

    re, im = jax.lax.map(one_chunk, idx_p.reshape(-1, chunk))
    re = re.reshape((-1,) + h32.shape[:-1])[:n_bins]
    im = im.reshape((-1,) + h32.shape[:-1])[:n_bins]
    # bin axis leads; move it last to match h's batch layout
    re = jnp.moveaxis(re, 0, -1)
    im = jnp.moveaxis(im, 0, -1)
    return re.astype(jnp.float64), im.astype(jnp.float64)


def get_fft_td_windowed(signal, window, dt: float):
    """FFT of windowed TD channels: ``fftshift(fft(h * w)) * dt``."""
    return [np.fft.fftshift(np.fft.fft(np.asarray(s) * np.asarray(window))) * dt for s in signal]


def get_fd_windowed(signal, window=None, window_in_fd: bool = False):
    """Apply a TD window to FD channels by spectral convolution."""
    if window is None:
        return [np.asarray(s) for s in signal]
    fft_window = np.asarray(window) if window_in_fd else np.fft.fft(np.asarray(window))
    return [get_convolution(np.conj(fft_window), np.asarray(s)) for s in signal]


class get_fd_waveform_fromFD:
    """Adapter: FD generator -> positive-frequency windowed [h+, hx].

    Same constructor/call contract as the reference class: wraps a
    ``return_list`` FD generator, applies optional FD-domain windowing, masks
    to positive frequencies, zeroes ``~non_zero_mask`` bins.
    """

    def __init__(
        self,
        waveform_generator,
        positive_frequency_mask,
        dt,
        non_zero_mask=None,
        window=None,
        window_in_fd=False,
    ):
        self.waveform_generator = waveform_generator
        self.positive_frequency_mask = np.asarray(positive_frequency_mask)
        self.dt = dt
        self.non_zero_mask = None if non_zero_mask is None else np.asarray(non_zero_mask)
        self.window = window
        self.window_in_fd = window_in_fd

    def __call__(self, *args, **kwargs):
        channels = self.waveform_generator(*args, **kwargs)
        channels = get_fd_windowed(channels, self.window, window_in_fd=self.window_in_fd)
        out = [np.asarray(c)[self.positive_frequency_mask].copy() for c in channels]
        if self.non_zero_mask is not None:
            for c in out:
                c[~self.non_zero_mask] = 0.0j
        return out


class get_fd_waveform_fromTD:
    """Adapter: TD generator -> positive-frequency FFT'd windowed [h+, hx]."""

    def __init__(self, waveform_generator, positive_frequency_mask, dt, non_zero_mask=None, window=None):
        self.waveform_generator = waveform_generator
        self.positive_frequency_mask = np.asarray(positive_frequency_mask)
        self.dt = dt
        self.non_zero_mask = None if non_zero_mask is None else np.asarray(non_zero_mask)
        self.window = window  # None -> boxcar

    def __call__(self, *args, **kwargs):
        channels = self.waveform_generator(*args, **kwargs)
        window = np.ones(len(channels[0])) if self.window is None else self.window
        channels = get_fft_td_windowed(channels, window, self.dt)
        out = [np.asarray(c)[self.positive_frequency_mask].copy() for c in channels]
        if self.non_zero_mask is not None:
            for c in out:
                c[~self.non_zero_mask] = 0.0j
        return out


__all__ = [
    "get_convolution",
    "get_fft_td_windowed",
    "get_fd_windowed",
    "get_fd_waveform_fromFD",
    "get_fd_waveform_fromTD",
]
