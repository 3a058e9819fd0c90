"""FD waveform API walkthrough (reference tutorial parity).

Runnable port of the reference's ``Tutorial_FrequencyDomain_Waveforms.ipynb``:

  1. TD generation + FFT vs direct FD generation on the same grid
     (notebook cells 4-8: "FD model" vs "DFT of TD");
  2. explicit single-mode selection ``mode_selection=[(2, 2, 0)]``
     (cell 7) and the inverse FFT back to the time domain (cell 9);
  3. windowing through the `get_fd_waveform_fromTD` / `fromFD` adapters
     (cells 11-13);
  4. the mass-invariance collapse — dimensionless strain vs Mf overlays
     across total masses when (mu/M, duration/M) are held fixed
     (cells 15-16);
  5. frequency-downsampled waveforms at the paper source (cells 18-19).

Every section prints a quantitative check instead of relying on plots;
``--plot`` writes the figures. CI-quick by default (T = 0.05 yr).

Run:
    PYTHONPATH=.:/root/.axon_site python examples/fd_waveforms_tutorial.py
    JAX_PLATFORMS='' python examples/fd_waveforms_tutorial.py   # CPU
"""

import argparse

import numpy as np

import emri_frequencydomainwaveforms_tpu  # noqa: F401  (f64 config)

from emri_frequencydomainwaveforms_tpu.models.waveform import (
    FastSchwarzschildEccentricFlux,
    default_frequencies,
)
from emri_frequencydomainwaveforms_tpu.utils.fdutils import (
    get_fd_waveform_fromFD,
    get_fd_waveform_fromTD,
)
from emri_frequencydomainwaveforms_tpu.utils.windows import hann


def _mismatch(a, b):
    num = np.abs(np.vdot(a, b))
    den = np.sqrt(np.vdot(a, a).real * np.vdot(b, b).real) + 1e-300
    return float(1.0 - num / den)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--T", type=float, default=0.1, help="observation years")
    ap.add_argument("--dt", type=float, default=10.0)
    args = ap.parse_args()

    # injection parameters (notebook cell 2, CI-quick scaling): mu = 50
    # keeps the frequency evolution fast enough that the SPA is accurate
    # over the short default window — the stationary-phase representation
    # of a barely-chirping signal (mu = 10 at T = 0.05 yr) is dominated by
    # finite-window sinc leakage, which is physics, not kernel error; the
    # notebook's own configs run T = 2-4 yr. Full-scale accuracy claims
    # live in bench.py's 1-yr gates.
    M, mu, p0, e0 = 1e6, 50.0, 12.0, 0.4
    theta, phi = np.pi / 3, np.pi / 4
    T, dt = args.T, args.dt
    eps = 1e-2

    td_gen = FastSchwarzschildEccentricFlux(sum_kwargs={"output_type": "td"})
    fd_gen = FastSchwarzschildEccentricFlux(sum_kwargs={"output_type": "fd"})

    # ---- 1. TD FFT vs direct FD on the same grid (cells 4-8) ----
    h_td = td_gen(M, mu, p0, e0, theta, phi, T=T, dt=dt, eps=eps,
                  return_channels=True)
    freq = default_frequencies(T, dt)
    pos = freq >= 0  # the facade's mask_positive keeps f = 0 (reference too)
    fft_td = np.fft.fftshift(np.fft.fft(h_td[0])) * dt

    hf = fd_gen(M, mu, p0, e0, theta, phi, T=T, dt=dt, eps=eps,
                mask_positive=True, return_channels=True)
    mm = _mismatch(hf[0], fft_td[pos])
    print(f"[1] FD model vs DFT(TD), h+ unwindowed mismatch: {mm:.3e}")

    # ---- 2. single-mode selection + inverse FFT to TD (cells 7, 9) ----
    hf_220 = fd_gen(M, mu, p0, e0, theta, phi, T=T, dt=dt,
                    mode_selection=[(2, 2, 0)], mask_positive=True,
                    return_channels=True)
    frac = np.vdot(hf_220[0], hf_220[0]).real / np.vdot(hf[0], hf[0]).real
    print(f"[2] (2,2,0) mode carries {frac:.3f} of the h+ FD power")
    # rebuild the full two-sided spectrum and invert (cell 9)
    full = fd_gen(M, mu, p0, e0, theta, phi, T=T, dt=dt, eps=eps,
                  return_channels=True)
    ifft_fd = np.fft.ifft(np.fft.ifftshift(full[0])) / dt
    n = len(h_td[0])
    mid = slice(n // 4, 3 * n // 4)  # away from window-free edge leakage
    a = ifft_fd.real[mid]
    b = np.asarray(h_td[0])[mid]
    ov = np.dot(a, b) / np.sqrt(np.dot(a, a) * np.dot(b, b) + 1e-300)
    print(f"[2] iFFT(FD) vs TD mid-signal overlap: {ov:.4f}")

    # ---- 3. windowed adapters (cells 11-13) ----
    w = np.asarray(hann(n))
    fft_td_gen = get_fd_waveform_fromTD(
        lambda *a, **k: td_gen(*a, **k, return_channels=True), pos, dt, window=w
    )
    fd_win_gen = get_fd_waveform_fromFD(
        lambda *a, **k: fd_gen(*a, **k, return_channels=True), pos, dt, window=w
    )
    td_w = fft_td_gen(M, mu, p0, e0, theta, phi, T=T, dt=dt, eps=eps)
    fd_w = fd_win_gen(M, mu, p0, e0, theta, phi, T=T, dt=dt, eps=eps)
    mm_w = _mismatch(fd_w[0], td_w[0])
    print(f"[3] Hann-windowed FD vs TD mismatch: {mm_w:.3e} "
          f"(short-T floor ~1/T; the 1e-4 gate is enforced at 1 yr in bench.py)")

    # ---- 4. mass invariance (cells 15-16): fix mu/M and T/M, overlay
    # dimensionless strain vs Mf — curves must collapse ----
    from emri_frequencydomainwaveforms_tpu.utils.constants import MTSUN_SI

    m_vec = 10 ** np.linspace(5.5, 6.5, 3)
    specs = []
    for m_i in m_vec:
        t_i = T * m_i / 1e6
        mu_i = 1e-5 * m_i
        h_i = fd_gen(m_i, mu_i, p0, e0, theta, phi, T=t_i, dt=dt,
                     eps=eps, mask_positive=True, return_channels=True)
        keep = fd_gen.frequency >= 0
        f_i = fd_gen.frequency[keep][1:]  # drop the f = 0 bin for log-Mf
        mf = f_i * m_i * MTSUN_SI
        amp = np.abs(h_i[0][1:]) / (m_i / 1e6) ** 2  # strain ~ mu M / f-norm
        specs.append((mf, amp))
    # compare the middle spectra on a common Mf grid (log-interp)
    mf_ref = specs[1][0]
    sel = (mf_ref > max(s[0][0] for s in specs)) & (
        mf_ref < min(s[0][-1] for s in specs)
    )
    interp = [
        np.interp(mf_ref[sel], s[0], s[1]) for s in specs
    ]
    coll = max(
        np.median(np.abs(a - interp[1])[interp[1] > 0] / interp[1][interp[1] > 0])
        for a in (interp[0], interp[2])
    )
    print(f"[4] mass-invariance collapse (median rel dev across M): {coll:.3f}")

    # ---- 5. downsampled waveforms (cells 18-19) ----
    f_full = fd_gen.frequency
    for upp in (1, 100):
        f_ds = f_full[f_full > 0][::upp]
        h_ds = fd_gen(M, mu, p0, e0, theta, phi, T=T, dt=dt, eps=eps,
                      f_arr=f_ds, return_channels=True)
        if upp == 1:
            base = (f_ds, h_ds[0])
        else:
            sub = np.isin(base[0], f_ds)
            rel = np.sqrt(
                np.mean(np.abs(base[1][sub] - h_ds[0]) ** 2)
                / (np.mean(np.abs(h_ds[0]) ** 2) + 1e-300)
            )
            print(f"[5] downsample x{upp}: {len(f_ds)} bins, "
                  f"agreement with full grid on shared bins: {rel:.3e}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure()
        plt.loglog(freq[pos], np.abs(fft_td[pos]) ** 2, label="DFT of TD")
        plt.loglog(freq[pos], np.abs(hf[0]) ** 2, "--", label="FD model")
        plt.loglog(freq[pos], np.abs(hf_220[0]) ** 2, ":", label="(2,2,0)")
        plt.xlabel("f [Hz]"); plt.ylabel("|h+(f)|^2"); plt.legend()
        plt.savefig("fd_tutorial_spectra.png", dpi=120)
        plt.figure()
        for (mf, amp), m_i in zip(specs, m_vec):
            plt.loglog(mf, amp, label=f"M={m_i:.1e}")
        plt.xlabel("Mf"); plt.ylabel("scaled |h+|"); plt.legend()
        plt.savefig("fd_tutorial_mass_invariance.png", dpi=120)
        print("wrote fd_tutorial_spectra.png, fd_tutorial_mass_invariance.png")


if __name__ == "__main__":
    main()
