"""Held-out validation of the eccentric RWZ residual table.

Solves the eccentric RWZ amplitudes at GRID-CELL MIDPOINTS — orbits the
calibration never saw — and compares against the bilinear interpolation
of the shipped `models/_rwz_ecc_data.py` table (exactly what
`rwz_calibration.rwz_ecc_residual` applies in production). The measured
midpoint deviation IS the table's interpolation + residual-model error
(round-4 VERDICT items 2/3: "held-out-node error table in PARITY.md").

Run: python -m tools.rwz.holdout_check [--modes "2,2,0 3,3,2 ..."]
Prints a per-mode table (max/median relative deviation over midpoints).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

DEFAULT_MODES = "2,2,0 2,2,2 2,0,1 2,1,1 3,3,1 3,1,3 4,4,0 4,2,2 3,3,6"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", type=str, default=DEFAULT_MODES)
    ap.add_argument("--n-mid", type=int, default=6,
                    help="midpoints along the u diagonal")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from emri_frequencydomainwaveforms_tpu.models import _rwz_ecc_data as ecc
    from emri_frequencydomainwaveforms_tpu.models.amplitude import (
        default_mode_table,
    )
    from emri_frequencydomainwaveforms_tpu.models.amplitude_backends import (
        _U_SHIFT,
    )
    from emri_frequencydomainwaveforms_tpu.models.rho import _x_of_mode
    from emri_frequencydomainwaveforms_tpu.models.rwz_calibration import (
        rwz_correction,
        rwz_ecc_residual,
    )

    from .calibrate_ecc import model_amplitudes_f64
    from .eccentric import darwin_orbit, eccentric_amplitude

    from math import factorial as _fac

    modes = [tuple(int(v) for v in tok.split(",")) for tok in args.modes.split()]
    table = default_mode_table(12, l_max=4)
    tls, tms, tns = (np.asarray(a) for a in (table.ls, table.ms, table.ns))
    mode_idx = {}
    for (l, m, n) in modes:
        hit = np.where((tls == l) & (tms == m) & (tns == n))[0]
        if len(hit):
            mode_idx[(l, m, n)] = int(hit[0])

    # midpoints along the grid diagonal (cell centers in both u and e)
    iu = np.linspace(0.5, ecc.N_U - 1.5, args.n_mid)
    ie = np.linspace(0.5, ecc.N_E - 1.5, args.n_mid)
    us = ecc.U0 + iu * ecc.DU
    es = ecc.E0 + ie * ecc.DE

    devs = {k: [] for k in mode_idx}
    amp_devs = {k: [] for k in mode_idx}
    for u, e in zip(us, es):
        p = float(np.exp(u) - _U_SHIFT + 6.0 + 2.0 * e)
        e = float(e)
        orb = darwin_orbit(p, e, 1024)
        a_base = model_amplitudes_f64(p, e, orb, table, tls, tms, tns)
        om_all = tms * orb["Om_phi"] + tns * orb["Om_r"]
        b_circ = np.asarray(
            rwz_correction(tls, tms, _x_of_mode(jnp.asarray(om_all), tms))
        )
        r_re, r_im = rwz_ecc_residual(
            tls, tms, tns, jnp.asarray(u), jnp.asarray(e)
        )
        r_interp = np.asarray(r_re) + 1j * np.asarray(r_im)
        a_dominant = float(np.max(np.abs(a_base * b_circ * r_interp)))
        for (l, m, n), k in mode_idx.items():
            om = float(om_all[k])
            if abs(om) < 2e-3 or abs(a_base[k]) == 0:
                continue
            c_rwz, _ = eccentric_amplitude(l, m, n, p, e, _orbit=orb)
            norm = np.sqrt(
                8.0 * np.pi * _fac(l + 2) / _fac(l - 2) / (8.0 * np.pi)
            )
            a_rwz = norm * c_rwz / 2.0 if (l + m) % 2 == 0 else norm * c_rwz / om
            r_true = a_rwz / (a_base[k] * b_circ[k])
            r_tab = r_interp[k]
            devs[(l, m, n)].append(abs(r_tab / r_true - 1.0))
            # amplitude-weighted: the waveform error the table deviation
            # actually causes, relative to the mode's own exact amplitude
            # floored at 1e-3 of the orbit's dominant mode (near model
            # zero-crossings R is singular but the product A B R stays
            # bounded; the ratio metric alone over-penalizes those)
            a_applied = a_base[k] * b_circ[k] * r_tab
            floor = max(abs(a_rwz), 1e-3 * a_dominant)
            amp_devs[(l, m, n)].append(abs(a_applied - a_rwz) / floor)

    print("held-out midpoint check — table bilinear R vs exact midpoint "
          "solve:")
    print("| mode | n_pts | R dev median | R dev max | amp dev median | "
          "amp dev max |")
    print("|---|---|---|---|---|---|")
    for key in sorted(devs):
        d = np.asarray(devs[key])
        a = np.asarray(amp_devs[key])
        if not d.size:
            continue
        print(
            f"| {key} | {d.size} | {np.median(d):.2e} | {d.max():.2e} | "
            f"{np.median(a):.2e} | {a.max():.2e} |"
        )
    print(
        "('amp dev' = applied-amplitude error relative to the exact mode "
        "amplitude, floored at 1e-3 of the orbit's dominant mode — the "
        "waveform-level impact.)"
    )


if __name__ == "__main__":
    sys.exit(main())
