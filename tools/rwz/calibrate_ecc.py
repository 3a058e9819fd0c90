"""Generate the eccentric strong-field calibration table for the package.

For every production amplitude mode (l, m, n) (l <= --lmax, n in
[N_LO, N_HI]) computes, on the package's regular (u, e) orbit grid
(u = log(p - p_sep + _U_SHIFT), the amplitude/flux-grid convention), the
COMPLEX residual ratio

    R_lmn(u, e) = A_RWZ_lmn / (A_model_lmn B_lm(x_mn)),

where A_RWZ is the first-principles eccentric RWZ amplitude
(tools/rwz/eccentric.py) mapped to the package's amplitude units via the
flux normalization (even parity: sqrt(8 pi N_l) C / 2; odd:
sqrt(8 pi N_l) C / omega; N_l = (l+2)!/((l-2)! 8 pi)) and A_model is the
package's per-mode amplitude with tail + factorized applied (the
eccentric residual itself is deliberately EXCLUDED from the baseline, so
re-running this generator is a fixed point, not a feedback loop).  The
phase conventions agree IDENTICALLY at Newtonian order (measured
arg(R) -> 0 as p -> inf with no per-family constant), so arg(R) is the
genuine strong-field per-mode phase residual (~0.1 rad near the
separatrix) and |R| the modulus residual; both are content the
circular-equivalent x_mn prescription misses.  R multiplies the complex
per-mode amplitudes on top of B_lm(x_mn) (models/rwz_calibration.py).

Modes with |omega_mn| < OMEGA_MIN at a grid node keep R = 1 there (their
flux contribution carries the omega^2 suppression anyway); modes the
solver cannot calibrate are omitted from the table entirely (R = 1
fallback at application time).

Writes ``emri_frequencydomainwaveforms_tpu/models/_rwz_ecc_data.py``.

Run:  python -m tools.rwz.calibrate_ecc [--lmax 4] [--nu 10] [--ne 6]
      [--out <path>] [--families "2,2 3,3"] (subset for smoke tests)

Single-core cost at the defaults: ~2400 homogeneous-solution pairs
(~0.25 s each) per 10 grid columns — run it in the background; progress
prints per grid node.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

OMEGA_MIN = 2e-3
N_LO, N_HI = -2, 12


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--lmax", type=int, default=4)
    ap.add_argument("--nu", type=int, default=10)
    ap.add_argument("--ne", type=int, default=6)
    ap.add_argument("--nlo", type=int, default=N_LO)
    ap.add_argument("--nhi", type=int, default=N_HI)
    ap.add_argument("--e-max", type=float, default=0.55)
    ap.add_argument("--families", type=str, default=None,
                    help='subset, e.g. "2,2 3,3" (default: all m 0..l)')
    ap.add_argument("--out", type=str, default=(
        "emri_frequencydomainwaveforms_tpu/models/_rwz_ecc_data.py"))
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from emri_frequencydomainwaveforms_tpu.models.amplitude import (
        default_mode_table,
        mode_amplitudes,
    )
    from emri_frequencydomainwaveforms_tpu.models.amplitude_backends import (
        _U_SHIFT,
    )
    from emri_frequencydomainwaveforms_tpu.models.rho import _x_of_mode
    from emri_frequencydomainwaveforms_tpu.models.rwz_calibration import (
        rwz_correction,
    )

    from .eccentric import darwin_orbit, eccentric_amplitude

    if args.families:
        fams = [tuple(int(v) for v in tok.split(","))
                for tok in args.families.split()]
    else:
        fams = [(l, m) for l in range(2, args.lmax + 1)
                for m in range(0, l + 1)]
    ns = list(range(args.nlo, args.nhi + 1))

    us = np.linspace(np.log(_U_SHIFT + 0.05), np.log(16.0), args.nu)
    es = np.linspace(0.05, args.e_max, args.ne)

    table = default_mode_table(max(abs(args.nlo), args.nhi),
                               l_max=args.lmax)
    tls, tms, tns = (np.asarray(a) for a in (table.ls, table.ms, table.ns))
    mode_idx = {}
    for (l, m) in fams:
        for n in ns:
            hit = np.where((tls == l) & (tms == m) & (tns == n))[0]
            if len(hit):
                mode_idx[(l, m, n)] = int(hit[0])

    from math import factorial as _fac

    rows = {k: np.ones((args.nu, args.ne), dtype=complex) for k in mode_idx}
    t_start = time.time()
    for i, u in enumerate(us):
        for j, e in enumerate(es):
            p = float(np.exp(u) - _U_SHIFT + 6.0 + 2.0 * e)
            n_chi = 512 if i < args.nu // 3 else 256
            orb = darwin_orbit(p, e, n_chi)
            # baseline = tail + factorized + circular B_lm(x_mn); NOT the
            # eccentric residual itself (fixed-point regeneration)
            ar, ai = mode_amplitudes(
                jnp.asarray(p), jnp.asarray(e), table,
                tail=True, factorized=True,
            )
            om_all = (tms * orb["Om_phi"] + tns * orb["Om_r"])
            b_circ = np.asarray(rwz_correction(
                tls, tms, _x_of_mode(jnp.asarray(om_all), tms)
            ))
            ar = np.asarray(ar) * b_circ
            ai = np.asarray(ai) * b_circ
            a_floor = 1e-8 * float(np.max(np.hypot(ar, ai)))
            done = 0
            for (l, m, n), k in mode_idx.items():
                om = m * orb["Om_phi"] + n * orb["Om_r"]
                a_model = complex(ar[k], ai[k])
                if abs(om) < OMEGA_MIN or abs(a_model) < a_floor:
                    continue
                try:
                    c_rwz, _ = eccentric_amplitude(l, m, n, p, e, _orbit=orb)
                except RuntimeError as exc:  # Wronskian drift etc.
                    print(f"  skip ({l},{m},{n}) @ ({p:.3f},{e:.2f}): {exc}",
                          flush=True)
                    continue
                norm = np.sqrt(8.0 * np.pi * _fac(l + 2) / _fac(l - 2)
                               / (8.0 * np.pi))
                if (l + m) % 2 == 0:
                    a_rwz = norm * c_rwz / 2.0
                else:
                    a_rwz = norm * c_rwz / om
                r = a_rwz / a_model
                if not np.isfinite(r) or not 0.2 < abs(r) < 5.0:
                    # degenerate ratio (near-null model mode / tiny omega):
                    # leave R = 1 rather than poison the table
                    continue
                rows[(l, m, n)][i, j] = r
                done += 1
            print(
                f"node ({i},{j}) p={p:7.3f} e={e:.2f}: {done} modes, "
                f"{time.time() - t_start:7.0f}s elapsed", flush=True,
            )

    lines = [
        '"""AUTO-GENERATED by tools/rwz/calibrate_ecc.py — do not edit.',
        "",
        "Eccentric strong-field residual calibration R_lmn(u, e) from the",
        "first-principles eccentric RWZ solver (tools/rwz/eccentric.py):",
        "COMPLEX per-mode amplitude ratio exact / (model x B_lm) on the",
        "regular (u, e) orbit grid (u = log(p - p_sep + U_SHIFT)).",
        "Multiplies the complex per-mode amplitudes on top of the circular",
        "B_lm(x_mn) table (|R|: modulus residual, arg R: phase residual).",
        '"""',
        "",
        "import numpy as np",
        "",
        f"U0 = {us[0]!r}",
        f"DU = {(us[1] - us[0])!r}",
        f"E0 = {es[0]!r}",
        f"DE = {(es[1] - es[0])!r}",
        f"N_U = {args.nu}",
        f"N_E = {args.ne}",
        "",
        "R_TABLE = {",
    ]
    for key in sorted(rows):
        flat = ", ".join(
            f"{v.real:.10g}{v.imag:+.10g}j" for v in rows[key].ravel()
        )
        lines.append(
            f"    {key}: np.array([{flat}]).reshape({args.nu}, {args.ne}),"
        )
    lines.append("}")
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote", args.out, f"({len(rows)} mode rows)")


if __name__ == "__main__":
    sys.exit(main())
