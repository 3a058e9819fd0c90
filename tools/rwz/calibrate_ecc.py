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

# robust-cleaning tolerances: a node is an outlier when its modulus
# deviates from the local (3x3 calibrated-neighbor) median by more than
# MAG_TOL x, or its phase from the circular neighbor mean by PH_TOL rad.
# Genuine residual fields measured on the raw table vary < ~15% per grid
# step; solver glitches (Wronskian drift / quadrature resonances at
# isolated nodes) show 1.5-5x modulus spikes and ~pi phase flips.
MAG_TOL = 1.35
PH_TOL = 0.35


def _calibrated_neighbors(logmag, ph, calib, i, j):
    nu, ne = calib.shape
    out = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            a, b = i + di, j + dj
            if 0 <= a < nu and 0 <= b < ne and calib[a, b]:
                out.append((logmag[a, b], ph[a, b]))
    return out


def clean_table(rows):
    """Robust post-pass on the raw residual grids.

    The eccentric solver occasionally glitches at isolated grid nodes
    (Wronskian drift, quadrature resonance): a 1.5-5x modulus spike or a
    ~pi phase flip sitting inside an otherwise smooth field. Those are
    numerical, not physics, and they poison the bilinear interpolation
    (and the 'bounded correction' contract) around the node. Three
    stages, all deterministic:

      1-2. outlier rejection (two sweeps, batch-detected then batch-
           replaced): any calibrated node deviating from its calibrated
           3x3 neighborhood median modulus by > MAG_TOL x or from the
           circular-mean phase by > PH_TOL rad is replaced by that
           neighborhood reference; isolated calibrated nodes (< 2
           calibrated neighbors) revert to R = 1.
      3.   smooth fill: uncalibrated nodes (R = 1 holes from the
           omega/amplitude floors) adjacent to >= 2 calibrated nodes are
           filled with the neighborhood reference, iterated to fixed
           point. The model amplitude at such nodes is negligible (that
           is WHY they were skipped), so the fill only removes bilinear
           cliffs — it cannot change any retained mode's physics.
      4.   Wiener shrinkage toward the circular-equivalent baseline,
           per mode and per component: split each field (log-modulus;
           phase) into a 3x3-median smooth part S and node-noise part N
           and keep alpha * S with alpha = var(S) / (var(S) + var(N)).
           Dominant modes, whose true eccentric residual modulus is ~1
           within the solver's node noise, shrink to ~identity (their
           smooth phase fields survive — that content has var(S) >>
           var(N)); genuinely miscalibrated weak families (e.g. m = 1,
           high n, |R| ~ 2-4 smooth fields) keep alpha ~ 1.
    """
    out = {}
    for key, r0 in rows.items():
        r = np.array(r0, dtype=complex)
        nu, ne = r.shape
        calib = np.abs(r - 1.0) > 1e-12
        for _ in range(2):
            logmag = np.log(np.abs(r))
            ph = np.angle(r)
            repl = {}
            for i in range(nu):
                for j in range(ne):
                    if not calib[i, j]:
                        continue
                    vals = _calibrated_neighbors(logmag, ph, calib, i, j)
                    if len(vals) < 2:
                        repl[(i, j)] = None
                        continue
                    lm = float(np.median([v[0] for v in vals]))
                    lp = float(np.angle(np.mean(
                        [np.exp(1j * v[1]) for v in vals])))
                    dph = float(np.angle(np.exp(1j * (ph[i, j] - lp))))
                    if (abs(logmag[i, j] - lm) > np.log(MAG_TOL)
                            or abs(dph) > PH_TOL):
                        repl[(i, j)] = np.exp(lm + 1j * lp)
            for (i, j), v in repl.items():
                if v is None:
                    r[i, j] = 1.0
                    calib[i, j] = False
                else:
                    r[i, j] = v
        for _ in range(nu + ne):
            logmag = np.log(np.abs(r))
            ph = np.angle(r)
            fills = {}
            for i in range(nu):
                for j in range(ne):
                    if calib[i, j]:
                        continue
                    vals = _calibrated_neighbors(logmag, ph, calib, i, j)
                    if len(vals) >= 2:
                        lm = float(np.median([v[0] for v in vals]))
                        lp = float(np.angle(np.mean(
                            [np.exp(1j * v[1]) for v in vals])))
                        fills[(i, j)] = np.exp(lm + 1j * lp)
            if not fills:
                break
            for (i, j), v in fills.items():
                r[i, j] = v
                calib[i, j] = True
        if calib.any():
            r = _wiener_shrink(r)
        out[key] = r
    return out


def _medfilt3(field):
    nu, ne = field.shape
    out = np.empty_like(field)
    for i in range(nu):
        for j in range(ne):
            lo_i, hi_i = max(i - 1, 0), min(i + 2, nu)
            lo_j, hi_j = max(j - 1, 0), min(j + 2, ne)
            out[i, j] = np.median(field[lo_i:hi_i, lo_j:hi_j])
    return out


def _wiener_shrink(r):
    """Stage 4 of clean_table (see its docstring)."""
    parts = []
    for field in (np.log(np.abs(r)), np.angle(r)):
        smooth = _medfilt3(field)
        var_s = float(np.mean(smooth**2))
        var_n = float(np.mean((field - smooth) ** 2))
        alpha = var_s / (var_s + var_n) if var_s + var_n > 0 else 0.0
        parts.append(alpha * smooth)
    return np.exp(parts[0] + 1j * parts[1])


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
    ap.add_argument("--clean-existing", type=str, default=None,
                    help="skip the solve: re-clean and rewrite an "
                         "existing generated table in place")
    args = ap.parse_args(argv)

    if args.clean_existing:
        clean_existing(args.clean_existing)
        return

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

    rows = clean_table(rows)
    write_table(args.out, rows, us[0], us[1] - us[0], es[0], es[1] - es[0],
                args.nu, args.ne)


def write_table(out, rows, u0, du, e0, de, nu, ne):
    lines = [
        '"""AUTO-GENERATED by tools/rwz/calibrate_ecc.py — do not edit.',
        "",
        "Eccentric strong-field residual calibration R_lmn(u, e) from the",
        "first-principles eccentric RWZ solver (tools/rwz/eccentric.py):",
        "COMPLEX per-mode amplitude ratio exact / (model x B_lm) on the",
        "regular (u, e) orbit grid (u = log(p - p_sep + U_SHIFT)),",
        "robust-cleaned (clean_table: isolated solver glitches rejected",
        "against the 3x3 neighborhood, amplitude-floor holes smooth-filled).",
        "Multiplies the complex per-mode amplitudes on top of the circular",
        "B_lm(x_mn) table (|R|: modulus residual, arg R: phase residual).",
        '"""',
        "",
        "import numpy as np",
        "",
        f"U0 = {float(u0)!r}",
        f"DU = {float(du)!r}",
        f"E0 = {float(e0)!r}",
        f"DE = {float(de)!r}",
        f"N_U = {nu}",
        f"N_E = {ne}",
        "",
        "R_TABLE = {",
    ]
    for key in sorted(rows):
        flat = ", ".join(
            f"{v.real:.10g}{v.imag:+.10g}j" for v in rows[key].ravel()
        )
        lines.append(
            f"    {key}: np.array([{flat}]).reshape({nu}, {ne}),"
        )
    lines.append("}")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote", out, f"({len(rows)} mode rows)")


def clean_existing(path):
    """Re-apply clean_table to an already-generated data module in place
    (the solve is hours; cleaning is deterministic and cheap)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("_ecc_existing", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rows = clean_table(mod.R_TABLE)
    write_table(path, rows, mod.U0, mod.DU, mod.E0, mod.DE,
                mod.N_U, mod.N_E)


if __name__ == "__main__":
    sys.exit(main())
