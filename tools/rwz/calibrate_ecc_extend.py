"""Extend the committed eccentric calibration solve: e past 0.55, l = 5, 6.

Round-5 item (round-4 VERDICT missing #1/#2): the production residual table
(``models/_rwz_ecc_data.py``) covered l <= 4 rows on a 16x10 (u, e) grid
with e <= 0.55, while the PE prior reaches e0 = 0.7 (``cli/emri_pe.py``,
matching reference ``emri_pe.py``'s prior) and the l = 5..8 families ran on
B_lm alone (R = 1). This driver reuses the persisted raw solve
(``tools/rwz/_rwz_ecc_data_raw.npz`` — never re-run completed cells) and
solves ONLY the new cells:

  stage A: existing l <= 4 rows x the 3 added e-columns
           (0.6056, 0.6611, 0.7167 — same DE, N_E 10 -> 13), fixing the
           clamped-edge kink above e = 0.55;
  stage B: new l = 5, 6 rows (m = 0..l, n in [N_LO, N_HI]) x all 13 columns.

Baseline convention is IDENTICAL to tools/rwz/calibrate_ecc.py (f64
spectral projection, tail + factorized + circular B_lm, NO eccentric
residual — fixed-point regeneration), so merged old and new cells live on
one consistent surface. Checkpoints after every grid column
(``--checkpoint``, default tools/rwz/_rwz_ecc_ext_ckpt.npz) so an
interrupted run resumes without re-solving; ``--assemble`` skips straight
to clean_table + write_table from the checkpoint.

Reference parity: RomanAmplitude's Teukolsky data spans the full sampled
(p, e) range at l <= 10 (reference Tutorial_FD_construction_single_mode
.ipynb cells 2, 5); this table is the in-repo first-principles equivalent.

Run:  python -m tools.rwz.calibrate_ecc_extend [--lmax 6] [--ne-new 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from .calibrate_ecc import (
    N_HI,
    N_LO,
    OMEGA_MIN,
    _err_summary,
    clean_table,
    model_amplitudes_f64,
    write_table,
)

RAW = "tools/rwz/_rwz_ecc_data_raw.npz"
CKPT = "tools/rwz/_rwz_ecc_ext_ckpt.npz"
OUT = "emri_frequencydomainwaveforms_tpu/models/_rwz_ecc_data.py"


def _load_ckpt(path):
    dat = np.load(path)
    keys = [tuple(int(v) for v in k) for k in dat["keys"]]
    rows = {k: dat["rows"][i].copy() for i, k in enumerate(keys)}
    errs = {k: dat["errs"][i].copy() for i, k in enumerate(keys)}
    done = set(map(tuple, dat["done"].reshape(-1, 2).tolist()))
    grid = dat["grid"]
    return rows, errs, done, grid


def _save_ckpt(path, rows, errs, done, grid):
    keys = sorted(rows)
    np.savez_compressed(
        path + ".tmp.npz",
        keys=np.array(keys, dtype=np.int64),
        rows=np.stack([rows[k] for k in keys]),
        errs=np.stack([errs[k] for k in keys]),
        done=np.array(sorted(done), dtype=np.int64).reshape(-1, 2),
        grid=grid,
    )
    os.replace(path + ".tmp.npz", path)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--lmax", type=int, default=6)
    ap.add_argument("--ne-new", type=int, default=3,
                    help="e-columns appended past the raw table's range")
    ap.add_argument("--raw", type=str, default=RAW)
    ap.add_argument("--checkpoint", type=str, default=CKPT)
    ap.add_argument("--out", type=str, default=OUT)
    ap.add_argument("--assemble", action="store_true",
                    help="no solving: clean + write from the checkpoint")
    args = ap.parse_args(argv)

    if args.assemble:
        rows, errs, done, grid = _load_ckpt(args.checkpoint)
        u0, du, e0, de, nu, ne = grid
        rows, errs = clean_table(rows, errs)
        _err_summary(rows, errs)
        write_table(args.out, rows, u0, du, e0, de, int(nu), int(ne),
                    errs=errs)
        return

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from emri_frequencydomainwaveforms_tpu.models.amplitude import (
        default_mode_table,
    )
    from emri_frequencydomainwaveforms_tpu.models.rho import _x_of_mode
    from emri_frequencydomainwaveforms_tpu.models.rwz_calibration import (
        rwz_correction,
    )
    from emri_frequencydomainwaveforms_tpu.models.amplitude_backends import (
        _U_SHIFT,
    )

    from .eccentric import darwin_orbit, eccentric_amplitude

    # --- grids: same u nodes and DE as the committed raw solve ----------
    raw = np.load(args.raw)
    r_keys = [tuple(int(v) for v in k) for k in raw["keys"]]
    u0, du, e0, de, nu_old, ne_old = raw["grid"]
    nu, ne_old = int(nu_old), int(ne_old)
    ne = ne_old + args.ne_new
    us = u0 + du * np.arange(nu)
    es = e0 + de * np.arange(ne)
    grid = np.array([u0, du, e0, de, nu, ne])

    if os.path.exists(args.checkpoint):
        rows, errs, done, ck_grid = _load_ckpt(args.checkpoint)
        assert np.allclose(ck_grid, grid), "checkpoint grid mismatch"
        print(f"resuming: {len(done)} columns already solved", flush=True)
    else:
        rows = {k: np.ones((nu, ne), dtype=complex) for k in r_keys}
        errs = {k: np.zeros((nu, ne)) for k in r_keys}
        for i, k in enumerate(r_keys):
            rows[k][:, :ne_old] = raw["rows"][i]
            errs[k][:, :ne_old] = raw["errs"][i]
        done = set()

    table = default_mode_table(max(abs(N_LO), N_HI), l_max=args.lmax)
    tls, tms, tns = (np.asarray(a) for a in (table.ls, table.ms, table.ns))
    mode_idx = {}
    for l in range(2, args.lmax + 1):
        for m in range(0, l + 1):
            for n in range(N_LO, N_HI + 1):
                hit = np.where((tls == l) & (tms == m) & (tns == n))[0]
                if len(hit):
                    mode_idx[(l, m, n)] = int(hit[0])
    for k in mode_idx:
        if k not in rows:
            rows[k] = np.ones((nu, ne), dtype=complex)
            errs[k] = np.zeros((nu, ne))

    # stage A first (fixes the production e > 0.55 clamp for the modes
    # that dominate every source), then stage B (new l = 5, 6 rows)
    work = []
    for j in range(ne_old, ne):
        work.append(("A", j, [k for k in mode_idx if k[0] <= 4]))
    for j in range(ne):
        work.append(("B", j, [k for k in mode_idx if k[0] > 4]))

    from math import factorial as _fac

    t_start = time.time()
    for stage, j, keys in work:
        if (ord(stage), j) in done:
            continue
        e = float(es[j])
        for i, u in enumerate(us):
            p = float(np.exp(u) - _U_SHIFT + 6.0 + 2.0 * e)
            # finer chi at high e (more peaked orbit functionals) and
            # near the separatrix; measured errors at e = 0.717 with
            # n_chi = 2048: 1e-15..1e-10 rel
            if j >= ne_old:
                n_chi = 2048 if i < nu // 3 else 1024
            else:
                n_chi = 1024 if i < nu // 3 else 512
            orb = darwin_orbit(p, e, n_chi)
            a_base = model_amplitudes_f64(p, e, orb, table, tls, tms, tns)
            om_all = tms * orb["Om_phi"] + tns * orb["Om_r"]
            b_circ = np.asarray(rwz_correction(
                tls, tms, _x_of_mode(jnp.asarray(om_all), tms)))
            a_base = a_base * b_circ
            a_floor = 1e-8 * float(np.max(np.abs(a_base)))
            n_ok = 0
            for key in keys:
                l, m, n = key
                k = mode_idx[key]
                om = m * orb["Om_phi"] + n * orb["Om_r"]
                a_model = complex(a_base[k])
                if abs(om) < OMEGA_MIN or abs(a_model) < a_floor:
                    continue
                try:
                    c_rwz, _, c_coarse = eccentric_amplitude(
                        l, m, n, p, e, _orbit=orb, return_coarse=True)
                except RuntimeError as exc:
                    print(f"  skip {key} @ ({p:.3f},{e:.3f}): {exc}",
                          flush=True)
                    continue
                norm = np.sqrt(_fac(l + 2) / _fac(l - 2))
                if (l + m) % 2 == 0:
                    a_rwz = norm * c_rwz / 2.0
                else:
                    a_rwz = norm * c_rwz / om
                r = a_rwz / a_model
                if not np.isfinite(r) or not 0.2 < abs(r) < 5.0:
                    continue
                rows[key][i, j] = r
                errs[key][i, j] = float(
                    abs(c_rwz - c_coarse) / max(abs(c_rwz), 1e-300))
                n_ok += 1
            print(f"{stage} col {j} row {i} p={p:7.3f} e={e:.3f}: "
                  f"{n_ok} modes, {time.time() - t_start:7.0f}s",
                  flush=True)
        done.add((ord(stage), j))
        _save_ckpt(args.checkpoint, rows, errs, done, grid)
        print(f"checkpoint: stage {stage} column {j} done", flush=True)

    rows, errs = clean_table(rows, errs)
    _err_summary(rows, errs)
    write_table(args.out, rows, u0, du, e0, de, nu, ne, errs=errs)


if __name__ == "__main__":
    sys.exit(main())
