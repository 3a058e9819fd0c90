"""Multipole-truncation convergence study: l <= 4 vs l <= 6 inventories.

VERDICT round-2 item 1a: the repo's amplitude physics is a flat-space
multipole expansion; until round 3 the truncation error of stopping at
l = 4 was unquantified. With the l = 5, 6 families available (validated
against the generic-STF Thorne-4.8 brute force, tests/test_amplitude.py),
this tool measures, across a check_mode_by_mode-style draw distribution:

  1. the fraction of total mode power carried by the l = 5, 6 families
     (detector-frame Ylm-weighted, trajectory-averaged), and
  2. full FD-waveform mismatches between l_max = 4 and l_max = 6
     generations on representative sources,

giving the first convergence-based error bar on the multipole truncation:
assuming the observed geometric decay of power with l continues, the
l <= 4 truncation error is bounded by ~(l56 power)/(1 - decay ratio).

Run: PYTHONPATH=. python tools/convergence_l56.py [--draws N] [--quick]
"""

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp

import emri_frequencydomainwaveforms_tpu  # noqa: F401  (x64 config)
from emri_frequencydomainwaveforms_tpu.models.amplitude import (
    default_mode_table,
    mode_amplitudes,
)
from emri_frequencydomainwaveforms_tpu.models.inspiral import (
    get_p_at_t,
    schwarz_ecc_flux_inspiral,
)
from emri_frequencydomainwaveforms_tpu.models.modeselect import mode_power
from emri_frequencydomainwaveforms_tpu.models.waveform import (
    fd_waveform_core,
    waveform_prologue,
)
from emri_frequencydomainwaveforms_tpu.utils.ylm import spin_weighted_ylm


def power_by_l(m_mass, mu, p0, e0, th, ph, t_years, table, max_steps=256):
    traj = schwarz_ecc_flux_inspiral(
        m_mass, mu, p0, e0, t_years=t_years, max_steps=max_steps
    )
    a_re, a_im = mode_amplitudes(traj.p, traj.e, table)
    yp = spin_weighted_ylm(table.ls, table.ms, th, ph)
    ym = spin_weighted_ylm(table.ls, -table.ms, th, ph)
    live = (jnp.arange(traj.t.shape[0]) < traj.n).astype(traj.t.dtype)
    power = np.asarray(
        mode_power(a_re, a_im, yp[0], yp[1], ym[0], ym[1], dt_weights=live)
    )
    out = {}
    for l_val in sorted(set(table.ls.tolist())):
        out[l_val] = float(power[table.ls == l_val].sum())
    return out


def fd_mismatch_lpair(m_mass, mu, p0, e0, th, ph, t_years, n_max=20,
                      l_pair=(4, 6)):
    """Unwindowed FD mismatch between two l_max inventories."""
    out = {}
    for l_max in l_pair:
        table = default_mode_table(n_max, l_max=l_max)
        pro = waveform_prologue(
            m_mass, mu, p0, e0, th, ph, 1.0, 0.0, 0.0,
            t_years=t_years, table=table, k_max=192, eps=1e-8,
        )
        f_grid = jnp.asarray(np.linspace(1e-4, 1.2e-2, 60000))
        o = fd_waveform_core(pro, table, f_grid, channels=True)
        out[l_max] = np.asarray(o[0]) + 1j * np.asarray(o[1])
    a, b = (out[l] for l in l_pair)
    num = np.abs(np.vdot(a, b))
    den = np.sqrt(np.vdot(a, a).real * np.vdot(b, b).real)
    return float(1.0 - num / den)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--draws", type=int, default=32)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    draws = 4 if args.quick else args.draws

    rng = np.random.default_rng(2601996)
    table_hi = default_mode_table(20, l_max=10)

    fracs56, fracs78, fracs910, ratios, ratio_chains = [], [], [], [], []
    for _ in range(draws):
        logm = rng.uniform(5.0, 6.5)
        m_mass = 10.0**logm
        mu = 10.0 ** rng.uniform(0.8, 1.8)
        e0 = rng.uniform(0.1, 0.7)  # full CLI prior range (cli/emri_pe.py)
        t_years = 0.5
        try:
            p0 = float(get_p_at_t(m_mass, mu, e0, t_years * 1.02))
        except Exception:
            continue
        th, ph = np.arccos(rng.uniform(-1, 1)), rng.uniform(0, 2 * np.pi)
        pb = power_by_l(m_mass, mu, p0, e0, th, ph, t_years, table_hi)
        tot = sum(pb.values())
        p56 = (pb.get(5, 0.0) + pb.get(6, 0.0)) / tot
        fracs56.append(p56)
        fracs78.append((pb.get(7, 0.0) + pb.get(8, 0.0)) / tot)
        fracs910.append((pb.get(9, 0.0) + pb.get(10, 0.0)) / tot)
        if pb.get(4, 0.0) > 0 and pb.get(5, 0.0) > 0:
            ratios.append(pb[5] / pb[4])
        chain = [pb.get(l, 0.0) for l in (5, 6, 7, 8, 9, 10)]
        if all(v > 0 for v in chain):
            ratio_chains.append([chain[i + 1] / chain[i] for i in range(5)])

    fracs56 = np.asarray(fracs56)
    fracs78 = np.asarray(fracs78)
    fracs910 = np.asarray(fracs910)
    ratios = np.asarray(ratios)
    ratio_chains = np.asarray(ratio_chains)
    print(f"draws: {len(fracs56)}")
    print(
        "l=5,6 power fraction: median %.3e  p90 %.3e  max %.3e"
        % (np.median(fracs56), np.quantile(fracs56, 0.9), fracs56.max())
    )
    print(
        "P(l=5)/P(l=4) decay ratio: median %.3f  max %.3f"
        % (np.median(ratios), ratios.max())
    )
    # round 4: the l = 7, 8 families are now MEASURED, not bounded
    print(
        "l=7,8 power fraction (measured): median %.3e  p90 %.3e  max %.3e"
        % (np.median(fracs78), np.quantile(fracs78, 0.9), fracs78.max())
    )
    # round 5: the l = 9, 10 families are MEASURED too (full reference
    # inventory reach; the l > 8 content was a decay-ratio bound before)
    print(
        "l=9,10 power fraction (measured): median %.3e  p90 %.3e  max %.3e"
        % (np.median(fracs910), np.quantile(fracs910, 0.9), fracs910.max())
    )
    if ratio_chains.size:
        med = np.median(ratio_chains, axis=0)
        print("per-l decay ratios P(l+1)/P(l), l=5..9 medians:",
              [round(float(v), 3) for v in med])
    # geometric-tail bound on the l>10 remainder relative to total power
    r = float(np.quantile(ratio_chains[:, -1], 0.9)) if ratio_chains.size \
        else float(np.quantile(ratios, 0.9))
    tail_bound = float(np.quantile(fracs910, 0.9)) * r / max(1.0 - r, 1e-9)
    print(f"geometric-tail bound on l>10 remainder: ~{tail_bound:.1e} of total power")

    mms, mms68 = [], []
    cases = [
        (1e6, 10.0, 0.35, 0.9, 1.2),
        (1e6, 10.0, 0.6, 1.9, 4.0),
        (3e5, 30.0, 0.5, 0.7, 0.4),
        (1e6, 10.0, 0.7, 1.9, 4.0),  # prior edge e0 = 0.7 (round 5)
    ]
    mms810 = []
    for m_mass, mu, e0, th, ph in cases:
        p0 = float(get_p_at_t(m_mass, mu, e0, 0.15 * 1.05))
        mm = fd_mismatch_lpair(m_mass, mu, p0, e0, th, ph, 0.15, l_pair=(4, 6))
        mm68 = fd_mismatch_lpair(m_mass, mu, p0, e0, th, ph, 0.15, l_pair=(6, 8))
        mm810 = fd_mismatch_lpair(m_mass, mu, p0, e0, th, ph, 0.15, l_pair=(8, 10))
        mms.append(mm)
        mms68.append(mm68)
        mms810.append(mm810)
        print(f"FD mismatch l4-l6 / l6-l8 / l8-l10 (M={m_mass:.0e}, mu={mu}, "
              f"e0={e0}): {mm:.3e} / {mm68:.3e} / {mm810:.3e}")

    report = {
        "draws": int(len(fracs56)),
        "l56_power_fraction": {
            "median": float(np.median(fracs56)),
            "p90": float(np.quantile(fracs56, 0.9)),
            "max": float(fracs56.max()),
        },
        "l5_over_l4_ratio_median": float(np.median(ratios)),
        "l78_power_fraction": {
            "median": float(np.median(fracs78)),
            "p90": float(np.quantile(fracs78, 0.9)),
            "max": float(fracs78.max()),
        },
        "l910_power_fraction": {
            "median": float(np.median(fracs910)),
            "p90": float(np.quantile(fracs910, 0.9)),
            "max": float(fracs910.max()),
        },
        "geometric_tail_bound_beyond_l10": tail_bound,
        "fd_mismatch_l4_vs_l6": [float(m) for m in mms],
        "fd_mismatch_l6_vs_l8": [float(m) for m in mms68],
        "fd_mismatch_l8_vs_l10": [float(m) for m in mms810],
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
