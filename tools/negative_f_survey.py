"""Measure the mode power carried by negative-frequency harmonics
(round-4 VERDICT item 8).

The FD kernel covers f_mn(t) < 0 ranges only when ``negative_slots > 0``
(reference behavior: notebook cell 26 ``index_negative_f`` always
evaluated). This survey quantifies what that content is worth across the
`check_mode_by_mode` draw distribution: per draw, the eps-selected mode
set's power is split by the SIGN of f_mn along the inspiral (a mode can
cross zero mid-inspiral — counted as negative for the knots where it is),
in the same dt-weighted power measure the mode selector uses.

If the negative fraction is below the 1e-4 mismatch gate everywhere, the
production default ``negative_slots = 0`` is justified and this survey is
its documented bound; otherwise flip the facade default.

Run: JAX_PLATFORMS='' python -m tools.negative_f_survey [--draws 32]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--draws", type=int, default=32)
    ap.add_argument("--tobs", type=float, default=1.0)
    ap.add_argument("--eps", type=float, default=1e-2)
    ap.add_argument("--seed", type=int, default=2601996)
    ap.add_argument("--rwz", action="store_true", default=True)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from emri_frequencydomainwaveforms_tpu.models.amplitude import (
        default_mode_table,
        mode_amplitudes,
    )
    from emri_frequencydomainwaveforms_tpu.models.geodesic import (
        fundamental_frequencies,
    )
    from emri_frequencydomainwaveforms_tpu.models.inspiral import (
        get_p_at_t,
        schwarz_ecc_flux_inspiral,
    )
    from emri_frequencydomainwaveforms_tpu.models.modeselect import mode_power
    from emri_frequencydomainwaveforms_tpu.utils.ylm import spin_weighted_ylm
    from emri_frequencydomainwaveforms_tpu.inference.prior import (
        ProbDistContainer,
        uniform_dist,
    )

    rng = np.random.default_rng(args.seed)
    priors = ProbDistContainer(
        {
            0: uniform_dist(np.log(5e5), np.log(4e6)),
            1: uniform_dist(np.log(1e-5), np.log(1e-4)),
            2: uniform_dist(0.1, 0.5),
        }
    )
    table = default_mode_table(30)
    amp_kw = (
        dict(tail=True, factorized=True, rwz=True) if args.rwz else {}
    )

    fracs, worst = [], None
    for i in range(args.draws):
        lm, leta, e0 = np.asarray(
            priors.rvs(size=1, random_state=rng)
        ).ravel()
        m_big = float(np.exp(lm))
        mu = float(np.exp(leta) * m_big)
        try:
            p0 = float(get_p_at_t(m_big, mu, e0, 0.99 * args.tobs))
        except Exception:
            continue
        traj = schwarz_ecc_flux_inspiral(
            m_big, mu, p0, float(e0), t_years=args.tobs, max_steps=512
        )
        live = np.arange(traj.t.shape[0]) < int(traj.n)
        p_k = np.asarray(traj.p)[live]
        e_k = np.asarray(traj.e)[live]
        a_re, a_im = mode_amplitudes(
            jnp.asarray(p_k), jnp.asarray(e_k), table, **amp_kw
        )
        om_phi, om_r = fundamental_frequencies(
            jnp.asarray(p_k), jnp.asarray(e_k)
        )
        th, ph = 0.7, 0.5
        yp = spin_weighted_ylm(table.ls, table.ms, th, ph)
        ym = spin_weighted_ylm(table.ls, -table.ms, th, ph)
        # dt-weighted per-knot power, same measure as the selector
        pw_tot = np.asarray(a_re) ** 2 + np.asarray(a_im) ** 2  # (K, M)
        y2 = (
            np.asarray(yp[0]) ** 2 + np.asarray(yp[1]) ** 2
            + np.asarray(ym[0]) ** 2 + np.asarray(ym[1]) ** 2
        )
        pw_tot = pw_tot * y2[None, :]
        om = (
            table.ms[None, :] * np.asarray(om_phi)[:, None]
            + table.ns[None, :] * np.asarray(om_r)[:, None]
        )
        neg = om < 0.0
        frac = float(np.sum(pw_tot[neg]) / np.sum(pw_tot))
        fracs.append(frac)
        if worst is None or frac > worst[0]:
            worst = (frac, m_big, mu, p0, float(e0))

    fracs = np.asarray(fracs)
    print(
        f"draws={len(fracs)}  negative-f power fraction: "
        f"median {np.median(fracs):.3e}  p95 {np.percentile(fracs, 95):.3e}"
        f"  max {fracs.max():.3e}"
    )
    print(
        "worst draw: frac %.3e at M=%.3e mu=%.2f p0=%.3f e0=%.3f"
        % worst
    )
    print(
        "gate context: FD/TD mismatch budget 1e-4; a negative-f power "
        "fraction f contributes O(f) mismatch if dropped."
    )


if __name__ == "__main__":
    sys.exit(main())
