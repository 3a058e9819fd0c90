"""Full-scale PE validation run (VERDICT round-2 item 4).

Runs the production `cli.emri_pe` configuration at the tutorial scale —
M = 1e6, mu = 10, e0 = 0.35, Tobs = 1 yr, dt = 10 s, eps = 1e-2, FD
template + FD injection, downsampled likelihood (reference `test.sh` /
`emri_pe.py:420-451` configuration) — with 6 sampled parameters
(lnM, ln eta, p0, e0, Phi_phi0, Phi_r0), ntemps >= 2, long enough for
ACT-converged marginals, then validates the posterior quantitatively:

  * integrated autocorrelation time and effective sample size per param;
  * marginal standard deviations against the Fisher-matrix (Cramer-Rao)
    predictions at the injected SNR — the in-repo analogue of the
    reference's `covariance.npy` scale comparison (that file is a GPU
    posterior by the reference authors and is not redistributable);
  * truth-recovery z-scores (posterior mean vs injected values).

Writes PE_VALIDATION.md + a corner plot and prints the summary. Intended
for the real TPU chip (wall ~15-30 min); --quick runs a toy-scale smoke.

Run: PYTHONPATH=.:/root/.axon_site python tools/pe_validation.py
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--nsteps", type=int, default=12000)
    ap.add_argument("--nwalkers", type=int, default=32)
    ap.add_argument("--ntemps", type=int, default=2)
    ap.add_argument("--downsample", type=int, default=100)
    ap.add_argument("--subset", type=int, default=16,
                    help="likelihood micro-batch (bounds peak HBM; the "
                         "(kmax, nf, max_steps) node->segment compare matrix "
                         "is ~190 MB/walker at kmax=16, max_steps=192)")
    ap.add_argument("--kmax", type=int, default=16)
    ap.add_argument("--max-steps", type=int, default=192)
    ap.add_argument("--tobs", type=float, default=1.0)
    ap.add_argument("--outname", type=str, default="pe_validation_run.h5")
    ap.add_argument("--reanalyze", type=str, default=None,
                    help="path to an existing run h5: skip the MCMC, reload "
                         "the chain, recompute the Fisher yardstick only")
    ap.add_argument("--flux", type=str, default=None,
                    help="override the trajectory flux model (default: the "
                         "cli.emri_pe default — the calibrated rwz stack)")
    ap.add_argument("--amp", type=str, default=None,
                    help="override the amplitude physics ladder")
    ap.add_argument("--fisher-general", action="store_true",
                    help="ALSO compute the Fisher on the f64 general "
                         "sorted-grid kernel with reference-small steps — "
                         "measures how much kernel noise inflates the "
                         "banded-kernel stencil (round-4 VERDICT weak #5)")
    args = ap.parse_args()

    from emri_frequencydomainwaveforms_tpu.cli.emri_pe import (
        _enable_compile_cache,
        build_parser,
        run_emri_pe,
    )

    _enable_compile_cache()

    cli = build_parser().parse_args([])
    cli.Tobs = 0.05 if args.quick else args.tobs
    cli.M, cli.mu, cli.e0 = 1e6, 10.0, 0.35
    cli.dt, cli.eps = 10.0, 1e-2
    cli.template, cli.injectFD, cli.downsample = "fd", 1, args.downsample
    cli.nwalkers, cli.ntemps = args.nwalkers, args.ntemps
    cli.subset = args.subset
    cli.kmax, cli.max_steps = args.kmax, args.max_steps
    cli.nsteps = 200 if args.quick else args.nsteps
    cli.outname = args.outname
    cli.start_scale = 1e-7
    cli.plot = True
    if args.flux is not None:
        cli.flux = args.flux
    if args.amp is not None:
        cli.amp = args.amp

    if args.reanalyze:
        import h5py

        from emri_frequencydomainwaveforms_tpu.models.inspiral import get_p_at_t

        with h5py.File(args.reanalyze, "r") as fh:
            chain = np.asarray(fh["mcmc/chain_emri"])
            accepted = np.asarray(fh["mcmc/accepted"])
            it = int(fh["mcmc"].attrs["iteration"])
            log_like = np.asarray(fh["mcmc/log_like"])
            betas_hist = np.asarray(fh["mcmc/betas"])
        p0_truth = float(get_p_at_t(cli.M, cli.mu, cli.e0, 0.99 * cli.Tobs))
        truth = np.array(
            [np.log(cli.M), np.log(cli.mu / cli.M), p0_truth, cli.e0, 1.0, 2.0]
        )
        acceptance = float(np.mean(accepted[0]) / max(it, 1))
        snr = None  # recomputed below from the injection
        wall = 0.0
        cli.outname = args.reanalyze
    else:
        tic = time.perf_counter()
        out = run_emri_pe(cli)
        wall = time.perf_counter() - tic
        chain = out["chain"]  # (nsteps, ntemps, nwalkers, 1, 6)
        truth = out["truth"]
        snr = float(out["snr"])
        sampler = out["sampler"]
        acceptance = float(np.mean(sampler.acceptance_fraction))
        log_like = np.asarray(sampler.backend.get_log_like())
        betas_hist = np.asarray(sampler.backend.get_betas())

    nsteps = chain.shape[0]
    burn = nsteps // 4
    cold = chain[burn:, 0, :, 0, :]  # (n, W, 6)
    flat = cold.reshape(-1, 6)
    flat = flat[~np.isnan(flat[:, 0])]

    # ---- ACT / ESS ----
    from emri_frequencydomainwaveforms_tpu.utils.autocorr import (
        get_integrated_act,
    )

    act = np.atleast_1d(np.asarray(get_integrated_act(cold)))
    ess = (cold.shape[0] * cold.shape[1]) / np.maximum(act, 1.0)

    # ---- Fisher (Cramer-Rao) yardstick ----
    import jax.numpy as jnp

    from emri_frequencydomainwaveforms_tpu.lisa.diagnostic import fisher
    from emri_frequencydomainwaveforms_tpu.lisa.sensitivity import get_sensitivity
    from emri_frequencydomainwaveforms_tpu.models.amplitude import default_mode_table
    from emri_frequencydomainwaveforms_tpu.models.waveform import (
        default_frequencies,
        fd_waveform_core,
        waveform_prologue,
    )
    from emri_frequencydomainwaveforms_tpu.utils.transform import TransformContainer

    t_years, dt = cli.Tobs, cli.dt
    table = default_mode_table(30)
    freq = default_frequencies(t_years, dt)
    f_np = freq[freq > 0][:: max(cli.downsample, 1)]
    f_arr = jnp.asarray(f_np)
    uniform = (float(f_np[0]), float(f_np[1] - f_np[0]))
    qS, phiS, qK, phiK = np.pi / 4, np.pi / 3, np.pi / 5, np.pi / 6
    transform = TransformContainer(
        parameter_transforms={
            (0, 1): lambda lm, le: [jnp.exp(lm), jnp.exp(lm) * jnp.exp(le)]
        },
        fill_dict={
            "ndim_full": 14,
            "fill_values": np.array([0.0, 1.0, 1.0, qS, phiS, qK, phiK, 0.0]),
            "fill_inds": np.array([2, 5, 6, 7, 8, 9, 10, 12]),
        },
    )

    amp = getattr(cli, "amp", "rwz")
    phys_kwargs = dict(
        flux=getattr(cli, "flux", "multipole_rwz"),
        tail=amp in ("tail", "factorized", "rwz"),
        factorized=amp in ("factorized", "rwz"),
        rwz=amp == "rwz",
    )

    def make_wf(banded: bool):
        import jax

        # jitted: the Fisher stencil makes ~25 evaluations, and eager
        # op-by-op dispatch over the remote-compile tunnel costs seconds
        # PER OP (~2000 ops at rwz physics)
        @jax.jit
        def _core(p14):
            m, mu, _, p0_, e0_, _, dist_, qs, fs, _, _, pph0, _, pr0 = p14
            pro = waveform_prologue(
                m, mu, p0_, e0_, qs, fs, dist_, pph0, pr0,
                t_years=t_years, table=table, k_max=args.kmax, eps=cli.eps,
                max_steps=args.max_steps, **phys_kwargs,
            )
            kw = dict(uniform=uniform) if banded else {}
            return fd_waveform_core(pro, table, f_arr, channels=True, **kw)

        def wf(params6):
            p14 = transform.both_transforms(jnp.asarray(params6)[None])[0]
            hpr, hpi, hcr, hci = _core(jnp.asarray(p14))
            return [
                np.asarray(hpr) + 1j * np.asarray(hpi),
                np.asarray(hcr) + 1j * np.asarray(hci),
            ]
        return wf

    wf = make_wf(banded=True)

    noise_fn = lambda f: np.asarray(
        get_sensitivity(np.asarray(f), sens_fn="cornish_lisa_psd")
    )
    if snr is None:
        from emri_frequencydomainwaveforms_tpu.lisa.diagnostic import snr as snr_fn

        h_inj = wf(truth)
        snr = float(snr_fn(h_inj, f_arr=f_np, PSD=noise_fn))
    # Step sizes set by the kernel's noise floor: the f32 dense pass carries
    # ~1e-2 rad bin-phase jitter (the 6.7e-5 FD/TD mismatch budget), so
    # finite differences need parameter steps large enough that the signal
    # change (eps * ||dh/dp||, in SNR units) dominates that jitter, while
    # staying inside the linear regime (eps * ||dh/dp|| << SNR). Measured
    # at this config: ||dh/dPhi|| converges to ~150 for eps >= 1e-3 but
    # reads ~1.3e4 of pure noise at the 1e-5 steps the reference-style
    # defaults would use. Phases are trigonometric polynomials in the
    # offsets (|m| <= 6), so 2.5e-2 is both noise-robust and ~1e-5 exact.
    eps_fd = np.array([1e-6, 3e-6, 3e-6, 1e-6, 2.5e-2, 2.5e-2])
    gamma = fisher(wf, truth, eps_fd, f_arr=f_np, PSD=noise_fn)
    # The EMRI Fisher in these coordinates is severely ill-conditioned;
    # f64 pinv truncates the soft (phase) directions and understates the
    # Cramer-Rao widths there. Use the reference-parity mpmath inverse
    # (reference diagnostic.py:389 precision branch).
    from emri_frequencydomainwaveforms_tpu.lisa.diagnostic import pinv_highprec

    cond = float(np.linalg.cond(gamma))
    cov_fisher = pinv_highprec(gamma)
    sig_fisher = np.sqrt(np.abs(np.diag(cov_fisher)))
    sig_fisher_f64 = np.sqrt(np.abs(np.diag(np.linalg.pinv(gamma))))
    np.save(cli.outname.replace(".h5", "_gamma.npy"), gamma)

    # measured (not narrated) test of the chain-width-ratio explanation:
    # recompute the Fisher on the f64 GENERAL kernel with 10x smaller
    # steps. If the banded-kernel stencil is noise-inflated, the general-
    # kernel sigma_Fisher comes out LARGER (less fake curvature), moving
    # the chain/Fisher ratios toward 1 (round-4 VERDICT weak #5).
    sig_fisher_gen = None
    if args.fisher_general:
        wf_gen = make_wf(banded=False)
        gamma_gen = fisher(
            wf_gen, truth, eps_fd / 10.0, f_arr=f_np, PSD=noise_fn
        )
        sig_fisher_gen = np.sqrt(np.abs(np.diag(pinv_highprec(gamma_gen))))
        np.save(cli.outname.replace(".h5", "_gamma_general.npy"), gamma_gen)

    sig_chain = flat.std(axis=0)
    mean_chain = flat.mean(axis=0)
    z = (mean_chain - truth) / np.maximum(sig_chain, 1e-300)
    ratio = sig_chain / np.maximum(sig_fisher, 1e-300)

    # ---- posterior-predictive residual check ----
    # Noiseless injection: logL(theta) = -1/2 <d-h, d-h>, so the cold chain's
    # peak log-like measures the best template's residual SNR directly, and
    # the posterior-mean template should reproduce the injection to an
    # overlap deficit ~ ndim/(2 SNR^2).
    from emri_frequencydomainwaveforms_tpu.lisa.diagnostic import inner_product

    logl_cold = log_like[burn:, 0, :]
    logl_max = float(np.nanmax(logl_cold))
    logl_med = float(np.nanmedian(logl_cold))
    h_inj = wf(truth)
    h_mean = wf(mean_chain)
    ip_kwargs = dict(f_arr=f_np, PSD=noise_fn)
    dd = float(inner_product(h_inj, h_inj, **ip_kwargs))
    hh = float(inner_product(h_mean, h_mean, **ip_kwargs))
    dh = float(inner_product(h_inj, h_mean, **ip_kwargs))
    overlap_mean = dh / np.sqrt(dd * hh)
    resid_snr2_mean = dd + hh - 2.0 * dh
    # Expected (Gaussian posterior in ndim=6): logl - logl_max ~ -chi2_6/2,
    # median chi2_6 = 5.35, so median logl ~ logl_max - 2.67; residual
    # SNR^2 of the mean template ~ O(ndim) << SNR^2.
    post_pred = {
        "logl_max_cold": logl_max,
        "logl_median_cold": logl_med,
        "expected_logl_median": logl_max - 2.67,
        "overlap_mean_template_vs_injection": overlap_mean,
        "residual_snr2_mean_template": resid_snr2_mean,
        "snr2_injection": dd,
    }

    # ---- evidence (thermodynamic integration over the tempered ladder) ----
    # With ntemps = 2 (betas {1, 0}) the trapezoid is dominated by the
    # prior-average rung and is only an order-of-magnitude bound; >= 4 rungs
    # make it quantitative. Cross-checked against the Laplace estimate
    # logZ ~ logL_max + log pi(truth) + ndim/2 log 2pi + 1/2 log det Cov.
    from emri_frequencydomainwaveforms_tpu.utils.autocorr import (
        thermodynamic_integration_log_evidence,
    )

    betas_final = betas_hist[-1]
    ll_post = log_like[burn:]
    ll_masked = np.where(
        np.isfinite(ll_post) & (ll_post > -1e290), ll_post, np.nan
    )
    mean_logls = np.nanmean(ll_masked, axis=(0, 2))
    logz_ti, dlogz_ti = thermodynamic_integration_log_evidence(
        betas_final, mean_logls
    )
    # uniform prior volume of the 6 sampled params (cli.emri_pe prior block)
    p0_truth_v = truth[2]
    ln_prior_vol = float(
        np.log(np.log(1e7) - np.log(5e5))
        + np.log(np.log(1e-4) - np.log(1e-6))
        + np.log((p0_truth_v + 3.0) - max(p0_truth_v - 2.0, 7.0))
        + np.log(0.7 - 0.001)
        + 2.0 * np.log(2.0 * np.pi)
    )
    sign, ln_det_cov = np.linalg.slogdet(cov_fisher)
    logz_laplace = (
        logl_max - ln_prior_vol + 0.5 * len(truth) * np.log(2 * np.pi)
        + 0.5 * ln_det_cov
    )
    evidence = {
        "logz_ti": float(logz_ti),
        "dlogz_ti": float(dlogz_ti),
        "logz_laplace": float(logz_laplace),
        "betas": [float(b) for b in betas_final],
        "note": "TI with 2 rungs is a bound, not an estimate; rerun with "
                "--ntemps 4+ for a quantitative ladder.",
    }

    labels = ["lnM", "ln(mu/M)", "p0", "e0", "Phi_phi0", "Phi_r0"]
    report = {
        "config": {
            "Tobs_yr": cli.Tobs, "M": cli.M, "mu": cli.mu, "e0": cli.e0,
            "dt": cli.dt, "eps": cli.eps, "downsample": cli.downsample,
            "nwalkers": cli.nwalkers, "ntemps": cli.ntemps,
            "nsteps": int(nsteps), "snr": snr,
        },
        "wall_seconds": wall,
        "acceptance": acceptance,
        "fisher_condition_number": cond,
        "act": {k: float(v) for k, v in zip(labels, act)},
        "ess": {k: float(v) for k, v in zip(labels, ess)},
        "sigma_chain": {k: float(v) for k, v in zip(labels, sig_chain)},
        "sigma_fisher": {k: float(v) for k, v in zip(labels, sig_fisher)},
        "sigma_fisher_f64_pinv": {
            k: float(v) for k, v in zip(labels, sig_fisher_f64)
        },
        "sigma_fisher_general_kernel": (
            {k: float(v) for k, v in zip(labels, sig_fisher_gen)}
            if sig_fisher_gen is not None else None
        ),
        "physics": phys_kwargs,
        "sigma_ratio_chain_over_fisher": {
            k: float(v) for k, v in zip(labels, ratio)
        },
        "truth_zscores": {k: float(v) for k, v in zip(labels, z)},
        "posterior_predictive": post_pred,
        "evidence": evidence,
    }
    print(json.dumps(report, indent=2))

    lines = [
        "# PE validation run (round 5)",
        "",
        "Production `cli.emri_pe` configuration at the tutorial scale, run on",
        "the real TPU chip; posterior validated against the Fisher (Cramer-Rao)",
        "prediction at the injected SNR and ACT-converged.",
        "",
        f"- config: Tobs={cli.Tobs} yr, M={cli.M:.0e}, mu={cli.mu}, e0={cli.e0},",
        f"  dt={cli.dt}, eps={cli.eps}, downsample={cli.downsample},",
        f"  template=fd, injectFD=1, nwalkers={cli.nwalkers}, ntemps={cli.ntemps},",
        f"  nsteps={nsteps}, SNR={snr:.1f}",
        f"- physics: flux={phys_kwargs['flux']}, amp ladder "
        f"tail={phys_kwargs['tail']} factorized={phys_kwargs['factorized']} "
        f"rwz={phys_kwargs['rwz']} (the production default stack)",
        (f"- Fisher reanalysis of {args.reanalyze} (sampling wall from the "
         f"original run); acceptance {report['acceptance']:.3f}"
         if args.reanalyze else
         f"- wall: {wall:.0f} s; acceptance {report['acceptance']:.3f}"),
        f"- Fisher condition number {cond:.2e} — inverted with the",
        "  reference-parity 500-dps mpmath branch (`pinv_highprec`);",
        "  f64 pinv widths shown for comparison (it truncates the soft",
        "  phase directions and understates the Cramer-Rao widths).",
        "",
        "| param | ACT | ESS | sigma_chain | sigma_Fisher | sigma_F(f64 pinv) | ratio | z(truth) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for i, k in enumerate(labels):
        lines.append(
            f"| {k} | {act[i]:.1f} | {ess[i]:.0f} | {sig_chain[i]:.3e} | "
            f"{sig_fisher[i]:.3e} | {sig_fisher_f64[i]:.3e} | "
            f"{ratio[i]:.2f} | {z[i]:+.2f} |"
        )
    if sig_fisher_gen is not None:
        lines += [
            "",
            "Kernel-noise test of the width ratios (f64 general kernel,",
            "10x smaller stencil steps — no banded-kernel phase jitter):",
            "",
            "| param | sigma_F(banded) | sigma_F(general f64) | "
            "ratio chain/general |",
            "|---|---|---|---|",
        ]
        for i, k in enumerate(labels):
            lines.append(
                f"| {k} | {sig_fisher[i]:.3e} | {sig_fisher_gen[i]:.3e} | "
                f"{sig_chain[i] / max(sig_fisher_gen[i], 1e-300):.2f} |"
            )
    lines += [
        "",
        "Posterior-predictive and evidence checks:",
        "",
        f"- cold-chain peak log-like {logl_max:+.2f} (noiseless injection:",
        f"  0 minus kernel noise), median {logl_med:+.2f} vs the Gaussian-",
        f"  posterior expectation {post_pred['expected_logl_median']:+.2f};",
        f"- posterior-mean template: overlap {overlap_mean:.6f} with the",
        f"  injection, residual SNR^2 {resid_snr2_mean:.1f} against",
        f"  injection SNR^2 {dd:.0f} (expect O(ndim) << SNR^2);",
        f"- evidence: TI logZ = {logz_ti:.1f} +- {dlogz_ti:.1f} over the",
        f"  {len(betas_final)}-rung ladder (2 rungs = bound only; see",
        f"  --ntemps), Laplace cross-check logZ = {logz_laplace:.1f}.",
        "",
        "Interpretation: ratio ~ 1 means the sampled marginals match the",
        "Cramer-Rao widths (the linear-signal regime expected at this SNR);",
        "|z| < ~3 means the truth is recovered within statistical error.",
        "Ratios modestly above 1 are expected: the Fisher prediction is the",
        "narrow (linearized, zero-noise) limit, the chain width estimate",
        "itself carries a few-percent ESS error, and the stencil derivatives",
        "retain some kernel-noise inflation on the steepest intrinsic",
        "directions (which *shrinks* sigma_Fisher, raising the ratio).",
        f"Corner plot: {cli.outname.replace('.h5', '_corner.png')}",
        "",
        "Reproduce: `PYTHONPATH=.:/root/.axon_site python tools/pe_validation.py`",
    ]

    # ---- external anchor: the reference's committed GPU chain ----
    # produced by tools/reference_chain_check.py (round-4 VERDICT item 6);
    # folded in when its artifact is present so the one document carries
    # both the in-repo Fisher closure AND the external cross-check.
    import os

    if os.path.exists("reference_chain_check.json"):
        with open("reference_chain_check.json") as fh:
            rc = json.load(fh)
        lines += [
            "",
            "## External cross-check: reference `samples_GPU.npy`",
            "",
            "The reference ships its production GPU posterior (5000x7,",
            "reference `emri_pe.py:420-422`; Tobs=4 yr paper configuration).",
            "`tools/reference_chain_check.py` compares that chain's marginal",
            "widths — produced entirely outside this repo (Teukolsky-flux",
            "trajectory + amplitude data + their sampler) — against OUR",
            "production stack's Cramer-Rao prediction at the same injection",
            f"(our SNR {rc['snr_ours']:.1f}, Fisher cond {rc['fisher_cond']:.1e}):",
            "",
            "| param | sigma(ref chain) | sigma_Fisher(ours) | ratio |",
            "|---|---|---|---|",
        ]
        for k in rc["width_ratio_ref_over_fisher"]:
            lines.append(
                f"| {k} | {rc['sigma_ref_chain'][k]:.3e} | "
                f"{rc['sigma_fisher_ours'][k]:.3e} | "
                f"{rc['width_ratio_ref_over_fisher'][k]:.2f} |"
            )
        lines += [
            "",
            "O(1) intrinsic-parameter ratios say both frameworks assign the",
            "same information content to the same source; the phase-constant",
            "rows inherit O(1) response-geometry model differences (tool",
            "docstring). Reproduce: `PYTHONPATH=.:/root/.axon_site python",
            "tools/reference_chain_check.py`.",
        ]
    with open("PE_VALIDATION.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote PE_VALIDATION.md")
    return report


if __name__ == "__main__":
    main()
