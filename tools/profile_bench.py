"""Ablation profiler for the bench hot path.

Times the bench configuration (batch-128, 1-yr grid) with stages ablated to
locate where the per-waveform milliseconds go:

  * prologue        — trajectory + mode selection + spline fits + amplitudes
  * full            — the exact bench `gen` (16 slots x 256 runs + 2 turnover)
  * no_turnover     — extras scan removed
  * runs=N          — main window budget swept (128/256/384) to split the
                      marginal banded-kernel cost (level-1 nodes + dense pass
                      both scale with the run budget) from fixed overheads

Accuracy is irrelevant here (narrow budgets clip bands); timing only.

Run: PYTHONPATH=.:/root/.axon_site python tools/profile_bench.py
"""

import time

import numpy as np

T_YEARS, DT = 1.0, 10.0
EPS = 1e-2
K_MAX = 16
MAX_STEPS = 192
BATCH = 128
REPS = 4
BINS_PER_RUN = 64


def main():
    import os

    import emri_frequencydomainwaveforms_tpu  # noqa: F401
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from emri_frequencydomainwaveforms_tpu.models.amplitude import default_mode_table
    from emri_frequencydomainwaveforms_tpu.models.waveform import (
        band_offsets_for,
        default_frequencies,
        fd_waveform_core,
        waveform_prologue,
    )

    table = default_mode_table(30)
    freq = default_frequencies(T_YEARS, DT)
    f_np = freq[freq > 0]
    f_arr = jnp.asarray(f_np)
    f0u, dfu = float(f_np[0]), float(f_np[1] - f_np[0])
    uniform = (f0u, dfu)

    pro_sel = waveform_prologue(
        1e6, 10.0, 12.0, 0.35, 0.7, 0.5, 1.0, 0.0, 0.0,
        t_years=T_YEARS, table=table, k_max=K_MAX, eps=EPS, max_steps=MAX_STEPS,
    )
    forced_idx = np.asarray(pro_sel.sel.idx)

    def prologue(p0, e0, th, ph):
        return waveform_prologue(
            1e6, 10.0, p0, e0, th, ph, 1.0, 0.0, 0.0,
            t_years=T_YEARS, table=table, k_max=K_MAX, eps=EPS,
            max_steps=MAX_STEPS, forced_idx=forced_idx,
        )

    pro0 = prologue(12.0, 0.35, 0.7, 0.5)

    rng = np.random.default_rng(7)
    p0s = jnp.asarray(12.0 + 0.12 * (rng.random(BATCH) - 0.5))
    e0s = jnp.asarray(0.35 + 0.03 * (rng.random(BATCH) - 0.5))
    ths = jnp.asarray(0.7 + 0.2 * (rng.random(BATCH) - 0.5))
    phs = jnp.asarray(0.5 + 0.2 * (rng.random(BATCH) - 0.5))

    def timed(fn, label):
        @jax.jit
        def loop(p0s, e0s, ths, phs):
            def body(i, acc):
                out = fn(p0s + i * 1e-7, e0s, ths, phs)
                leaves = jax.tree_util.tree_leaves(out)
                return acc + sum(jnp.sum(o.astype(jnp.float64)) for o in leaves)
            return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float64))

        s = loop(p0s, e0s, ths, phs)
        float(s)
        t0 = time.perf_counter()
        for _ in range(2):
            float(loop(p0s, e0s, ths, phs))
        dt = (time.perf_counter() - t0) / (2 * REPS * BATCH)
        print(f"{label:28s} {dt * 1e3:8.4f} ms/wf   ({1.0 / dt:8.1f} wf/s)")
        return dt

    timed(lambda a, b, c, d: jax.vmap(prologue)(a, b, c, d), "prologue only")

    def make_gen(band_runs, turnover, extra_runs):
        offs = jnp.asarray(
            band_offsets_for(pro0, table, f0u, dfu, BINS_PER_RUN, band_runs)
        )
        offs_x = jnp.zeros((turnover,), jnp.int32) if turnover else None

        def gen(p0, e0, th, ph):
            pro = prologue(p0, e0, th, ph)
            return fd_waveform_core(
                pro, table, f_arr, channels=True, uniform=uniform,
                band_runs=band_runs, band_offsets=offs,
                bins_per_run=BINS_PER_RUN, turnover_slots=turnover,
                extra_band_runs=extra_runs if turnover else None,
                band_offsets_extra=offs_x,
            )

        return lambda a, b, c, d: jax.vmap(gen)(a, b, c, d)

    timed(make_gen(256, 2, 64), "full (bench: 256r + 2TO)")
    timed(make_gen(256, 0, None), "no turnover (256r)")
    timed(make_gen(384, 0, None), "runs=384")
    timed(make_gen(128, 0, None), "runs=128")
    timed(make_gen(64, 0, None), "runs=64")

    # scan-unroll sweep: isolates the lax.scan carry-copy cost of the
    # 4 x pad_len f32 accumulators (unrolled slots fuse their RMWs)
    def make_gen_unroll(unroll):
        offs = jnp.asarray(band_offsets_for(pro0, table, f0u, dfu, BINS_PER_RUN, 256))

        def gen(p0, e0, th, ph):
            pro = prologue(p0, e0, th, ph)
            return fd_waveform_core(
                pro, table, f_arr, channels=True, uniform=uniform,
                band_runs=256, band_offsets=offs, bins_per_run=BINS_PER_RUN,
                scan_unroll=unroll,
            )

        return lambda a, b, c, d: jax.vmap(gen)(a, b, c, d)

    timed(make_gen_unroll(4), "no TO, scan_unroll=4")
    timed(make_gen_unroll(16), "no TO, scan_unroll=16")



    # Pallas-batched path (DMA-owned window accumulation, no scan carries;
    # main increasing-branch slots only — lacks turnover content)
    from emri_frequencydomainwaveforms_tpu.models.summation_fd import (
        fd_mode_sum_uniform_pallas_batched,
        prepare_fd_inputs,
    )
    from emri_frequencydomainwaveforms_tpu.models.waveform import _sigma

    offs_p = jnp.asarray(band_offsets_for(pro0, table, f0u, dfu, BINS_PER_RUN, 256))
    sig = _sigma(table)

    def prep_one(p0, e0, th, ph):
        pro = prologue(p0, e0, th, ph)
        ypr, ypi = pro.y_plus
        ymr, ymi = pro.y_minus
        w1 = ((sig * ymr + ypr) * 0.5, (sig * ymi - ypi) * 0.5)
        w2 = (-(sig * ymi + ypi) * 0.5, (sig * ymr - ypr) * 0.5)
        return prepare_fd_inputs(
            pro.t_knots, pro.n_live, pro.phi_phi, pro.phi_r,
            pro.a_re, pro.a_im, table, pro.sel, w1, w2,
            w1n=(w1[0], -w1[1]), w2n=(w2[0], -w2[1]),
        )

    def gen_pallas(p0s, e0s, ths, phs):
        inp_b = jax.vmap(prep_one)(p0s, e0s, ths, phs)
        nf = f_arr.shape[0]
        return fd_mode_sum_uniform_pallas_batched(
            inp_b, f0u, dfu, nf, bins_per_run=BINS_PER_RUN,
            band_runs=256, band_offsets=offs_p,
        )

    if jax.devices()[0].platform != "cpu":
        timed(gen_pallas, "pallas batched (256r)")
    else:
        print("pallas batched (256r)        skipped (CPU backend)")

    # ---- staged ablation of the banded kernel (main slots, 256r) ----
    # splits the fixed block into: node math (level-1 tables incl. the
    # one-hot matmul), dense flops (phase Hermite + sincos + weights, no
    # accumulation), and accumulator traffic (the full RMW pipeline is the
    # "no turnover (256r)" row above minus the dense row).
    import math as _math

    import jax.numpy as _jnp
    from emri_frequencydomainwaveforms_tpu.models import summation_fd as _sfd

    BAND_RUNS = 256
    offs_l1 = jnp.asarray(band_offsets_for(pro0, table, f0u, dfu, BINS_PER_RUN, BAND_RUNS))
    run_df = BINS_PER_RUN * dfu

    def level1_tables(inp):
        cphi_all = (
            inp.m_sel[:, None, None] * inp.c_phi_phi[None]
            + inp.n_sel[:, None, None] * inp.c_phi_r[None]
        )
        f_knots_all = (
            inp.m_sel[:, None] * inp.f_phi_knots[None, :]
            + inp.n_sel[:, None] * inp.f_r_knots[None, :]
        )
        k_max = cphi_all.shape[0]
        return _sfd._level1_uniform_tables(
            cphi_all, inp.ar_c, inp.ai_c, f_knots_all, offs_l1,
            inp.inc_lo, inp.inc_hi, _jnp.ones((k_max,), _jnp.int32),
            inp.t_knots, f0u, dfu, BINS_PER_RUN, BAND_RUNS + 1, run_df,
        )

    def gen_level1(p0, e0, th, ph):
        inp = prep_one(p0, e0, th, ph)
        pc, ec, fs, fe = level1_tables(inp)
        return _jnp.sum(pc) + _jnp.sum(ec) + _jnp.sum(fs) + _jnp.sum(fe)

    timed(lambda a, b, c, d: jax.vmap(gen_level1)(a, b, c, d),
          "prep + level1 tables")

    def gen_dense_noacc(p0, e0, th, ph):
        inp = prep_one(p0, e0, th, ph)
        pc, ec, fs, fe = level1_tables(inp)
        f32 = _jnp.float32
        r = BINS_PER_RUN
        xi = ((_jnp.arange(r, dtype=f32)) * f32(1.0 / r))[None, :]

        def body(acc, mode):
            pc_i, ec_i, f_start, f_end, w1r, w1i, live_i = mode
            p0_, p1_, p2_, p3_ = (pc_i[:, i:i + 1] for i in range(4))
            psi = p0_ + xi * (p1_ + xi * (p2_ + xi * p3_))
            c, s = _jnp.cos(psi), _jnp.sin(psi)
            er = ec_i[:, 0:1] + xi * (ec_i[:, 1:2] + xi * (ec_i[:, 2:3] + xi * ec_i[:, 3:4]))
            ei = ec_i[:, 4:5] + xi * (ec_i[:, 5:6] + xi * (ec_i[:, 6:7] + xi * ec_i[:, 7:8]))
            cre = er * c - ei * s
            cim = er * s + ei * c
            f_node0 = f0u  # band mask skipped: flop-isolating ablation
            keep = (cre == cre) & (live_i > 0)
            cre = _jnp.where(keep, cre, 0.0)
            cim = _jnp.where(keep, cim, 0.0)
            v = cre * w1r.astype(f32) - cim * w1i.astype(f32)
            return acc + _jnp.sum(v) + _jnp.sum(cre * w1i.astype(f32)), None

        acc, _ = jax.lax.scan(
            body, _jnp.zeros((), f32),
            (pc, ec, fs, fe, inp.w1_re, inp.w1_im, inp.inc_live),
        )
        return acc

    timed(lambda a, b, c, d: jax.vmap(gen_dense_noacc)(a, b, c, d),
          "prep + level1 + dense flops")


if __name__ == "__main__":
    main()
