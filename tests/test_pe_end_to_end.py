"""End-to-end parameter estimation: inject -> sample -> recover.

The statistical closure test of the whole stack (trajectory -> FD waveform
-> whitened likelihood -> tempered ensemble sampler), the equivalent of the
reference's ``emri_pe.py`` runs checked against known truths. Small config
tuned for CI runtime: short signal, 2 sampled parameters, downsampled grid.
"""

import numpy as np
import jax
import jax.numpy as jnp

from emri_frequencydomainwaveforms_tpu.models.amplitude import default_mode_table
from emri_frequencydomainwaveforms_tpu.models.waveform import (
    default_frequencies,
    fd_waveform_core,
    waveform_prologue,
)
from emri_frequencydomainwaveforms_tpu.lisa.likelihood import Likelihood
from emri_frequencydomainwaveforms_tpu.lisa.sensitivity import get_sensitivity
from emri_frequencydomainwaveforms_tpu.inference.ensemble import EnsembleSampler
from emri_frequencydomainwaveforms_tpu.inference.prior import (
    ProbDistContainer,
    uniform_dist,
)

T_YEARS = 0.02
DT = 10.0
M_TRUE, MU_TRUE = 1e6, 50.0
P0_TRUE, E0_TRUE = 9.2, 0.3


def test_pe_recovers_injection():
    table = default_mode_table(8, l_max=2)  # CI-size inventory
    freq = default_frequencies(T_YEARS, DT)
    f_np = freq[freq > 0][::20]
    f_arr = jnp.asarray(f_np)
    uniform = (float(f_np[0]), float(f_np[1] - f_np[0]))

    def template(params):
        p0, e0 = params[0], params[1]
        pro = waveform_prologue(
            M_TRUE, MU_TRUE, p0, e0, 0.7, 0.5, 1.0, 1.0, 2.0,
            t_years=T_YEARS, table=table, k_max=16, eps=1e-2, max_steps=128,
        )
        hpr, hpi, hcr, hci = fd_waveform_core(
            pro, table, f_arr, channels=True, uniform=uniform
        )
        return [(hpr, hpi), (hcr, hci)]

    like = Likelihood(template, 2, f_arr=f_arr)
    truth = jnp.asarray([P0_TRUE, E0_TRUE])
    chans = template(truth)
    data = [np.asarray(c[0]) + 1j * np.asarray(c[1]) for c in chans]
    noise = lambda f: np.asarray(get_sensitivity(np.asarray(f), sens_fn="cornish_lisa_psd"))
    like.inject_signal(data, noise_fn=noise)

    ll_truth = float(like(truth[None])[0])
    assert abs(ll_truth) < 1e-3  # zero residual at the injection

    priors = ProbDistContainer(
        {0: uniform_dist(P0_TRUE - 0.05, P0_TRUE + 0.05),
         1: uniform_dist(E0_TRUE - 0.02, E0_TRUE + 0.02)}
    )
    nwalkers, nsteps = 12, 18
    sampler = EnsembleSampler(
        nwalkers, [2], lambda x: like(x), {"emri": priors},
        branch_names=["emri"], seed=5,
    )
    rng = np.random.default_rng(7)
    start = np.stack(
        [
            rng.normal(P0_TRUE, 2e-6, (1, nwalkers)),
            rng.normal(E0_TRUE, 1e-6, (1, nwalkers)),
        ],
        axis=-1,
    )
    sampler.run_mcmc(jnp.asarray(start), nsteps, burn=6)

    chain = sampler.get_chain(discard=6)["emri"][:, 0, :, 0, :].reshape(-1, 2)
    ll = sampler.get_log_like(discard=6)[:, 0, :].ravel()

    # the chain must stay in a tight high-likelihood region around the truth
    assert np.median(ll) > -30.0
    p0_post, e0_post = chain[:, 0], chain[:, 1]
    assert abs(np.mean(p0_post) - P0_TRUE) < 1e-3
    assert abs(np.mean(e0_post) - E0_TRUE) < 1e-3
    # posterior actually explored (nonzero spread), acceptance healthy
    assert np.std(p0_post) > 1e-8
    acc = np.mean(np.asarray(sampler.acceptance_fraction))
    assert 0.05 < acc < 0.95
