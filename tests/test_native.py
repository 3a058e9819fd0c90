"""Golden cross-validation: C++ host integrator vs the jittable integrator.

Two independent implementations of the same ODE (C++ DP5 with a
finite-difference Jacobian; JAX DP5 with an autodiff Jacobian) must agree —
mutual validation that catches bugs in either.
"""

import numpy as np
import pytest

from emri_frequencydomainwaveforms_tpu.models.inspiral import schwarz_ecc_flux_inspiral
from emri_frequencydomainwaveforms_tpu.utils.constants import MTSUN_SI, YRSID_SI


@pytest.fixture(scope="module")
def native():
    import native as native_mod

    native_mod.build()
    return native_mod


class TestNativeTrajectory:
    def test_matches_jax_integrator(self, native):
        m, mu, p0, e0, T = 1e6, 10.0, 12.0, 0.35, 0.5
        t_max_geo = T * YRSID_SI / (m * MTSUN_SI)
        t_c, y_c = native.integrate_inspiral_native(p0, e0, mu / m, t_max_geo)

        traj = schwarz_ecc_flux_inspiral(m, mu, p0, e0, t_years=T)
        n = int(traj.n)
        t_j = np.asarray(traj.t[:n]) / (m * MTSUN_SI)

        # endpoints agree
        np.testing.assert_allclose(t_c[-1], t_j[-1], rtol=1e-9)
        np.testing.assert_allclose(y_c[-1, 0], float(traj.p[n - 1]), rtol=1e-8)
        np.testing.assert_allclose(y_c[-1, 1], float(traj.e[n - 1]), rtol=1e-7)
        # the accumulated phases (~1e5 rad) agree to small absolute error
        assert abs(y_c[-1, 2] - float(traj.Phi_phi[n - 1])) < 1e-3
        assert abs(y_c[-1, 3] - float(traj.Phi_r[n - 1])) < 1e-3

    def test_plunging_case(self, native):
        m, mu = 1e6, 300.0
        t_max_geo = 4.0 * YRSID_SI / (m * MTSUN_SI)
        t_c, y_c = native.integrate_inspiral_native(9.0, 0.4, mu / m, t_max_geo)
        # reaches the separatrix cutoff
        assert y_c[-1, 0] - (6.0 + 2.0 * y_c[-1, 1]) < 0.2
        traj = schwarz_ecc_flux_inspiral(m, mu, 9.0, 0.4, t_years=4.0)
        n = int(traj.n)
        np.testing.assert_allclose(y_c[-1, 0], float(traj.p[n - 1]), atol=2e-3)

    def test_duration_helper(self, native):
        m, mu = 1e6, 10.0
        dur = native.inspiral_duration_native(12.0, 0.35, mu / m, 8 * YRSID_SI / (m * MTSUN_SI))
        from emri_frequencydomainwaveforms_tpu.models.inspiral import inspiral_duration

        dur_j = float(inspiral_duration(m, mu, 12.0, 0.35)) / (m * MTSUN_SI)
        np.testing.assert_allclose(dur, dur_j, rtol=1e-6)
