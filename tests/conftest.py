"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware in CI is a single chip; multi-chip sharding paths are
validated on XLA's host-platform virtual devices instead (same pattern the
driver's ``dryrun_multichip`` uses).

Note: this environment registers a TPU backend from ``sitecustomize`` at
interpreter start (jax is already imported before conftest runs), so platform
selection must go through ``jax.config``, not environment variables.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
