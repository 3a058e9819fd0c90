"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware in CI is a single chip; multi-chip sharding paths are
validated on XLA's host-platform virtual devices instead (same pattern the
driver's ``dryrun_multichip`` uses).

Note: this environment registers a TPU backend from ``sitecustomize`` at
interpreter start (jax is already imported before conftest runs), so platform
selection must go through ``jax.config``, not environment variables.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# persistent XLA compile cache: the suite is compile-dominated (big jitted
# programs, small data), so warm-cache reruns drop from ~10 min to ~3
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
