"""Test configuration: 8 virtual CPU devices + float64 available.

Tests run on a virtual 8-device CPU mesh (the TPU-sharding dry-run pattern)
and enable x64 so float64 oracle parity checks are exact. Library code is
dtype-explicit, so float32 paths are still exercised where tests request
them.

Note: the axon TPU plugin in this environment ignores the JAX_PLATFORMS env
var, so the platform is forced via jax.config before any computation.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
