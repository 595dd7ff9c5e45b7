"""Test config: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual device mesh (the real
environment has a single TPU chip); renders in tests are small enough for CPU.
A pytest plugin may import jax before this conftest runs, so we use
jax.config.update (effective until backend initialization) rather than env
vars alone.
"""
import os

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

assert jax.device_count() == 8, (
    "expected 8 virtual CPU devices; jax backend was initialized before "
    "conftest could reconfigure it"
)
