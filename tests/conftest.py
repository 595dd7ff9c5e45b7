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


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    Round-2 finding: a single-process run of the whole suite segfaulted
    inside XLA CPU compilation (jax/_src/compiler.py backend_compile_and_
    load) after ~150 jit programs — compiler memory growth across
    hundreds of live executables. Bounding the live-cache to one module
    keeps the process healthy; within-module caching (the hot path for
    parametrized tests) is unaffected.
    """
    yield
    import jax as _jax

    _jax.clear_caches()
