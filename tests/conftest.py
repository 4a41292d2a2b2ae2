"""Test config: force CPU JAX with a virtual 8-device mesh so data-parallel
sharding is testable without TPU hardware (the driver benches on the real
chip separately)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))  # for tests.oracle imports

import pytest  # noqa: E402


def _force_cpu_and_cache():
    import jax

    # The axon TPU plugin force-registers itself over JAX_PLATFORMS env; the
    # config knob below is the reliable way to pin tests to the virtual
    # 8-device CPU mesh (and keeps the single real TPU free for benches).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_force_cpu_and_cache()


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def tmp_root(tmp_path_factory):
    return tmp_path_factory.mktemp("syt")
