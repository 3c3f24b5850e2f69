import os

# Must run before jax initialises: force an 8-device CPU mesh so
# distributed tests run without TPU hardware (SURVEY §4).  Hard-set, not
# setdefault: the environment pins JAX_PLATFORMS to the TPU plugin, and
# on TPU the default conv/matmul precision is bf16, which would break
# fp32 golden-parity tolerances.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize (PYTHONPATH=/root/.axon_site) imports jax
# before this file runs, so the env var alone is too late — force the
# platform through the config as well (backends aren't finalised yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound (jitted G+D
# training graphs, golden nets); cached reruns are dramatically cheaper.
_cache_dir = os.path.expanduser("~/.cache/cvvae_tpu_xla_tests")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax
    return jax.random.PRNGKey(0)
