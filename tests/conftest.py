"""Test configuration: CPU backend with 8 virtual devices (sharding tests run
without TPU hardware). The heavy lifting — escaping the sandbox's
startup-registered axon TPU backend — happens in tests/_env_bootstrap.py,
an early pytest plugin wired via addopts in pyproject.toml."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the test box has a single CPU core, so XLA
# compiles dominate wall-clock without it
# repo-local so warm compiles survive sandbox restarts (/tmp does not)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
