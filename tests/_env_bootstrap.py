"""Early pytest plugin (loaded via addopts `-p tests._env_bootstrap`, i.e.
before pytest's fd capture starts): if the sandbox's axon TPU backend would
hijack JAX (PALLAS_AXON_POOL_IPS), re-exec the test process with a scrubbed
environment so tests run on 8 virtual CPU devices."""
import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]],
              env)
