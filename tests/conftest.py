"""Test configuration: run everything on a virtual 8-device CPU mesh so CI
needs no TPU.

Note: the environment's sitecustomize may import jax at interpreter startup
(before conftest), so env vars alone are too late — we also force the
platform through jax.config, which works as long as no backend has been
initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective" not in flags:
    # 8 virtual devices can share ONE physical core: the default 20s/40s
    # collective-rendezvous timeouts fire spuriously under core contention
    flags += (" --xla_cpu_collective_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags.strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: the suite compiles several full-graph
# models; reruns hit the cache instead of recompiling
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
