"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware.

NOTE: this environment's sitecustomize.py force-registers the remote `axon`
TPU backend and rewrites jax_platforms to "axon,cpu" in every process, which
silently routes eager ops over a network tunnel (~100x slowdown). Overriding
the *config* (not just the env var) after import is required to pin tests to
local CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (XLA:CPU
# builds of the backend/registration programs take minutes); warm-cache
# reruns skip all of it. Keyed by HLO hash, so stale entries are inert.
from rolo_tpu.runtime.platform import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
