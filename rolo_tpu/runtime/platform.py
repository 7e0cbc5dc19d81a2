"""Platform plumbing shared by the CLI, bench, and tools.

Two environment quirks this handles (see tests/conftest.py and
.claude-era driver notes):
  - a sitecustomize may force-register a remote TPU backend and rewrite the
    jax_platforms *config*, silently overriding an explicit
    JAX_PLATFORMS=cpu request — `pin_requested_platform` restores the
    user's choice;
  - first-compile latency dominates short runs (the raycast simulator,
    featurizer, and registration programs take minutes to build) —
    `enable_compilation_cache` turns on JAX's persistent cache so repeat
    invocations (bench reruns, CI, the driver) skip compilation entirely.
"""

from __future__ import annotations

import os


def pin_requested_platform() -> None:
    """Honor an explicit JAX_PLATFORMS env request even when a plugin
    rewrote the config after import."""
    import jax

    req = os.environ.get("JAX_PLATFORMS", "")
    if req and "axon" not in req:
        jax.config.update("jax_platforms", req)


def _host_fingerprint() -> str:
    """Short fingerprint of the host CPU feature set. XLA:CPU persists
    AOT-compiled executables whose cache key does NOT include the precise
    CPU feature flags; loading an entry produced on a host with a
    different avx512/amx set can SIGILL/segfault (cpu_aot_loader warns
    'could lead to execution errors such as SIGILL' — observed as a
    deterministic segfault in compilation_cache.get_executable_and_time
    when a cache dir was reused across machines). Scoping the cache dir
    by this fingerprint makes cross-machine reuse impossible."""
    import hashlib
    import platform as _platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{_platform.machine()}|{flags}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str = None) -> str:
    """Enable the persistent compilation cache (idempotent). Returns the
    cache directory used (host-fingerprint scoped, see _host_fingerprint)."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache",
            f"rolo_tpu_jax_{_host_fingerprint()}",
        ),
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything regardless of compile time / program size
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these knobs
    return cache_dir


def bench_metadata() -> dict:
    """Machine/provenance stamp for every bench JSON (ADVICE round-2:
    rows from different hosts/devices were indistinguishable). Includes
    the git SHA of the working tree at run time."""
    import platform as _plat
    import subprocess

    import jax

    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ).stdout.strip() or None
    except Exception:
        sha = None
    dev = jax.devices()[0]
    return {
        "platform": dev.platform,
        "device": getattr(dev, "device_kind", str(dev)),
        "n_devices": jax.device_count(),
        "jax_version": jax.__version__,
        "host": _plat.node() or "unknown",
        "git_sha": sha,
    }
