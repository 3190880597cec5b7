"""Test harness: force an 8-device virtual CPU platform BEFORE first jax use.

Multi-chip hardware is not available in CI; sharding tests run against XLA's
host-platform device partitioning (8 virtual CPU devices). Note the TPU
tunnel's sitecustomize programmatically sets jax_platforms, so the env var
alone is not enough — we override jax.config directly before any backend
initialization.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("USE_TF", "0")  # keep transformers from importing TF
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeat suite runs skip the CPU compiles
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/fdm_tpu_xla_tests"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
