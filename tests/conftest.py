"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests exercise sharding/pjit paths without TPU hardware; bench.py and the
CLI tools use whatever real devices are available.
"""

import os
import subprocess
import sys
from pathlib import Path  # noqa: E402  (env setup must precede jax import)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compile cache across test runs.
_CACHE = Path(__file__).resolve().parent.parent / ".jax_cache"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_CACHE))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

# On harnesses where a sitecustomize pre-imports jax with a remote TPU
# plugin (JAX_PLATFORMS=axon), env vars alone are too late; force the
# virtual CPU mesh through the config API before any backend is used.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# The cache env vars above are likewise too late under sitecustomize (jax
# read them at its pre-import), leaving the persistent compile cache
# silently DISABLED: every geometry recompiled on every suite run
# (~9 s per program on XLA-CPU; measured 2026-08-19, the bulk of a 34-min
# suite).  The config API works after import.
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pytest

REPO = Path(__file__).resolve().parent.parent
BUILD_REF = REPO / "build-ref"
sys.path.insert(0, str(REPO))


def _ensure_oracle():
    """Build the reference C++ library + oracle harnesses if available."""
    ref = Path("/root/reference/src/lib")
    if not ref.is_dir():
        return None
    oracle = BUILD_REF / "oracle"
    if oracle.exists():
        return BUILD_REF
    BUILD_REF.mkdir(exist_ok=True)
    try:
        subprocess.run(["cmake", "-G", "Ninja", str(ref),
                        "-DCMAKE_BUILD_TYPE=Release"],
                       cwd=BUILD_REF, check=True, capture_output=True)
        subprocess.run(["ninja"], cwd=BUILD_REF, check=True, capture_output=True)
        for name in ["oracle", "oracle_tables", "oracle_huff"]:
            subprocess.run(
                ["g++", "-O2", "-std=c++11", f"-I{ref}", "-o", name,
                 str(REPO / "tests" / "oracle" / f"{name.replace('oracle', 'oracle_main', 1) if name == 'oracle' else name}.cpp"),
                 "libhimg.a", "-lpthread"],
                cwd=BUILD_REF, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return BUILD_REF


@pytest.fixture(scope="session")
def oracle_dir():
    d = _ensure_oracle()
    if d is None:
        pytest.skip("reference oracle unavailable")
    return d
