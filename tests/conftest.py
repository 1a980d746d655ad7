"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-chip sharding is exercised without TPU hardware the same way the
reference tests the multi-FPGA ring without a cluster (file-backed pipe mocks
and rank injection, ``tests/IOPipeDebugging.hpp``, SURVEY.md §4): by forcing
XLA's host platform to expose 8 devices. Must run before jax is imported.
"""

import os

# STENCILSTREAM_TEST_TPU=1 opts into the real device (for
# tests/test_tpu_hardware.py); everything else runs on the virtual CPU mesh.
_USE_TPU = os.environ.get("STENCILSTREAM_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize force-registers the TPU platform with
# priority over the JAX_PLATFORMS env var; override it at config level so
# tests really run on the 8-device CPU platform (hermetic + multi-chip).
if not _USE_TPU:
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this box has a single CPU core, so every XLA
# compile costs ~1 s; caching makes repeat test runs cheap. (Subprocesses
# spawned by CLI-parity tests inherit these via os.environ.)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
