"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-chip sharding is exercised without TPU hardware the same way the
reference tests the multi-FPGA ring without a cluster (file-backed pipe mocks
and rank injection, ``tests/IOPipeDebugging.hpp``, SURVEY.md §4): by forcing
XLA's host platform to expose 8 devices. Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
