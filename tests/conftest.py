"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding logic is tested on CPU via
--xla_force_host_platform_device_count (SURVEY.md §4 implication (d)); the
real-TPU path is exercised by bench.py and the driver's compile checks.

NOTE: this environment pre-imports jax in sitecustomize with
JAX_PLATFORMS=axon (the TPU tunnel), so env vars alone are too late — we must
flip the platform via jax.config before any backend is initialized.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (pre-imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
