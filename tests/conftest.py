"""Test harness: force an 8-device virtual CPU platform.

This is the TPU-world substitute for multi-chip tests (SURVEY.md §4): sharding
and collective code paths compile and execute against 8 XLA host devices, and
the driver separately dry-runs the multi-chip path via __graft_entry__.py.
Must run before jax initializes its backends.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config knob works.
# VTT_TESTS_ON_TPU=1 opts out, running the suite against the real chip
# (slower per-test compiles; exercises the non-interpret Pallas paths).
if os.environ.get("VTT_TESTS_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
