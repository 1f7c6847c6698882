"""Run a benchmark script pinned to the CPU backend (smoke-testing).

The axon TPU plugin ignores the ``JAX_PLATFORMS`` env var — a wedged
tunnel then hangs backend *initialization* itself (the round-3 failure
mode). Only the config knob set before first backend touch reliably pins
CPU (same trick as tests/conftest.py and ``bench.py --inner``).

Usage: python benchmarks/_cpu_run.py <script.py> [args...]
"""

import runpy
import sys

import jax

jax.config.update("jax_platforms", "cpu")

if __name__ == "__main__":
    target = sys.argv[1]
    sys.argv = sys.argv[1:]
    runpy.run_path(target, run_name="__main__")
