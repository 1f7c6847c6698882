"""Numeric sanitization hooks.

The reference has no sanitizers (SURVEY.md §5.2); the idiomatic JAX
analogues of anomaly detection are the global NaN debugger and checkify.
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax


def enable_nan_checks(enabled: bool = True) -> None:
    """Global NaN debugging: every jitted computation re-runs un-jitted on a
    NaN and pinpoints the producing primitive (jax_debug_nans)."""
    jax.config.update("jax_debug_nans", enabled)


@contextlib.contextmanager
def nan_checks():
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked(fn: Callable, errors=None) -> Callable:
    """Wrap a jittable fn with checkify: returns (error, out); callers raise
    via ``error.throw()``. Covers NaN, div-by-zero and OOB indexing."""
    from jax.experimental import checkify

    errors = errors or (
        checkify.float_checks | checkify.index_checks | checkify.div_checks
    )
    return checkify.checkify(fn, errors=errors)
