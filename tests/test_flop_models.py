"""The hierarchical-model MFU denominators are validated numbers, not
folklore: each family's analytic per-stage MAC model (benchmarks/
hier_bench.py) must be a tight LOWER bound on XLA's own cost analysis of
the compiled forward — equal up to the elementwise work (softmax, LN,
GELU, the SwinV2 cosine/CPB extras) that MFU accounting conventionally
excludes.

Run at each model's native 224px: every feature-map grid divides the
window size there, so no padding inflates XLA's count (at e.g. 128px the
32->35 window pad makes the comparison unfair by design, not by error).
"""

import os
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "benchmarks"))

import hier_bench as hb  # noqa: E402

pytestmark = pytest.mark.slow  # full-model / multi-device integration tier


def _xla_flops(model, image):
    x = jnp.zeros((1, image, image, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    compiled = jax.jit(lambda p, v: model.apply(p, v)).lower(params, x).compile()
    ca = compiled.cost_analysis()
    return (ca[0] if isinstance(ca, (list, tuple)) else ca)["flops"]


@pytest.mark.parametrize(
    "name,max_ratio",
    [
        ("swint_224", 1.10),
        ("swinv2t_224", 1.20),  # cosine norms + CPB MLP + sigmoid extras
        ("pvt_tiny224", 1.12),
        ("twins_svts224", 1.12),
    ],
)
def test_analytic_flops_lower_bound_xla(name, max_ratio):
    model, args = hb.build(name)
    image = args.get("image_size") or args.get("img_size")
    analytic = 2 * sum(hb.stage_macs_for(name, args))
    xla = _xla_flops(model, image)
    ratio = xla / analytic
    assert 1.0 <= ratio <= max_ratio, (
        f"{name}: analytic {analytic/1e9:.2f} GF vs XLA {xla/1e9:.2f} GF "
        f"(ratio {ratio:.3f})")
