import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.ops.attention import mha_reference
from vision_transformers_tpu.ops.windows import (
    PatchMerging,
    relative_position_index,
    shift_attn_mask,
    shifted_window_attention,
    window_partition,
    window_reverse,
)


def test_window_partition_reverse_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 5))
    w = window_partition(x, 4, 4)
    assert w.shape == (2 * 2 * 3, 16, 5)
    back = window_reverse(w, 4, 4, 8, 12)
    assert jnp.array_equal(back, x)


def test_relative_position_index_center_diagonal():
    wh, ww = 4, 4
    idx = relative_position_index(wh, ww).reshape(wh * ww, wh * ww)
    center = (wh - 1) * (2 * ww - 1) + (ww - 1)
    assert np.all(np.diag(idx) == center)
    assert idx.min() >= 0
    assert idx.max() < (2 * wh - 1) * (2 * ww - 1)


def test_shift_mask_structure():
    assert shift_attn_mask(8, 8, (4, 4), (0, 0)) is None
    mask = shift_attn_mask(8, 8, (4, 4), (2, 2))
    assert mask.shape == (4, 16, 16)
    # same-region pairs are 0; distinct-region pairs are -100
    assert set(np.unique(mask)) <= {0.0, -100.0}
    # the first (unshifted-interior) window has no region boundary
    assert np.all(mask[0] == 0.0)
    # shifted windows must mask something
    assert (mask[-1] == -100.0).any()


def test_window_attention_no_shift_equals_plain_mha():
    """One window covering the whole map + zero bias == vanilla attention."""
    b, h, w, c, heads = 2, 4, 4, 16, 2
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (b, h, w, c))
    qkv_k = jax.random.normal(ks[1], (c, 3 * c)) * 0.1
    proj_k = jax.random.normal(ks[2], (c, c)) * 0.1
    zero_bias = jnp.zeros((heads, h * w, h * w))

    out = shifted_window_attention(
        x, qkv_k, None, proj_k, None, zero_bias,
        window_size=(h, w), num_heads=heads, shift_size=(0, 0),
    )

    tokens = x.reshape(b, h * w, c)
    qkv = (tokens @ qkv_k).reshape(b, h * w, 3, heads, c // heads)
    qkv = qkv.transpose(2, 0, 3, 1, 4)
    ref = mha_reference(qkv[0], qkv[1], qkv[2])
    ref = ref.transpose(0, 2, 1, 3).reshape(b, h * w, c) @ proj_k
    np.testing.assert_allclose(
        np.asarray(out.reshape(b, h * w, c)), np.asarray(ref), atol=1e-5
    )


def test_shifted_window_attention_shift_changes_output_but_keeps_shape():
    b, h, w, c, heads = 1, 8, 8, 8, 2
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (b, h, w, c))
    qkv_k = jax.random.normal(ks[1], (c, 3 * c)) * 0.1
    proj_k = jax.random.normal(ks[2], (c, c)) * 0.1
    bias = jnp.zeros((heads, 16, 16))
    out0 = shifted_window_attention(
        x, qkv_k, None, proj_k, None, bias, (4, 4), heads, (0, 0))
    out1 = shifted_window_attention(
        x, qkv_k, None, proj_k, None, bias, (4, 4), heads, (2, 2))
    assert out0.shape == out1.shape == x.shape
    assert not jnp.allclose(out0, out1)


def test_window_padding_for_indivisible_maps():
    b, h, w, c, heads = 1, 6, 6, 8, 2
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (b, h, w, c))
    qkv_k = jax.random.normal(ks[1], (c, 3 * c)) * 0.1
    proj_k = jax.random.normal(ks[2], (c, c)) * 0.1
    bias = jnp.zeros((heads, 16, 16))
    out = shifted_window_attention(
        x, qkv_k, None, proj_k, None, bias, (4, 4), heads, (2, 2))
    assert out.shape == x.shape


def test_patch_merging_shapes_and_s2d_order():
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    m = PatchMerging()
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 2, 2, 6)  # H/2, W/2, 2C


class TestPackPathGlue:
    """ADVICE r2: force the multi-window pack kernel (interpret mode on CPU)
    through the FULL shifted_window_attention glue — combined bias
    construction/ordering, packed-layout cosine folding — and check it
    against the split-head fallback path."""

    def _run(self, force_pack, shift, logit_scale=None, heads=2):
        import vision_transformers_tpu.ops.windows as W

        # dh = c/heads = 4 → p = 32; g = b·nW must be divisible by p and,
        # for the shifted case, nW (=4) must divide into bias packing
        b, h, w, c = 8, 8, 8, heads * 4
        win, n = (4, 4), 16
        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        x = jax.random.normal(ks[0], (b, h, w, c))
        qkv_k = jax.random.normal(ks[1], (c, 3 * c)) * 0.1
        proj_k = jax.random.normal(ks[2], (c, c)) * 0.1
        rel = jax.random.normal(ks[3], (heads, n, n)) * 0.05
        old = W.FORCE_PACK_PATH
        W.FORCE_PACK_PATH = force_pack
        try:
            return shifted_window_attention(
                x, qkv_k, None, proj_k, None, rel,
                window_size=win, num_heads=heads, shift_size=shift,
                logit_scale=logit_scale,
            )
        finally:
            W.FORCE_PACK_PATH = old

    def test_pack_matches_fallback_no_shift(self):
        a = self._run(True, (0, 0))
        b = self._run(False, (0, 0))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    def test_pack_matches_fallback_shifted(self):
        a = self._run(True, (2, 2))
        b = self._run(False, (2, 2))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    def test_pack_matches_fallback_cosine_v2(self):
        ls = jnp.full((2, 1, 1), jnp.log(10.0))
        a = self._run(True, (2, 2), logit_scale=ls)
        b = self._run(False, (2, 2), logit_scale=ls)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    def test_dropout_warns_and_falls_back(self):
        import warnings
        import vision_transformers_tpu.ops.windows as W

        W._pack_dropout_warned = False
        old = W.FORCE_PACK_PATH
        W.FORCE_PACK_PATH = True
        try:
            b, h, w, c = 8, 8, 8, 8
            ks = jax.random.split(jax.random.PRNGKey(3), 3)
            x = jax.random.normal(ks[0], (b, h, w, c))
            qkv_k = jax.random.normal(ks[1], (c, 3 * c)) * 0.1
            proj_k = jax.random.normal(ks[2], (c, c)) * 0.1
            with warnings.catch_warnings(record=True) as rec:
                warnings.simplefilter("always")
                shifted_window_attention(
                    x, qkv_k, None, proj_k, None, None,
                    window_size=(4, 4), num_heads=2, shift_size=(0, 0),
                    attention_dropout=0.5, deterministic=False,
                    dropout_rng=jax.random.PRNGKey(0),
                )
            assert any("pack kernel" in str(r.message) for r in rec)
        finally:
            W.FORCE_PACK_PATH = old


class TestFusedWindowKernel:
    """The fused NHWC window kernel (roll+partition+attention+reverse+
    unroll folded into one Pallas program, flash_attention.py
    _window_fused_kernel) must match the partition-based fallback through
    the FULL shifted_window_attention glue — including the lane-padded
    q/k/v weight sections (c=8 heads·dh → sec=128) and the in-kernel
    cyclic shift with its wraparound DMA."""

    def _run(self, force_fused, shift, logit_scale=None, heads=2,
             hw=(8, 8), mask_padding=False, dropout_rng=None,
             win=(4, 4)):
        import vision_transformers_tpu.ops.windows as W

        # dh = 32 -> pack width p = 4; nw = w//4 windows per row, so
        # bb=2 images/slab satisfies (bb*nw) % p == 0 at these sizes
        b, (h, w), c = 4, hw, heads * 32
        n = win[0] * win[1]
        ks = jax.random.split(jax.random.PRNGKey(11), 4)
        x = jax.random.normal(ks[0], (b, h, w, c))
        qkv_k = jax.random.normal(ks[1], (c, 3 * c)) * 0.1
        proj_k = jax.random.normal(ks[2], (c, c)) * 0.1
        rel = jax.random.normal(ks[3], (heads, n, n)) * 0.05
        old_f, old_p = W.FORCE_FUSED_WINDOW, W.FORCE_PACK_PATH
        W.FORCE_FUSED_WINDOW = force_fused
        W.FORCE_PACK_PATH = not force_fused
        try:
            return shifted_window_attention(
                x, qkv_k, None, proj_k, None, rel,
                window_size=win, num_heads=heads, shift_size=shift,
                logit_scale=logit_scale, mask_padding=mask_padding,
            )
        finally:
            W.FORCE_FUSED_WINDOW, W.FORCE_PACK_PATH = old_f, old_p

    def _check(self, **kw):
        a = self._run(True, **kw)
        b = self._run(False, **kw)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    def test_fused_matches_fallback_no_shift(self):
        self._check(shift=(0, 0))

    def test_fused_matches_fallback_shifted(self):
        self._check(shift=(2, 2))

    def test_fused_matches_fallback_cosine_v2(self):
        ls = jnp.full((2, 1, 1), jnp.log(10.0))
        self._check(shift=(2, 2), logit_scale=ls)

    def test_fused_matches_fallback_nonsquare(self):
        self._check(shift=(2, 2), hw=(8, 16))

    def test_fused_matches_fallback_padded_input(self):
        # 7x7 input pads to 8x8; with mask_padding the per-window pad
        # mask rides the packed bias (Twins LSA semantics)
        self._check(shift=(2, 2), hw=(7, 7), mask_padding=True)

    def test_fused_engages(self):
        import vision_transformers_tpu.ops.windows as W

        calls = []
        orig = W.fused_window_attention

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        W.fused_window_attention = spy
        try:
            self._run(True, (2, 2))
        finally:
            W.fused_window_attention = orig
        assert calls, "fused path did not engage under FORCE_FUSED_WINDOW"

    def test_fused_gradients_match_fallback(self):
        import vision_transformers_tpu.ops.windows as W

        heads, c = 2, 64
        n = 16
        ks = jax.random.split(jax.random.PRNGKey(13), 4)
        x = jax.random.normal(ks[0], (4, 8, 8, c))
        qkv_k = jax.random.normal(ks[1], (c, 3 * c)) * 0.1
        proj_k = jax.random.normal(ks[2], (c, c)) * 0.1
        rel = jax.random.normal(ks[3], (heads, n, n)) * 0.05

        def loss(qk, pk, rb, fused):
            old_f, old_p = W.FORCE_FUSED_WINDOW, W.FORCE_PACK_PATH
            W.FORCE_FUSED_WINDOW, W.FORCE_PACK_PATH = fused, not fused
            try:
                out = shifted_window_attention(
                    x, qk, None, pk, None, rb, window_size=(4, 4),
                    num_heads=heads, shift_size=(2, 2))
            finally:
                W.FORCE_FUSED_WINDOW, W.FORCE_PACK_PATH = old_f, old_p
            return jnp.sum(jnp.sin(out))

        gf = jax.grad(loss, (0, 1, 2))(qkv_k, proj_k, rel, True)
        gr = jax.grad(loss, (0, 1, 2))(qkv_k, proj_k, rel, False)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-5, atol=5e-5)


class TestFlatFusedWindowKernel(TestFusedWindowKernel):
    """The FLAT fused variant (whole images per program on the flat
    (B·Hp·Wp, 3·sec) view, _window_fused_flat_kernel) serves the widths
    the slab DMA can't slice — Swin-T stages 2-4 have Wp ∈ {28, 14, 7},
    all % 8 != 0. Same module-level contract as the slab kernel.

    Comparisons run under highest matmul precision: jax-0.9 CPU default
    rounds fp32 matmul inputs to bf16, and the flat kernel's packed
    block-diagonal contraction rounds differently from the fallback's
    per-window einsum — both correct, but up to ~2e-3 apart at default
    precision (receipts: benchmarks/logs/window_fused.log)."""

    def _check(self, **kw):
        from vision_transformers_tpu.ops.flash_attention import (
            window_fused_flat_plan, window_fused_plan)

        # geometry must actually route to the flat variant (plans see the
        # window-padded dims)
        heads = kw.get("heads", 2)
        h, w = kw.get("hw", (28, 28))
        win = kw.get("win", (4, 4))
        ph = -(-h // win[0]) * win[0]
        pw = -(-w // win[1]) * win[1]
        assert window_fused_plan(4, ph, pw, win[0], win[1], heads, 32,
                                 1, 4) is None, "slab plan unexpectedly fits"
        assert window_fused_flat_plan(4, ph, pw, win[0], win[1], heads, 32,
                                      1, 4) is not None, "no flat plan"
        with jax.default_matmul_precision("highest"):
            a = self._run(True, **kw)
            b = self._run(False, **kw)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    def test_fused_matches_fallback_no_shift(self):
        self._check(shift=(0, 0), hw=(28, 28), win=(7, 7))

    def test_fused_matches_fallback_shifted(self):
        self._check(shift=(3, 3), hw=(28, 28), win=(7, 7))

    def test_fused_matches_fallback_cosine_v2(self):
        ls = jnp.full((2, 1, 1), jnp.log(10.0))
        self._check(shift=(3, 3), hw=(28, 28), win=(7, 7), logit_scale=ls)

    def test_fused_matches_fallback_nonsquare(self):
        self._check(shift=(3, 3), hw=(28, 14), win=(7, 7))

    def test_fused_matches_fallback_padded_input(self):
        # 27x27 pads to 28x28; per-window pad mask rides the packed bias
        self._check(shift=(3, 3), hw=(27, 27), win=(7, 7),
                    mask_padding=True)

    def test_fused_matches_fallback_window7(self):
        # Swin's native 7x7 window at the stage-3 map size
        self._check(shift=(3, 3), hw=(14, 14), win=(7, 7), heads=4)

    def test_fused_engages(self):
        import vision_transformers_tpu.ops.windows as W

        calls = []
        orig = W.window_fused_flat_plan

        def spy(*a, **k):
            out = orig(*a, **k)
            calls.append(out)
            return out

        W.window_fused_flat_plan = spy
        try:
            self._run(True, (3, 3), hw=(28, 28), win=(7, 7))
        finally:
            W.window_fused_flat_plan = orig
        assert calls and calls[0] is not None, (
            "flat fused path did not engage at Wp % 8 != 0")

    def test_fused_gradients_match_fallback(self):
        import vision_transformers_tpu.ops.windows as W

        heads, c = 2, 64
        n = 49
        ks = jax.random.split(jax.random.PRNGKey(13), 4)
        x = jax.random.normal(ks[0], (4, 14, 14, c))
        qkv_k = jax.random.normal(ks[1], (c, 3 * c)) * 0.1
        proj_k = jax.random.normal(ks[2], (c, c)) * 0.1
        rel = jax.random.normal(ks[3], (heads, n, n)) * 0.05

        def loss(qk, pk, rb, fused):
            old_f, old_p = W.FORCE_FUSED_WINDOW, W.FORCE_PACK_PATH
            W.FORCE_FUSED_WINDOW, W.FORCE_PACK_PATH = fused, not fused
            try:
                out = shifted_window_attention(
                    x, qk, None, pk, None, rb, window_size=(7, 7),
                    num_heads=heads, shift_size=(3, 3))
            finally:
                W.FORCE_FUSED_WINDOW, W.FORCE_PACK_PATH = old_f, old_p
            return jnp.sum(jnp.sin(out))

        with jax.default_matmul_precision("highest"):
            gf = jax.grad(loss, (0, 1, 2))(qkv_k, proj_k, rel, True)
            gr = jax.grad(loss, (0, 1, 2))(qkv_k, proj_k, rel, False)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-5, atol=5e-5)


class TestCosineRouting:
    """SwinV2 cosine attention defaults to the pack path: chip receipts
    (benchmarks/window_fused_flat_r04.json fused=0.649x; hier_bench_r04
    vs r04c: 48.5 -> 66.5 ms full-model) — guard the routing decision."""

    def _run(self, logit_scale):
        heads, c = 2, 64
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        x = jax.random.normal(ks[0], (2, 14, 14, c))
        qkv_k = jax.random.normal(ks[1], (c, 3 * c)) * 0.1
        proj_k = jax.random.normal(ks[2], (c, c)) * 0.1
        return shifted_window_attention(
            x, qkv_k, None, proj_k, None, None, window_size=(7, 7),
            num_heads=heads, shift_size=(0, 0), logit_scale=logit_scale)

    def test_cosine_routes_to_pack_on_tpu_default(self, monkeypatch):
        import vision_transformers_tpu.ops.windows as W

        class FusedTaken(Exception):
            pass

        def spy(*a, **k):  # the kernel can't lower on CPU; just signal
            raise FusedTaken

        class FakeJax:  # fake the backend ONLY inside windows.py — the
            def __getattr__(self, k):  # kernels' interpret-mode check
                return getattr(jax, k)  # must keep seeing the real CPU

            @staticmethod
            def default_backend():
                return "tpu"

        # pin the routing globals for this test's scope (another test
        # leaking FORCE_FUSED_WINDOW must not flip the assertion below),
        # and monkeypatch auto-restores everything on exit
        monkeypatch.setattr(W, "FORCE_FUSED_WINDOW", None)
        monkeypatch.setattr(W, "FORCE_PACK_PATH", False)
        monkeypatch.setattr(W, "fused_window_attention", spy)
        # the pack kernel can't lower on CPU either once the backend says
        # tpu-routed shapes qualify; stub it with the oracle shape
        monkeypatch.setattr(
            W, "window_packed_attention",
            lambda qkv, bias, heads, *a, **k: qkv[..., : qkv.shape[-1] // 3])
        monkeypatch.setattr(W, "jax", FakeJax())
        self._run(jnp.zeros((2, 1, 1)))  # cosine: must NOT fuse
        try:
            self._run(None)  # dot-product: must fuse
            raise AssertionError(
                "dot-product path skipped the fused kernel")
        except FusedTaken:
            pass


class TestWindowPackBackward:
    """The r5 Pallas backward twin of the multi-window pack kernel: grads
    (dqkv AND dbias) must match jax.vjp through the split-head jnp
    reference it replaced, for every bias periodicity the plan emits
    (shared tile, per-window tiles, lcm-periodic tiles, no bias)."""

    def _check(self, g, n, heads, dh, nwp, dtype=jnp.float32, tol=2e-3):
        import vision_transformers_tpu.ops.flash_attention as FA

        rng = np.random.RandomState(0)
        hd = heads * dh
        qkv = jnp.asarray(rng.randn(g, n, 3 * hd) * 0.5, dtype)
        bias = (None if nwp == 0 else
                jnp.asarray(rng.randn(nwp, heads, n, n) * 0.5, jnp.float32))
        do = jnp.asarray(rng.randn(g, n, hd) * 0.5, dtype)
        scale = 1.0 / dh ** 0.5
        plan = FA.window_pack_plan(g, n, heads, dh, max(nwp, 1),
                                   qkv.dtype.itemsize)
        assert plan is not None
        assert FA._window_pack_bwd_gblk(
            g, n, heads, dh, max(nwp, 1), qkv.dtype.itemsize) is not None

        if bias is None:
            f = lambda a: FA._window_pack(a, None, heads, scale, *plan)
            fr = lambda a: FA._window_pack_ref(a, None, heads, scale)
            _, vjp = jax.vjp(f, qkv)
            (dq,), db = vjp(do), None
            _, vjpr = jax.vjp(fr, qkv)
            (dqr,), dbr = vjpr(do), None
        else:
            f = lambda a, b: FA._window_pack(a, b, heads, scale, *plan)
            fr = lambda a, b: FA._window_pack_ref(
                a, b.astype(a.dtype), heads, scale)
            _, vjp = jax.vjp(f, qkv, bias)
            dq, db = vjp(do)
            _, vjpr = jax.vjp(fr, qkv, bias)
            dqr, dbr = vjpr(do)
        np.testing.assert_allclose(
            np.asarray(dq, np.float32), np.asarray(dqr, np.float32),
            atol=tol)
        if bias is not None:
            np.testing.assert_allclose(
                np.asarray(db), np.asarray(dbr), atol=tol * 10)

    def test_shared_bias_tile(self):
        self._check(16, 16, 2, 32, 1)

    def test_per_window_bias_tiles(self):
        self._check(16, 16, 2, 32, 4)

    def test_no_bias(self):
        self._check(16, 16, 2, 32, 0)

    def test_pack_width_two(self):
        self._check(8, 16, 3, 64, 2)

    def test_lcm_periodic_bias(self):
        # nwp=6 with p=4: tile period lcm(6,4)/4 = 3 packs
        self._check(24, 16, 2, 32, 6)

    def test_bf16(self):
        self._check(16, 16, 2, 32, 4, jnp.bfloat16, 5e-2)


class TestWindowBatchedKernel:
    """r5 'batched32' per-head kernel: output and grads must match the
    split-head reference; backward is shared with the pack kernel."""

    def _check(self, g, n, heads, dh, nwp, blk, dtype=jnp.float32,
               tol=2e-3):
        import vision_transformers_tpu.ops.flash_attention as FA

        rng = np.random.RandomState(7)
        hd = heads * dh
        qkv = jnp.asarray(rng.randn(g, n, 3 * hd) * 0.5, dtype)
        bias = (None if nwp == 0 else
                jnp.asarray(rng.randn(nwp, heads, n, n) * 0.5, jnp.float32))
        do = jnp.asarray(rng.randn(g, n, hd) * 0.5, dtype)
        scale = 1.0 / dh ** 0.5

        f = lambda a, b: FA._window_batched(a, b, heads, scale, blk)
        fr = lambda a, b: FA._window_pack_ref(
            a, (None if b is None else b.astype(a.dtype)), heads, scale)
        if bias is None:
            out, vjp = jax.vjp(lambda a: f(a, None), qkv)
            (dq,), db = vjp(do), None
            outr, vjpr = jax.vjp(lambda a: fr(a, None), qkv)
            (dqr,), dbr = vjpr(do), None
        else:
            out, vjp = jax.vjp(f, qkv, bias)
            dq, db = vjp(do)
            outr, vjpr = jax.vjp(fr, qkv, bias)
            dqr, dbr = vjpr(do)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(outr, np.float32),
            atol=tol)
        np.testing.assert_allclose(
            np.asarray(dq, np.float32), np.asarray(dqr, np.float32),
            atol=tol)
        if bias is not None:
            np.testing.assert_allclose(
                np.asarray(db), np.asarray(dbr), atol=tol * 10)

    def test_shared_bias(self):
        self._check(16, 16, 2, 32, 1, blk=8)

    def test_per_window_bias_modulo(self):
        self._check(32, 16, 2, 32, 16, blk=8)

    def test_no_bias(self):
        self._check(16, 16, 2, 32, 0, blk=8)

    def test_bf16(self):
        self._check(16, 16, 2, 32, 1, blk=8, dtype=jnp.bfloat16, tol=5e-2)

    def test_plan_and_routing_rule(self):
        import vision_transformers_tpu.ops.flash_attention as FA
        import vision_transformers_tpu.ops.windows as W

        # Swin-T @224 batch-128 stage shapes: plan must exist where the
        # receipts say the kernel wins (unshifted s1/s2/s4)
        assert FA.window_batched_plan(128 * 64, 49, 3, 32, 1, 2) is not None
        assert FA.window_batched_plan(128 * 16, 49, 6, 32, 1, 2) is not None
        assert FA.window_batched_plan(128, 49, 24, 32, 1, 2) is not None
        # receipts rule: unshifted yes, except the n_win in [2, 8] regime;
        # shifted (nwp > 1) no
        real = jax.default_backend
        try:
            jax.default_backend = lambda: "tpu"
            assert W._batched_preferred(64, 1, 0.0)
            assert W._batched_preferred(1, 1, 0.0)
            assert not W._batched_preferred(4, 1, 0.0)
            assert not W._batched_preferred(64, 64, 0.0)
            assert not W._batched_preferred(64, 1, 0.1)
        finally:
            jax.default_backend = real
