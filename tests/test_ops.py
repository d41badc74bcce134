"""Custom op tests: Pallas kernels vs XLA references (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tec_mollm_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_interpret,
    reference_attention,
)


def _qkv(b=2, t=256, h=4, d=64, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(0, 0.5, size=(b, t, h, d)).astype(dtype))
    return mk(), mk(), mk()


class TestGATStencilKernel:
    def test_matches_xla_stencil_module(self, tiny_graph):
        """Pallas fused stencil attention (interpret mode) vs the XLA GATv2Stencil."""
        from tec_mollm_tpu.models.gat import GATv2Stencil
        from tec_mollm_tpu.ops.gat_stencil import gat_stencil_attention

        rng = np.random.default_rng(0)
        h, c = 2, 11
        n = tiny_graph.num_nodes
        x = jnp.asarray(rng.normal(size=(3, n, 22)).astype(np.float32))
        shifts = tuple(int(s) for s in tiny_graph.stencil_shifts)
        valid = jnp.asarray(tiny_graph.stencil_valid)

        mod = GATv2Stencil(out_channels=c, heads=h)
        params = mod.init(jax.random.key(0), x, shifts, valid)
        expect = mod.apply(params, x, shifts, valid)

        p = params["params"]
        xl = (x @ p["lin_l"]["kernel"] + p["lin_l"]["bias"]).reshape(3, n, h, c)
        xr = (x @ p["lin_r"]["kernel"] + p["lin_r"]["bias"]).reshape(3, n, h, c)
        to_lane = lambda a: jnp.moveaxis(a, 1, -1).reshape(3, h * c, n)
        out = gat_stencil_attention(
            to_lane(xl), to_lane(xr), valid,
            jnp.asarray(p["att"]).reshape(h, c), shifts, interpret=True,
        )
        out = jnp.moveaxis(out.reshape(3, h, c, n), -1, 1).reshape(3, n, h * c)
        out = out + p["bias"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=3e-5)

    def test_non_default_slope_matches(self, tiny_graph):
        """negative_slope is a compile-time kernel constant (ADVICE r1: it was
        hard-coded 0.2, silently diverging from the XLA path for other slopes)."""
        from tec_mollm_tpu.models.gat import GATv2Stencil
        from tec_mollm_tpu.ops.gat_stencil import gat_stencil_attention

        rng = np.random.default_rng(1)
        h, c, slope = 2, 11, 0.01
        n = tiny_graph.num_nodes
        x = jnp.asarray(rng.normal(size=(2, n, 22)).astype(np.float32))
        shifts = tuple(int(s) for s in tiny_graph.stencil_shifts)
        valid = jnp.asarray(tiny_graph.stencil_valid)

        mod = GATv2Stencil(out_channels=c, heads=h, negative_slope=slope)
        params = mod.init(jax.random.key(0), x, shifts, valid)
        expect = mod.apply(params, x, shifts, valid)

        p = params["params"]
        xl = (x @ p["lin_l"]["kernel"] + p["lin_l"]["bias"]).reshape(2, n, h, c)
        xr = (x @ p["lin_r"]["kernel"] + p["lin_r"]["bias"]).reshape(2, n, h, c)
        to_lane = lambda a: jnp.moveaxis(a, 1, -1).reshape(2, h * c, n)
        out = gat_stencil_attention(
            to_lane(xl), to_lane(xr), valid,
            jnp.asarray(p["att"]).reshape(h, c), shifts,
            negative_slope=slope, interpret=True,
        )
        out = jnp.moveaxis(out.reshape(2, h, c, n), -1, 1).reshape(2, n, h * c)
        out = out + p["bias"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=3e-5)


class TestFusedMLP:
    def test_kernel_matches_reference(self):
        from tec_mollm_tpu.ops.fused_mlp import (
            fused_ln_mlp_interpret,
            reference_ln_mlp,
        )

        rng = np.random.default_rng(0)
        rows, d = 300, 64  # rows not a multiple of the 256 tile: exercises padding
        x = jnp.asarray(rng.normal(0, 0.5, size=(rows, d)).astype(np.float32))
        ln_s = jnp.asarray(rng.normal(1, 0.1, size=(d,)).astype(np.float32))
        ln_b = jnp.asarray(rng.normal(0, 0.1, size=(d,)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(0, 0.05, size=(d, 4 * d)).astype(np.float32))
        b1 = jnp.asarray(rng.normal(0, 0.05, size=(4 * d,)).astype(np.float32))
        w2 = jnp.asarray(rng.normal(0, 0.05, size=(4 * d, d)).astype(np.float32))
        b2 = jnp.asarray(rng.normal(0, 0.05, size=(d,)).astype(np.float32))
        expect = reference_ln_mlp(x, ln_s, ln_b, w1, b1, w2, b2)
        got = fused_ln_mlp_interpret(x, ln_s, ln_b, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=3e-5)

    def test_block_fused_equals_modular(self):
        """GPT2Block with use_fused_mlp (interpret) == the modular path, shared params."""
        from unittest import mock

        from tec_mollm_tpu.config import ModelConfig
        from tec_mollm_tpu.models.gpt2 import GPT2Block
        from tec_mollm_tpu.ops import fused_mlp

        cfg = ModelConfig(
            num_nodes=48, grid_h=6, grid_w=8, d_llm=64, llm_heads=4, llm_layers=1,
            lora_r=4, lora_alpha=8,
        )
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 0.5, size=(3, 4, 64)).astype(np.float32))
        plain = GPT2Block(cfg)
        params = plain.init(jax.random.key(0), x)
        expect = plain.apply(params, x)

        fused = GPT2Block(cfg, use_fused_mlp=True)
        # route the kernel through the interpreter on CPU
        with mock.patch.object(
            fused_mlp, "fused_ln_mlp", fused_mlp.fused_ln_mlp_interpret
        ):
            got = fused.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=3e-5)

    def test_gradients_match_reference(self):
        from tec_mollm_tpu.ops.fused_mlp import fused_ln_mlp_interpret, reference_ln_mlp

        rng = np.random.default_rng(2)
        d = 32
        args = [
            jnp.asarray(rng.normal(0, 0.3, size=s).astype(np.float32))
            for s in [(64, d), (d,), (d,), (d, 4 * d), (4 * d,), (4 * d, d), (d,)]
        ]

        def loss_fused(*a):
            with jax.disable_jit():
                return jnp.sum(fused_ln_mlp_interpret(*a) ** 2)

        def loss_ref(*a):
            return jnp.sum(reference_ln_mlp(*a) ** 2)

        g_f = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
        g_r = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
        for a, b in zip(g_f, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


class TestUnrolledShortAttention:
    @pytest.mark.parametrize("t", [1, 2, 3, 4, 6, 8])
    def test_matches_einsum_reference(self, t):
        """The lane-friendly unrolled short-T path (56 ms/step of the flagship
        train step was (M,H,T,T)-layout waste) must equal the einsum softmax
        attention exactly."""
        from tec_mollm_tpu.models.gpt2 import _unrolled_causal_attention

        rng = np.random.default_rng(3)
        m, h, dh = 64, 4, 16
        d = h * dh
        q, k, v = (
            jnp.asarray(rng.normal(0, 0.7, size=(m, t, d)).astype(np.float32))
            for _ in range(3)
        )
        got = _unrolled_causal_attention(q, k, v, heads=h, dropout=None)
        expect = reference_attention(
            q.reshape(m, t, h, dh), k.reshape(m, t, h, dh), v.reshape(m, t, h, dh),
            causal=True,
        ).reshape(m, t, d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-6)


class TestFlashAttention:
    @pytest.mark.parametrize("causal", [True, False])
    def test_kernel_matches_reference(self, causal):
        q, k, v = _qkv()
        expect = reference_attention(q, k, v, causal=causal)
        got = flash_attention_interpret(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-5)

    @pytest.mark.parametrize("causal", [True, False])
    def test_unaligned_seq_padding(self, causal):
        """Padded keys must be masked even when causal=False (ADVICE r1: they
        scored 0, not -inf, and absorbed softmax mass)."""
        q, k, v = _qkv(t=200)  # not a multiple of the 256 block
        expect = reference_attention(q, k, v, causal=causal)
        got = flash_attention_interpret(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-5)

    def test_short_seq_routes_to_xla(self):
        q, k, v = _qkv(t=3)
        got = flash_attention(q, k, v)  # CPU + short: reference path
        expect = reference_attention(q, k, v)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))

    def test_interpret_flag_reaches_kernel(self):
        """flash_attention(interpret=True) must run the Pallas kernel in
        interpret mode off-TPU (the flag was threaded through the custom_vjp
        but never passed to pallas_call — code-review r3)."""
        q, k, v = _qkv(t=128)
        got = flash_attention(q, k, v, causal=True, interpret=True)
        expect = reference_attention(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-5)

    def test_gradients_flow(self):
        q, k, v = _qkv(b=1, t=128, h=2, d=32)

        def loss(q, k, v):
            with jax.disable_jit():  # keep interpret mode happy
                out = flash_attention_interpret(q, k, v)
            return jnp.sum(out**2)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        def loss_ref(q, k, v):
            return jnp.sum(reference_attention(q, k, v) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)

    def test_causality(self):
        """future tokens must not affect earlier outputs."""
        q, k, v = _qkv(t=256)
        out1 = flash_attention_interpret(q, k, v, causal=True)
        k2 = k.at[:, -1].set(k[:, -1] * 100)
        v2 = v.at[:, -1].set(v[:, -1] + 50)
        out2 = flash_attention_interpret(q, k2, v2, causal=True)
        np.testing.assert_allclose(
            np.asarray(out1[:, :-1]), np.asarray(out2[:, :-1]), atol=1e-5
        )
        assert not np.allclose(out1[:, -1], out2[:, -1])


class TestFusedShortAttention:
    """One-pass Pallas short-T causal attention (ops/short_attention.py)."""

    @pytest.mark.parametrize("t", [1, 2, 3, 4])
    def test_matches_unrolled_xla(self, t):
        from tec_mollm_tpu.models.gpt2 import _unrolled_causal_attention
        from tec_mollm_tpu.ops.short_attention import fused_short_causal_attention

        rng = np.random.default_rng(11)
        m, h, dh = 70, 4, 16  # m deliberately not a sublane multiple
        d = h * dh
        q, k, v = (
            jnp.asarray(rng.normal(0, 0.7, size=(m, t, d)).astype(np.float32))
            for _ in range(3)
        )
        with jax.disable_jit():
            got = fused_short_causal_attention(q, k, v, heads=h, interpret=True)
        expect = _unrolled_causal_attention(q, k, v, heads=h, dropout=None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-6)

    def test_gradients_match_reference(self):
        from tec_mollm_tpu.ops.short_attention import fused_short_causal_attention

        rng = np.random.default_rng(12)
        m, t, h, dh = 48, 3, 4, 16
        d = h * dh
        q, k, v = (
            jnp.asarray(rng.normal(0, 0.7, size=(m, t, d)).astype(np.float32))
            for _ in range(3)
        )
        cot = jnp.asarray(rng.normal(size=(m, t, d)).astype(np.float32))

        def loss(q, k, v):
            with jax.disable_jit():
                out = fused_short_causal_attention(q, k, v, heads=h, interpret=True)
            return jnp.sum(out * cot)

        def loss_ref(q, k, v):
            out = reference_attention(
                q.reshape(m, t, h, dh), k.reshape(m, t, h, dh),
                v.reshape(m, t, h, dh), causal=True,
            ).reshape(m, t, d)
            return jnp.sum(out * cot)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)

    def test_causality(self):
        from tec_mollm_tpu.ops.short_attention import fused_short_causal_attention

        rng = np.random.default_rng(13)
        m, t, h, dh = 32, 3, 2, 16
        d = h * dh
        q, k, v = (
            jnp.asarray(rng.normal(size=(m, t, d)).astype(np.float32))
            for _ in range(3)
        )
        with jax.disable_jit():
            out1 = fused_short_causal_attention(q, k, v, heads=h, interpret=True)
            v2 = v.at[:, -1].set(v[:, -1] + 50)
            out2 = fused_short_causal_attention(q, k, v2, heads=h, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out1[:, :-1]), np.asarray(out2[:, :-1]), atol=1e-6
        )
        assert not np.allclose(out1[:, -1], out2[:, -1])

    def test_bf16_large_block(self):
        """Multi-block grid path (m > _BLOCK_M) in bf16."""
        from tec_mollm_tpu.models.gpt2 import _unrolled_causal_attention
        from tec_mollm_tpu.ops.short_attention import fused_short_causal_attention

        rng = np.random.default_rng(14)
        m, t, h, dh = 1100, 3, 2, 32
        d = h * dh
        q, k, v = (
            jnp.asarray(rng.normal(0, 0.5, size=(m, t, d)).astype(np.float32)).astype(
                jnp.bfloat16
            )
            for _ in range(3)
        )
        with jax.disable_jit():
            got = fused_short_causal_attention(q, k, v, heads=h, interpret=True)
        expect = _unrolled_causal_attention(q, k, v, heads=h, dropout=None)
        np.testing.assert_allclose(
            np.asarray(got, dtype=np.float32),
            np.asarray(expect, dtype=np.float32),
            atol=2e-2,
        )


class TestFusedShortAttentionDropout:
    """Dropout path (rate > 0) of the one-pass kernel, hermetic via the
    interpret-mode PRNG emulation (ops/short_attention._Prng): ADVICE r2 #4 —
    previously only the TPU parity script exercised rate > 0."""

    def _qkv(self, m=24, t=3, h=2, dh=8, seed=21):
        rng = np.random.default_rng(seed)
        d = h * dh
        q, k, v = (
            jnp.asarray(rng.normal(0, 0.6, size=(m, t, d)).astype(np.float32))
            for _ in range(3)
        )
        return q, k, v, h, d

    def test_forward_reproducible_and_seed_sensitive(self):
        from tec_mollm_tpu.ops.short_attention import fused_short_causal_attention

        q, k, v, h, _ = self._qkv()
        s7 = jnp.asarray([7], jnp.int32)
        s8 = jnp.asarray([8], jnp.int32)
        with jax.disable_jit():
            o1 = fused_short_causal_attention(
                q, k, v, heads=h, dropout_rate=0.3, dropout_seed=s7, interpret=True
            )
            o2 = fused_short_causal_attention(
                q, k, v, heads=h, dropout_rate=0.3, dropout_seed=s7, interpret=True
            )
            o3 = fused_short_causal_attention(
                q, k, v, heads=h, dropout_rate=0.3, dropout_seed=s8, interpret=True
            )
            o0 = fused_short_causal_attention(q, k, v, heads=h, interpret=True)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        assert not np.allclose(np.asarray(o1), np.asarray(o3))
        assert not np.allclose(np.asarray(o1), np.asarray(o0))

    def test_gradient_matches_finite_difference(self):
        """The custom VJP regenerates dropout masks in the backward; if its draw
        ORDER diverged from the forward's, the analytic gradient would disagree
        with finite differences of the (seed-deterministic) forward."""
        from tec_mollm_tpu.ops.short_attention import fused_short_causal_attention

        q, k, v, h, d = self._qkv(m=16)
        seed = jnp.asarray([3], jnp.int32)
        rng = np.random.default_rng(99)
        cot = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))

        def loss(q, k, v):
            with jax.disable_jit():
                out = fused_short_causal_attention(
                    q, k, v, heads=h, dropout_rate=0.25, dropout_seed=seed,
                    interpret=True,
                )
            return jnp.sum(out * cot)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        dirs = [
            jnp.asarray(rng.normal(size=q.shape).astype(np.float32))
            for _ in range(3)
        ]
        eps = 1e-2
        plus = loss(*(x + eps * dx for x, dx in zip((q, k, v), dirs)))
        minus = loss(*(x - eps * dx for x, dx in zip((q, k, v), dirs)))
        fd = (plus - minus) / (2 * eps)
        analytic = sum(jnp.sum(gi * di) for gi, di in zip(g, dirs))
        np.testing.assert_allclose(
            float(analytic), float(fd), rtol=2e-2, atol=1e-3
        )

    def test_rate_zero_unchanged(self):
        """rate=0 must not touch the PRNG path at all (exact match with the
        no-dropout call regardless of seed)."""
        from tec_mollm_tpu.ops.short_attention import fused_short_causal_attention

        q, k, v, h, _ = self._qkv(m=20)
        with jax.disable_jit():
            o_no = fused_short_causal_attention(q, k, v, heads=h, interpret=True)
            o_zero = fused_short_causal_attention(
                q, k, v, heads=h, dropout_rate=0.0,
                dropout_seed=jnp.asarray([5], jnp.int32), interpret=True,
            )
        np.testing.assert_array_equal(np.asarray(o_no), np.asarray(o_zero))
