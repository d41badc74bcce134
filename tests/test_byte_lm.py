"""Surrogate pretraining stack: ByteLM training sanity + HF-format export ->
hf_import roundtrip parity (VERDICT r2 missing #1)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tec_mollm_tpu.config import ModelConfig
from tec_mollm_tpu.models.byte_lm import (
    ByteLM,
    byte_batches,
    gather_text_corpus,
    next_byte_loss,
    pretrain_model_config,
)
from tec_mollm_tpu.models.hf_export import (
    backbone_params_to_state_dict,
    save_hf_checkpoint,
)


def _tiny_lm_cfg(**kw) -> ModelConfig:
    return pretrain_model_config(
        ModelConfig(d_llm=32, llm_heads=4, llm_layers=2, **kw)
    )


class TestByteLM:
    def test_forward_shapes_and_loss(self):
        cfg = _tiny_lm_cfg()
        model = ByteLM(cfg)
        tokens = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, size=(2, 17)), jnp.int32
        )
        params = model.init(jax.random.key(0), tokens)["params"]
        logits = model.apply({"params": params}, tokens)
        assert logits.shape == (2, 17, 256)
        loss = next_byte_loss(logits, tokens)
        # random init ~ uniform over 256 bytes
        assert float(loss) == pytest.approx(np.log(256), rel=0.15)

    def test_learns_repetitive_corpus(self):
        """A few SGD steps on a trivially predictable byte stream must cut the
        loss well below uniform — the pretraining loop is sound."""
        import optax

        cfg = _tiny_lm_cfg()
        model = ByteLM(cfg)
        corpus = b"the quick brown fox jumps over the lazy dog. " * 600
        batches, val = byte_batches(corpus, batch_size=8, seq_len=24, seed=1)
        params = model.init(
            jax.random.key(1), jnp.asarray(next(batches))
        )["params"]
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, tokens):
            loss, g = jax.value_and_grad(
                lambda p: next_byte_loss(
                    model.apply({"params": p}, tokens), tokens
                )
            )(params)
            u, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, u), opt, loss

        first = None
        for i in range(60):
            params, opt, loss = step(params, opt, jnp.asarray(next(batches)))
            if first is None:
                first = float(loss)
        val_loss = float(
            next_byte_loss(
                model.apply({"params": params}, jnp.asarray(val)), jnp.asarray(val)
            )
        )
        assert first == pytest.approx(np.log(256), rel=0.2)
        assert val_loss < 2.0  # far below the 5.55-nat uniform baseline

    def test_gather_text_corpus(self, tmp_path):
        (tmp_path / "a.py").write_text("alpha " * 100)
        (tmp_path / "b.md").write_text("beta " * 100)
        (tmp_path / "skip.bin").write_bytes(b"\x00" * 100)
        corpus = gather_text_corpus([str(tmp_path)])
        assert b"alpha" in corpus and b"beta" in corpus and b"\x00" not in corpus


class TestExportImportRoundtrip:
    def test_hf_format_roundtrip_into_lora_backbone(self, tmp_path):
        """Export a (tiny) pretrained backbone the HF way, pull it back through
        the REAL import path (hf_import, as train.py --gpt2-checkpoint does)
        into a LoRA-enabled downstream backbone, and check exact weight
        transfer + forward parity (LoRA starts as identity: lora_B = 0)."""
        from tec_mollm_tpu.models.gpt2 import GPT2Backbone
        from tec_mollm_tpu.models.hf_import import (
            gpt2_state_dict_to_params,
            load_torch_checkpoint,
            merge_gpt2_params,
        )

        lm_cfg = _tiny_lm_cfg()
        model = ByteLM(lm_cfg)
        tokens = jnp.asarray(
            np.random.default_rng(3).integers(0, 256, size=(2, 9)), jnp.int32
        )
        params = model.init(jax.random.key(2), tokens)["params"]

        sd = backbone_params_to_state_dict(
            jax.device_get(params["backbone"]), lm_cfg.llm_layers,
            wte=np.asarray(params["wte"]),
        )
        out_dir = str(tmp_path / "surrogate")
        save_hf_checkpoint(sd, out_dir, meta={"surrogate": "test"})

        # the downstream model has LoRA adapters (reference r=32 policy)
        down_cfg = dataclasses.replace(
            lm_cfg, lora_r=4, lora_alpha=8.0, lora_dropout=0.1
        )
        backbone = GPT2Backbone(down_cfg)
        embeds = jnp.asarray(
            np.random.default_rng(4).normal(size=(3, 5, lm_cfg.d_llm)), jnp.float32
        )
        init = backbone.init(jax.random.key(7), embeds)["params"]
        loaded = load_torch_checkpoint(out_dir)
        merged = merge_gpt2_params(
            dict(init), gpt2_state_dict_to_params(loaded, down_cfg)
        )

        # pretrained leaves transferred exactly
        np.testing.assert_array_equal(
            merged["wpe"], np.asarray(params["backbone"]["wpe"])
        )
        np.testing.assert_array_equal(
            merged["h_0"]["attn"]["c_attn"]["kernel"],
            np.asarray(params["backbone"]["h_0"]["attn"]["c_attn"]["kernel"]),
        )
        # LoRA adapters keep their fresh init (checkpoint has none)
        np.testing.assert_array_equal(
            merged["h_0"]["attn"]["c_attn"]["lora_B"],
            np.asarray(init["h_0"]["attn"]["c_attn"]["lora_B"]),
        )

        # forward parity: fresh LoRA (B=0) is the identity adapter
        h_surrogate = GPT2Backbone(lm_cfg).apply(
            {"params": params["backbone"]}, embeds
        )
        h_down = backbone.apply({"params": merged}, embeds)
        np.testing.assert_allclose(
            np.asarray(h_down), np.asarray(h_surrogate), atol=1e-6
        )
