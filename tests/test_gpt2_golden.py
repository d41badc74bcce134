"""Golden parity tests: our Flax GPT-2 backbone vs HuggingFace transformers (torch CPU),
including peft-LoRA on c_attn — the reference's exact backbone construction
(modules.py:156-209). Uses a small random-initialized GPT-2 config (no downloads)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tec_mollm_tpu.config import ModelConfig
from tec_mollm_tpu.models.gpt2 import GPT2Backbone
from tec_mollm_tpu.models.hf_import import (
    gpt2_state_dict_to_params,
    load_gpt2_into_model_params,
    merge_gpt2_params,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def small_cfg():
    return ModelConfig(
        num_nodes=48, grid_h=6, grid_w=8,
        d_llm=96, llm_heads=4, llm_layers=2, llm_max_positions=64,
        lora_r=8, lora_alpha=16,
    )


@pytest.fixture(scope="module")
def hf_model(small_cfg):
    from transformers import GPT2Config, GPT2Model

    torch.manual_seed(0)
    config = GPT2Config(
        n_embd=small_cfg.d_llm,
        n_head=small_cfg.llm_heads,
        n_layer=small_cfg.llm_layers,
        n_positions=small_cfg.llm_max_positions,
        vocab_size=100,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    model = GPT2Model(config)
    model.eval()
    return model


def _our_forward(small_cfg, params, embeds):
    mod = GPT2Backbone(small_cfg)
    return np.asarray(
        mod.apply({"params": params}, jnp.asarray(embeds), deterministic=True)
    )


class TestGPT2Golden:
    def test_matches_hf_no_lora(self, small_cfg, hf_model):
        """inputs_embeds path through truncated blocks + ln_f, weights imported."""
        rng = np.random.default_rng(0)
        b, t = 3, 5
        embeds = rng.normal(0, 0.5, size=(b, t, small_cfg.d_llm)).astype(np.float32)

        with torch.no_grad():
            expect = (
                hf_model(inputs_embeds=torch.from_numpy(embeds)).last_hidden_state.numpy()
            )

        mod = GPT2Backbone(small_cfg)
        init = mod.init(jax.random.key(0), jnp.asarray(embeds))["params"]
        imported = gpt2_state_dict_to_params(hf_model.state_dict(), small_cfg)
        params = merge_gpt2_params(dict(init), imported)
        out = _our_forward(small_cfg, params, embeds)
        np.testing.assert_allclose(out, expect, atol=2e-4)

    def test_truncation_semantics(self, small_cfg, hf_model):
        """model.h = model.h[:k] (reference modules.py:170): our llm_layers=1 output
        must equal HF with blocks truncated to 1."""
        import copy

        rng = np.random.default_rng(1)
        embeds = rng.normal(0, 0.5, size=(2, 4, small_cfg.d_llm)).astype(np.float32)

        hf_trunc = copy.deepcopy(hf_model)
        hf_trunc.h = hf_trunc.h[:1]
        with torch.no_grad():
            expect = (
                hf_trunc(inputs_embeds=torch.from_numpy(embeds)).last_hidden_state.numpy()
            )

        cfg1 = ModelConfig(
            num_nodes=48, grid_h=6, grid_w=8,
            d_llm=small_cfg.d_llm, llm_heads=small_cfg.llm_heads, llm_layers=1,
            llm_max_positions=small_cfg.llm_max_positions,
            lora_r=small_cfg.lora_r, lora_alpha=small_cfg.lora_alpha,
        )
        mod = GPT2Backbone(cfg1)
        init = mod.init(jax.random.key(0), jnp.asarray(embeds))["params"]
        params = merge_gpt2_params(dict(init), gpt2_state_dict_to_params(hf_model.state_dict(), cfg1))
        out = _our_forward(cfg1, params, embeds)
        np.testing.assert_allclose(out, expect, atol=2e-4)

    def test_matches_peft_lora(self, small_cfg, hf_model):
        """peft LoRA(r, alpha, c_attn) with nonzero B: adapters must transfer
        (reference modules.py:177-187)."""
        peft = pytest.importorskip("peft")
        import copy

        lora_cfg = peft.LoraConfig(
            r=small_cfg.lora_r,
            lora_alpha=small_cfg.lora_alpha,
            target_modules=["c_attn"],
            lora_dropout=0.0,
            bias="none",
        )
        wrapped = peft.get_peft_model(copy.deepcopy(hf_model), lora_cfg)
        # make the adapters matter: randomize lora_B away from zero
        torch.manual_seed(3)
        for name, p in wrapped.named_parameters():
            if "lora_B" in name:
                with torch.no_grad():
                    p.copy_(torch.randn_like(p) * 0.1)
        wrapped.eval()

        rng = np.random.default_rng(2)
        embeds = rng.normal(0, 0.5, size=(2, 4, small_cfg.d_llm)).astype(np.float32)
        with torch.no_grad():
            expect = (
                wrapped(inputs_embeds=torch.from_numpy(embeds)).last_hidden_state.numpy()
            )

        mod = GPT2Backbone(small_cfg)
        init = mod.init(jax.random.key(0), jnp.asarray(embeds))["params"]
        imported = gpt2_state_dict_to_params(wrapped.state_dict(), small_cfg)
        # adapters must actually be present in the imported tree
        assert "lora_A" in imported["h_0"]["attn"]["c_attn"]
        params = merge_gpt2_params(dict(init), imported)
        out = _our_forward(small_cfg, params, embeds)
        np.testing.assert_allclose(out, expect, atol=2e-4)

    def test_full_model_loader(self, small_cfg, hf_model):
        """load_gpt2_into_model_params grafts the subtree without touching others."""
        mod = GPT2Backbone(small_cfg)
        embeds = jnp.zeros((1, 3, small_cfg.d_llm))
        init = mod.init(jax.random.key(0), embeds)["params"]
        full = {"llm": dict(init), "head": {"w": jnp.ones((3,))}}
        out = load_gpt2_into_model_params(full, hf_model.state_dict(), small_cfg)
        np.testing.assert_array_equal(out["head"]["w"], full["head"]["w"])
        np.testing.assert_array_equal(
            out["llm"]["ln_f"]["scale"], hf_model.state_dict()["ln_f.weight"].numpy()
        )
        # fresh LoRA init preserved when checkpoint lacks adapters
        np.testing.assert_array_equal(
            out["llm"]["h_0"]["attn"]["c_attn"]["lora_A"],
            init["h_0"]["attn"]["c_attn"]["lora_A"],
        )


class TestLeanLayerNorm:
    def test_lean_ln_matches_standard(self, small_cfg):
        """lean_ln (single-pass variance, bf16 affine) must match the standard
        path at fp32 on identical params (checkpoint-compatible names)."""
        rng = np.random.default_rng(5)
        embeds = rng.normal(0, 1, size=(4, 3, small_cfg.d_llm)).astype(np.float32)
        base = GPT2Backbone(small_cfg)
        params = base.init(jax.random.key(0), jnp.asarray(embeds))["params"]
        lean = GPT2Backbone(small_cfg, lean_ln=True)
        out_base = base.apply({"params": params}, jnp.asarray(embeds), deterministic=True)
        out_lean = lean.apply({"params": params}, jnp.asarray(embeds), deterministic=True)
        np.testing.assert_allclose(
            np.asarray(out_lean), np.asarray(out_base), atol=2e-5
        )
