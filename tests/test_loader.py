"""HF checkpoint loading from disk (safetensors), end to end.

Saves a real transformers model with save_pretrained and loads it through
flowspec_tpu.models.loader — logits must match the in-memory HF model.
Covers config parsing, weight-map resolution, transposition, and bias
handling (ref: the per-stage from_pretrained path, stage_ea_model.py:92-172).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from flowspec_tpu.config import ModelConfig
from flowspec_tpu.models import (
    embed_tokens, final_hidden, init_kv_cache, lm_head_logits, model_forward,
    prefill_bias,
)
from flowspec_tpu.models.loader import load_llama_params, load_model_config

S_MAX = 64


def _logits(params, cfg, tokens):
    t = len(tokens)
    cache = init_kv_cache(cfg.num_hidden_layers, 1, cfg.num_key_value_heads,
                          S_MAX, cfg.head_dim_, jnp.float32)
    hidden = embed_tokens(params, jnp.asarray(tokens)[None])
    bias = prefill_bias(jnp.asarray(0), t, S_MAX)
    out, _ = model_forward(params, cache, hidden,
                           jnp.arange(t, dtype=jnp.int32), bias,
                           jnp.asarray(0), cfg)
    return np.asarray(
        lm_head_logits(params, final_hidden(params, out, cfg))[0])


def test_load_llama_checkpoint(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(vocab_size=96, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    cfg = load_model_config(str(tmp_path))
    assert cfg.vocab_size == 96 and cfg.num_key_value_heads == 2
    params = load_llama_params(str(tmp_path), cfg, dtype=jnp.float32)

    tokens = list(np.random.default_rng(0).integers(0, 96, 11))
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    got = _logits(params, cfg, tokens)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_load_tied_embeddings(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(vocab_size=64, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=1,
                         num_attention_heads=4, num_key_value_heads=4,
                         tie_word_embeddings=True)
    torch.manual_seed(1)
    hf = LlamaForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    cfg = load_model_config(str(tmp_path))
    assert cfg.tie_word_embeddings
    params = load_llama_params(str(tmp_path), cfg, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(params.lm_head),
                                  np.asarray(params.embed).T)
    tokens = list(np.random.default_rng(1).integers(0, 64, 9))
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(_logits(params, cfg, tokens), ref,
                               rtol=2e-3, atol=2e-3)
