"""Qwen2 (bias) and Mixtral (MoE) model families.

Qwen2: HF numerical parity (the variant is a config flag — qkv bias=True,
ref eagle/modeling_qwen2_kv.py:482-488 is a 12-line diff of the llama fork).
Mixtral: HF numerical parity of the MoE block + engine losslessness
(ref eagle/modeling_mixtral_kv.py:449-518).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowspec_tpu.config import (
    EngineConfig, ModelConfig, SamplingConfig, TreeConfig,
)
from flowspec_tpu.draft.eagle import init_eagle_params
from flowspec_tpu.models import (
    init_kv_cache, model_forward, embed_tokens, final_hidden, lm_head_logits,
    prefill_bias,
)
from flowspec_tpu.models.llama import LlamaParams, LlamaLayerParams
from flowspec_tpu.models.mixtral import (
    MixtralParams, MixtralLayerParams, init_mixtral_params,
)
from flowspec_tpu.runtime import SpecEngine

S_MAX = 128


def _forward_logits(params, cfg, tokens):
    t = len(tokens)
    cache = init_kv_cache(cfg.num_hidden_layers, 1, cfg.num_key_value_heads,
                          S_MAX, cfg.head_dim_, jnp.float32)
    hidden = embed_tokens(params, jnp.asarray(tokens)[None])
    bias = prefill_bias(jnp.asarray(0), t, S_MAX)
    out, _ = model_forward(params, cache, hidden,
                           jnp.arange(t, dtype=jnp.int32), bias,
                           jnp.asarray(0), cfg)
    return np.asarray(lm_head_logits(params, final_hidden(params, out, cfg))[0])


def test_qwen2_vs_transformers():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, attention_bias=True,
                      rms_norm_eps=1e-6, rope_theta=10000.0,
                      max_position_embeddings=512, dtype="float32")
    hf_cfg = Qwen2Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    L = cfg.num_hidden_layers

    def stack(fmt, transpose=True):
        ws = [sd[fmt.format(i)] for i in range(L)]
        return jnp.asarray(np.stack([w.T if transpose else w for w in ws]),
                           jnp.float32)

    pre = "model.layers.{}."
    layers = LlamaLayerParams(
        wq=stack(pre + "self_attn.q_proj.weight"),
        wk=stack(pre + "self_attn.k_proj.weight"),
        wv=stack(pre + "self_attn.v_proj.weight"),
        wo=stack(pre + "self_attn.o_proj.weight"),
        bq=stack(pre + "self_attn.q_proj.bias", transpose=False),
        bk=stack(pre + "self_attn.k_proj.bias", transpose=False),
        bv=stack(pre + "self_attn.v_proj.bias", transpose=False),
        w_gate=stack(pre + "mlp.gate_proj.weight"),
        w_up=stack(pre + "mlp.up_proj.weight"),
        w_down=stack(pre + "mlp.down_proj.weight"),
        input_ln=stack(pre + "input_layernorm.weight", transpose=False),
        post_ln=stack(pre + "post_attention_layernorm.weight",
                      transpose=False),
    )
    params = LlamaParams(
        embed=jnp.asarray(sd["model.embed_tokens.weight"], jnp.float32),
        layers=layers,
        final_norm=jnp.asarray(sd["model.norm.weight"], jnp.float32),
        lm_head=jnp.asarray(sd["lm_head.weight"].T, jnp.float32),
    )
    tokens = list(np.random.default_rng(0).integers(0, 128, 15))
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    got = _forward_logits(params, cfg, tokens)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_mixtral_vs_transformers():
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, num_local_experts=4,
                      num_experts_per_tok=2, rms_norm_eps=1e-5,
                      rope_theta=10000.0, max_position_embeddings=512,
                      dtype="float32")
    hf_cfg = MixtralConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        num_local_experts=cfg.num_local_experts,
        num_experts_per_tok=cfg.num_experts_per_tok,
        rms_norm_eps=cfg.rms_norm_eps, tie_word_embeddings=False)
    torch.manual_seed(1)
    hf = MixtralForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    L, E = cfg.num_hidden_layers, cfg.num_local_experts

    def stack(fmt, transpose=True):
        ws = [sd[fmt.format(i)] for i in range(L)]
        return jnp.asarray(np.stack([w.T if transpose else w for w in ws]),
                           jnp.float32)

    def moe(widx):
        return jnp.asarray(np.stack([
            np.stack([
                sd[f"model.layers.{i}.block_sparse_moe.experts.{j}.w{widx}.weight"].T
                for j in range(E)]) for i in range(L)]), jnp.float32)

    pre = "model.layers.{}."
    layers = MixtralLayerParams(
        wq=stack(pre + "self_attn.q_proj.weight"),
        wk=stack(pre + "self_attn.k_proj.weight"),
        wv=stack(pre + "self_attn.v_proj.weight"),
        wo=stack(pre + "self_attn.o_proj.weight"),
        router=stack(pre + "block_sparse_moe.gate.weight"),
        w_gate=moe(1), w_up=moe(3), w_down=moe(2),
        input_ln=stack(pre + "input_layernorm.weight", transpose=False),
        post_ln=stack(pre + "post_attention_layernorm.weight",
                      transpose=False),
    )
    params = MixtralParams(
        embed=jnp.asarray(sd["model.embed_tokens.weight"], jnp.float32),
        layers=layers,
        final_norm=jnp.asarray(sd["model.norm.weight"], jnp.float32),
        lm_head=jnp.asarray(sd["lm_head.weight"].T, jnp.float32),
    )
    tokens = list(np.random.default_rng(1).integers(0, 128, 13))
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    got = _forward_logits(params, cfg, tokens)
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


def test_mixtral_spec_equals_ar():
    cfg = ModelConfig(vocab_size=32, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, num_local_experts=4,
                      num_experts_per_tok=2, max_position_embeddings=512,
                      dtype="float32")
    tc = TreeConfig(top_k=8, depth=4, total_tokens=24, expand_tokens=16,
                    expand_depth=2, node_cap=48, leaf_cap=48, depth_cap=12,
                    chunk_len=8)
    ecfg = EngineConfig(model=cfg, tree=tc, sampling=SamplingConfig(),
                        max_seq_len=256, prefill_chunk=16)
    params = init_mixtral_params(jax.random.key(0), cfg, dtype=jnp.float32)
    draft = init_eagle_params(jax.random.key(9), cfg, embed=params.embed,
                              dtype=jnp.float32)
    eng = SpecEngine(params, draft, ecfg)
    prompt = list(np.random.default_rng(0).integers(3, 30, 10))
    ar, _ = eng.generate_ar(prompt, max_new_tokens=20, eos_token_id=-1)
    spec, _ = eng.generate(prompt, max_new_tokens=20, eos_token_id=-1)
    assert spec == ar


def test_mixtral_pipeline_and_tp():
    """MoE through the 4-stage pipeline and the expert-parallel TP path."""
    from flowspec_tpu.config import StageTopology
    from flowspec_tpu.parallel import PipelineEngine
    from flowspec_tpu.parallel.tp import TPEngine

    cfg = ModelConfig(vocab_size=32, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=4, num_attention_heads=4,
                      num_key_value_heads=2, num_local_experts=4,
                      num_experts_per_tok=2, max_position_embeddings=512,
                      dtype="float32")
    tc = TreeConfig(top_k=6, depth=3, total_tokens=16, expand_tokens=12,
                    expand_depth=2, node_cap=32, leaf_cap=32, depth_cap=10,
                    chunk_len=6)
    ecfg = EngineConfig(model=cfg, tree=tc, sampling=SamplingConfig(),
                        max_seq_len=128, prefill_chunk=8,
                        topology=StageTopology.even(4, 4))
    params = init_mixtral_params(jax.random.key(0), cfg, dtype=jnp.float32)
    draft = init_eagle_params(jax.random.key(9), cfg, embed=params.embed,
                              dtype=jnp.float32)
    ref = SpecEngine(params, draft, ecfg)
    prompt = list(np.random.default_rng(0).integers(3, 30, 9))
    ar, _ = ref.generate_ar(prompt, max_new_tokens=14, eos_token_id=-1)
    pe = PipelineEngine(params, draft, ecfg, schedule="continuous")
    out, _ = pe.generate(prompt, max_new_tokens=14, eos_token_id=-1)
    assert out == ar
    te = TPEngine(params, draft, ecfg, tp=2)
    out2, _ = te.generate(prompt, max_new_tokens=14, eos_token_id=-1)
    assert out2 == ar


def test_mixtral_pp_x_tp():
    """MoE on a (stage, tp) mesh: layers pipeline over stage; the stacked
    expert weights shard the E axis over tp (expert parallelism) with GSPMD
    inserting the mixture psums."""
    from flowspec_tpu.config import StageTopology
    from flowspec_tpu.parallel import PipelineEngine
    from flowspec_tpu.parallel.mesh import stage_tp_mesh

    cfg = ModelConfig(vocab_size=32, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=4, num_attention_heads=4,
                      num_key_value_heads=2, num_local_experts=4,
                      num_experts_per_tok=2, max_position_embeddings=512,
                      dtype="float32")
    tc = TreeConfig(top_k=6, depth=3, total_tokens=16, expand_tokens=12,
                    expand_depth=2, node_cap=32, leaf_cap=32, depth_cap=10,
                    chunk_len=6)
    ecfg = EngineConfig(model=cfg, tree=tc, sampling=SamplingConfig(),
                        max_seq_len=128, prefill_chunk=8,
                        topology=StageTopology.even(4, 4))
    params = init_mixtral_params(jax.random.key(0), cfg, dtype=jnp.float32)
    draft = init_eagle_params(jax.random.key(9), cfg, embed=params.embed,
                              dtype=jnp.float32)
    ref = SpecEngine(params, draft, ecfg)
    prompt = list(np.random.default_rng(0).integers(3, 30, 9))
    ar, _ = ref.generate_ar(prompt, max_new_tokens=12, eos_token_id=-1)
    pe = PipelineEngine(params, draft, ecfg, mesh=stage_tp_mesh(4, 2),
                        schedule="continuous")
    # experts really sharded: E/tp on each device
    shard = pe.params.layers.w_gate.addressable_shards[0].data
    assert shard.shape == (1, 2, 64, 96), shard.shape
    out, _ = pe.generate(prompt, max_new_tokens=12, eos_token_id=-1)
    assert out == ar


def test_mixtral_continuous_serving():
    """MoE + continuous batching: the serve dispatch program routes through
    mixtral_forward per lane (model_forward dispatches on the param
    family); every request's stream equals its solo AR run. Another
    composition the reference cannot express (batch=1 asserted,
    eagle/kv_cache.py:91)."""
    from flowspec_tpu.runtime.batched import BatchedSpecEngine

    cfg = ModelConfig(vocab_size=32, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, num_local_experts=4,
                      num_experts_per_tok=2, max_position_embeddings=512,
                      dtype="float32")
    tc = TreeConfig(top_k=6, depth=3, total_tokens=16, expand_tokens=12,
                    expand_depth=2, node_cap=32, leaf_cap=32, depth_cap=10,
                    chunk_len=8)
    ecfg = EngineConfig(model=cfg, tree=tc, sampling=SamplingConfig(),
                        max_seq_len=128, prefill_chunk=16)
    params = init_mixtral_params(jax.random.key(0), cfg, dtype=jnp.float32)
    draft = init_eagle_params(jax.random.key(9), cfg, embed=params.embed,
                              dtype=jnp.float32)
    eng = BatchedSpecEngine(params, draft, ecfg, batch_size=2)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(3, 30, 6 + i).tolist() for i in range(3)]
    refs = [eng.generate_ar(p, max_new_tokens=8, eos_token_id=-1)[0]
            for p in prompts]
    outs, stats = eng.serve(prompts, max_new_tokens=8, eos_token_id=-1)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert o == r, (i, o, r)
    assert stats["per_request"] == [8, 8, 8]
