"""Tensor-parallel engine: losslessness across tp widths and quant kinds.

The TP engine is SpecEngine with megatron GSPMD placement (parallel/tp.py);
under greedy sampling its output must be bit-identical in token space to the
unsharded single-chip engine. Mirrors the reference's tp path
(tp/tp_ea_model.py:155-391) which verifies the whole tree per round.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowspec_tpu.config import (
    EngineConfig, ModelConfig, SamplingConfig, TreeConfig,
)
from flowspec_tpu.draft.eagle import init_eagle_params
from flowspec_tpu.models.llama import init_llama_params
from flowspec_tpu.parallel.mesh import tp_mesh
from flowspec_tpu.parallel.tp import TPEngine
from flowspec_tpu.runtime import SpecEngine


def _cfg():
    mc = ModelConfig.tiny(vocab_size=64, n_layers=2)
    # tiny() gives 4 q heads / 2 kv heads; give tp=4 enough kv heads
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32",
                     "num_attention_heads": 8, "num_key_value_heads": 4})
    tc = TreeConfig(top_k=6, depth=3, total_tokens=15, expand_tokens=8,
                    expand_depth=2, node_cap=32, leaf_cap=32, depth_cap=10,
                    chunk_len=8)
    return EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                        max_seq_len=256, prefill_chunk=16)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    p = init_llama_params(jax.random.key(3), cfg.model, dtype=jnp.float32)
    d = init_eagle_params(jax.random.key(9), cfg.model, embed=p.embed,
                          dtype=jnp.float32)
    ref = SpecEngine(p, d, cfg)
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 60, 11).tolist()
    ar, _ = ref.generate_ar(prompt, max_new_tokens=24, eos_token_id=-1)
    return cfg, p, d, prompt, ar


@pytest.mark.parametrize("tp", [2, 4])
def test_llama_tp_lossless(setup, tp):
    cfg, p, d, prompt, ar = setup
    eng = TPEngine(p, d, cfg, mesh=tp_mesh(tp))
    out, stats = eng.generate(prompt, max_new_tokens=24, eos_token_id=-1)
    assert out == ar, (tp, stats)
    assert stats["accept_per_round"] >= 1.0


def test_llama_tp_quantized_lossless(setup):
    """int8-quantized weights under TP must match the int8 single-chip
    engine (quantized containers shard along the megatron axes)."""
    cfg, p, d, prompt, _ = setup
    from flowspec_tpu.draft.eagle import quantize_eagle_params
    from flowspec_tpu.models.llama import quantize_llama_params

    qp = quantize_llama_params(p, "int8")
    qd = quantize_eagle_params(d, "int8")
    ref = SpecEngine(qp, qd, cfg)
    ar, _ = ref.generate_ar(prompt, max_new_tokens=20, eos_token_id=-1)
    eng = TPEngine(qp, qd, cfg, mesh=tp_mesh(2))
    out, stats = eng.generate(prompt, max_new_tokens=20, eos_token_id=-1)
    assert out == ar, stats


def test_pipeline_pp_x_tp_lossless():
    """Combined PP x TP: PipelineEngine on a (stage, tp) mesh stays manual
    over `stage` (ppermute ring) while GSPMD auto-shards the layer matmuls
    over `tp` via megatron weight specs. Beyond the reference, which has no
    PP x TP composition (SURVEY.md section 2.4)."""
    from flowspec_tpu.config import StageTopology
    from flowspec_tpu.parallel import PipelineEngine
    from flowspec_tpu.parallel.mesh import stage_tp_mesh

    mc = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=8, num_attention_heads=8,
                     num_key_value_heads=4, max_position_embeddings=512,
                     dtype="float32")
    tc = TreeConfig(top_k=6, depth=3, total_tokens=18, expand_tokens=12,
                    expand_depth=2, node_cap=48, leaf_cap=48, depth_cap=12,
                    chunk_len=4, chunk_cap=12)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_seq_len=256, prefill_chunk=8,
                       topology=StageTopology.even(8, 4))
    p = init_llama_params(jax.random.key(5), mc, dtype=jnp.float32)
    d = init_eagle_params(jax.random.key(15), mc, embed=p.embed,
                          dtype=jnp.float32)
    prompt = np.random.default_rng(7).integers(3, 120, 10).tolist()
    ref = SpecEngine(p, d, cfg)
    ar, _ = ref.generate_ar(prompt, max_new_tokens=10, eos_token_id=-1)

    eng = PipelineEngine(p, d, cfg, mesh=stage_tp_mesh(4, 2),
                         schedule="continuous")
    assert eng.tp == 2
    # weights really are tp-sharded, not replicated
    shard = eng.params.layers.wq.addressable_shards[0].data
    assert shard.shape == (8 // 4, 64, 64 // 2), shard.shape
    out, stats = eng.generate(prompt, max_new_tokens=10, eos_token_id=-1)
    assert out == ar, stats


def test_llama_tp_fused_loop_lossless(setup):
    """TPEngine through the fused multi-round decode loop (the path the
    eval harness uses) — caught a regression where TPEngine.init_state
    didn't accept the bucket-aware max_seq kwarg."""
    cfg, p, d, prompt, ar = setup
    eng = TPEngine(p, d, cfg, mesh=tp_mesh(2))
    out, stats = eng.generate_fused(prompt, max_new_tokens=24,
                                    eos_token_id=-1)
    assert out == ar, stats
    assert stats["new_tokens"] == 24


def test_tp_sharded_continuous_serving(setup):
    """TP x continuous batching: megatron-sharded weights flow through the
    vmapped serve scan via GSPMD auto-propagation (no engine changes) —
    every request's stream still equals the unsharded serve output. The
    reference has neither TP verification with batching nor serving at
    all (batch=1 asserted, eagle/kv_cache.py:91)."""
    from flowspec_tpu.runtime.batched import BatchedSpecEngine
    from flowspec_tpu.parallel.tp import shard_draft_tp, shard_params_tp

    cfg, p, d, prompt, ar = setup
    rng = np.random.default_rng(21)
    prompts = [rng.integers(3, 60, 6 + i).tolist() for i in range(4)]
    ref_eng = BatchedSpecEngine(p, d, cfg, batch_size=2)
    refs, _ = ref_eng.serve(prompts, max_new_tokens=8, eos_token_id=-1)

    mesh = tp_mesh(2)
    eng = BatchedSpecEngine(shard_params_tp(p, mesh),
                            shard_draft_tp(d, mesh), cfg, batch_size=2)
    outs, stats = eng.serve(prompts, max_new_tokens=8, eos_token_id=-1)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert o == r, (i, o, r)
    assert stats["per_request"] == [8] * 4
