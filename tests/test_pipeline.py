"""SPMD pipeline schedules on a 4-stage CPU mesh: losslessness + behavior.

Greedy pipelined spec decode must emit exactly the AR token stream for every
schedule (ref schedules: stage_ea_model.py:369-1791). These run the full
stack: pipelined prefill, stage-sharded layer scan, ppermute chunk streaming,
replicated verdicts, in-flight pruning, KV compaction, and (continuous)
per-turn expansion + merge.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowspec_tpu.config import (
    EngineConfig, ModelConfig, SamplingConfig, TreeConfig, StageTopology,
)
from flowspec_tpu.draft.eagle import init_eagle_params
from flowspec_tpu.models.llama import init_llama_params
from flowspec_tpu.parallel import PipelineEngine
from flowspec_tpu.runtime import SpecEngine

SCHEDULES = ["ar", "serial", "naive", "pruned", "continuous",
             "pipedec"]


def _cfg(vocab=12, temperature=0.0):
    mc = ModelConfig.tiny(vocab_size=vocab, n_layers=4)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    tc = TreeConfig(top_k=8, depth=4, total_tokens=24, expand_tokens=12,
                    expand_depth=2, node_cap=64, leaf_cap=64, depth_cap=14,
                    chunk_len=6, chunk_cap=12)
    return EngineConfig(model=mc, tree=tc,
                        sampling=SamplingConfig(temperature=temperature),
                        max_seq_len=256, prefill_chunk=8,
                        topology=StageTopology.even(4, 4))


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    p = init_llama_params(jax.random.key(2), cfg.model, dtype=jnp.float32)
    d = init_eagle_params(jax.random.key(7), cfg.model, embed=p.embed,
                          dtype=jnp.float32)
    return cfg, p, d


@pytest.mark.parametrize("schedule", SCHEDULES)
def test_schedule_matches_ar(setup, schedule):
    cfg, p, d = setup
    ref = SpecEngine(p, d, cfg)
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 11, 9).tolist()
    ar, _ = ref.generate_ar(prompt, max_new_tokens=20, eos_token_id=-1)
    eng = PipelineEngine(p, d, cfg, schedule=schedule)
    out, stats = eng.generate(prompt, max_new_tokens=20, eos_token_id=-1)
    assert out == ar, (schedule, stats, out[len(prompt):], ar[len(prompt):])
    assert stats["accept_per_round"] >= 1.0


def test_acceptance_beyond_root(setup):
    """The accept/prune paths must actually fire (vocab 12, top-8 beam)."""
    cfg, p, d = setup
    eng = PipelineEngine(p, d, cfg, schedule="continuous")
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, 11, 12).tolist()
    out, stats = eng.generate(prompt, max_new_tokens=30, eos_token_id=-1)
    assert stats["accept_per_round"] > 1.0, stats


def test_continuous_fewer_turns_than_naive(setup):
    """Continuous should need no more pipeline turns than naive for the same
    output (the point of in-flight pruning + expansion)."""
    cfg, p, d = setup
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, 11, 10).tolist()
    outs = {}
    for sched in ("naive", "continuous"):
        eng = PipelineEngine(p, d, cfg, schedule=sched)
        out, stats = eng.generate(prompt, max_new_tokens=25, eos_token_id=-1)
        outs[sched] = (out, stats)
    assert outs["naive"][0] == outs["continuous"][0]
    assert outs["continuous"][1]["turns"] <= outs["naive"][1]["turns"]


def test_stochastic_pipeline(setup):
    cfg, p, d = setup
    cfg2 = _cfg(temperature=1.0)
    eng = PipelineEngine(p, d, cfg2, schedule="continuous")
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, 11, 9).tolist()
    out, stats = eng.generate(prompt, max_new_tokens=20, eos_token_id=-1,
                              seed=11)
    gen = out[len(prompt):]
    assert len(gen) == 20
    assert all(0 <= t < 12 for t in gen)


def test_eos_stops(setup):
    cfg, p, d = setup
    ref = SpecEngine(p, d, cfg)
    rng = np.random.default_rng(4)
    prompt = rng.integers(3, 11, 8).tolist()
    ar, _ = ref.generate_ar(prompt, max_new_tokens=25, eos_token_id=-1)
    eos = ar[len(prompt) + 6]
    eng = PipelineEngine(p, d, cfg, schedule="continuous")
    out, _ = eng.generate(prompt, max_new_tokens=25, eos_token_id=eos)
    gen = out[len(prompt):]
    assert eos in gen
    first = gen.index(eos)
    assert len(gen) == first + 1
    assert gen[:first + 1] == ar[len(prompt):len(prompt) + first + 1]


def test_fused_pipeline_decode_loop(setup):
    """The on-device multi-round loop must match the per-round driver."""
    cfg, p, d = setup
    ref = SpecEngine(p, d, cfg)
    rng = np.random.default_rng(5)
    prompt = rng.integers(3, 11, 9).tolist()
    ar, _ = ref.generate_ar(prompt, max_new_tokens=18, eos_token_id=-1)
    eng = PipelineEngine(p, d, cfg, schedule="continuous")
    out, st = eng.generate_fused(prompt, max_new_tokens=18, eos_token_id=-1)
    assert out == ar
    # the fused loop counts rounds on-device (r2 verdict weak-3): the
    # headline accept metric must be real, not the old rounds=-1 sentinel
    assert st["rounds"] >= 1
    assert st["accept_per_round"] == 18 / st["rounds"]


def test_high_acceptance_stress():
    """High-acceptance regime (vocab 8, deep top-7 beam, 4-token chunks):
    stresses the all-unverified-pruned edge where a verdict can leave only
    zero-length chunk entries in the queue, and pipedec's draft-KV
    compaction ordering."""
    mc = ModelConfig.tiny(vocab_size=8, n_layers=4)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    tc = TreeConfig(top_k=7, depth=5, total_tokens=28, expand_tokens=12,
                    expand_depth=2, node_cap=64, leaf_cap=64, depth_cap=14,
                    chunk_len=4, chunk_cap=14)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_seq_len=256, prefill_chunk=8,
                       topology=StageTopology.even(4, 4))
    for seed in (4, 5):
        p = init_llama_params(jax.random.key(seed), mc, dtype=jnp.float32)
        d = init_eagle_params(jax.random.key(100 + seed), mc, embed=p.embed,
                              dtype=jnp.float32)
        ref = SpecEngine(p, d, cfg)
        prompt = list(np.random.default_rng(seed).integers(2, 7, 8))
        ar, _ = ref.generate_ar(prompt, max_new_tokens=24, eos_token_id=-1)
        for sched in ("pruned", "continuous", "pipedec"):
            eng = PipelineEngine(p, d, cfg, schedule=sched)
            out, stats = eng.generate(prompt, max_new_tokens=24,
                                      eos_token_id=-1)
            assert out == ar, (seed, sched, stats)


def test_none_expand_fires_and_stays_lossless():
    """none_expand (ref stage_ea_model.py:1347-1382): on bubble turns the
    saved beam is deepened and merged instead of idling. Must stay lossless,
    must actually fire in a bubble-heavy regime, and must not need more
    rounds than the no-expansion variant (the whole point: rounds last
    longer, so fewer re-drafts from scratch)."""
    mc = ModelConfig.tiny(vocab_size=8, n_layers=4)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    rounds = {}
    p = init_llama_params(jax.random.key(4), mc, dtype=jnp.float32)
    d = init_eagle_params(jax.random.key(104), mc, embed=p.embed,
                          dtype=jnp.float32)
    for ne in (False, True):
        tc = TreeConfig(top_k=7, depth=5, total_tokens=28, expand_tokens=12,
                        expand_depth=2, node_cap=64, leaf_cap=64,
                        depth_cap=14, chunk_len=4, chunk_cap=14,
                        none_expand=ne)
        cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                           max_seq_len=256, prefill_chunk=8,
                           topology=StageTopology.even(4, 4))
        ref = SpecEngine(p, d, cfg)
        eng = PipelineEngine(p, d, cfg, schedule="continuous")
        tot_rounds = 0
        tot_fires = 0
        for seed in (5, 6):
            prompt = list(np.random.default_rng(seed).integers(2, 7, 8))
            ar, _ = ref.generate_ar(prompt, max_new_tokens=24,
                                    eos_token_id=-1)
            out, stats = eng.generate(prompt, max_new_tokens=24,
                                      eos_token_id=-1)
            assert out == ar, (ne, seed, stats)
            tot_rounds += stats["rounds"]
            tot_fires += stats["ne_fires"]
        rounds[ne] = tot_rounds
        if ne:
            assert tot_fires > 0, "none_expand never fired"
        else:
            assert tot_fires == 0
    assert rounds[True] <= rounds[False], rounds


def test_uneven_layer_split_lossless():
    """Uneven layer-to-stage splits (ref 0+8+8+8+8,
    tools/split_and_save_models.py:33-57): the stacked layer axis pads to
    p * max(split) with all-zero identity layers. 6 layers on 4 stages
    (auto-split 1+1+2+2) and the reference's empty-first-stage shape
    (0+2+2+2) must both emit exactly the AR stream."""
    mc = ModelConfig.tiny(vocab_size=12, n_layers=6)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    tc = TreeConfig(top_k=8, depth=4, total_tokens=24, expand_tokens=12,
                    expand_depth=2, node_cap=64, leaf_cap=64, depth_cap=14,
                    chunk_len=6, chunk_cap=12)
    p = init_llama_params(jax.random.key(11), mc, dtype=jnp.float32)
    d = init_eagle_params(jax.random.key(111), mc, embed=p.embed,
                          dtype=jnp.float32)
    prompt = list(np.random.default_rng(3).integers(3, 11, 9))
    topos = [StageTopology.even(6, 4),
             StageTopology(num_stages=4, layers_per_stage=(0, 2, 2, 2))]
    for topo in topos:
        cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                           max_seq_len=256, prefill_chunk=8, topology=topo)
        ref = SpecEngine(p, d, cfg)
        ar, _ = ref.generate_ar(prompt, max_new_tokens=20, eos_token_id=-1)
        eng = PipelineEngine(p, d, cfg, schedule="continuous")
        assert eng.layer_split == topo.layers_per_stage
        out, stats = eng.generate(prompt, max_new_tokens=20, eos_token_id=-1)
        assert out == ar, (topo.layers_per_stage, stats)
