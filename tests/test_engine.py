"""End-to-end single-chip engine: speculative decoding must be lossless.

Under greedy sampling, tree-speculative decoding provably emits exactly the
same token stream as plain autoregressive decoding (every committed token is
an argmax of the base model's distribution in the identical context). This
is the defining correctness property of the whole stack — draft beam, tree
build, tree-masked verify, posterior, KV compaction, draft-context alignment.
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
from flowspec_tpu.runtime.engine import SpecEngine


def _make_engine(seed=0, vocab=32, temperature=0.0):
    mc = ModelConfig.tiny(vocab_size=vocab, n_layers=2)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    tc = TreeConfig(top_k=8, depth=4, total_tokens=24, expand_tokens=16,
                    expand_depth=2, node_cap=48, leaf_cap=48, depth_cap=12,
                    chunk_len=8)
    cfg = EngineConfig(model=mc, tree=tc,
                       sampling=SamplingConfig(temperature=temperature),
                       max_new_tokens=48, max_seq_len=256, prefill_chunk=16)
    params = init_llama_params(jax.random.key(seed), mc, dtype=jnp.float32)
    draft = init_eagle_params(jax.random.key(seed + 100), mc,
                              embed=params.embed, dtype=jnp.float32)
    return SpecEngine(params, draft, cfg)


def test_spec_equals_ar_greedy():
    eng = _make_engine()
    rng = np.random.default_rng(0)
    for trial in range(3):
        prompt = rng.integers(3, 30, 12 + 5 * trial).tolist()
        ar, _ = eng.generate_ar(prompt, max_new_tokens=40, eos_token_id=-1)
        spec, stats = eng.generate(prompt, max_new_tokens=40, eos_token_id=-1)
        assert spec == ar, (
            f"trial {trial}: spec={spec[len(prompt):]} ar={ar[len(prompt):]}"
            f" stats={stats}")
        assert stats["accept_per_round"] >= 1.0


def test_some_acceptance_happens():
    """With a small vocab and top-8 beam, the tree should accept beyond the
    root in at least one round (otherwise the accept path isn't exercised)."""
    eng = _make_engine(seed=1, vocab=16)
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, 14, 10).tolist()
    spec, stats = eng.generate(prompt, max_new_tokens=40, eos_token_id=-1)
    ar, _ = eng.generate_ar(prompt, max_new_tokens=40, eos_token_id=-1)
    assert spec == ar
    assert stats["accept_per_round"] > 1.0, stats


def test_eos_stops_generation():
    eng = _make_engine(seed=2)
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, 30, 8).tolist()
    ar, _ = eng.generate_ar(prompt, max_new_tokens=40, eos_token_id=-1)
    # pick the 5th generated token as "eos" and re-run with it
    eos = ar[len(prompt) + 4]
    spec, _ = eng.generate(prompt, max_new_tokens=40, eos_token_id=eos)
    # generation must stop at (and include) the first eos occurrence
    gen = spec[len(prompt):]
    assert eos in gen
    first = gen.index(eos)
    assert len(gen) == first + 1
    assert gen[:first + 1] == ar[len(prompt):len(prompt) + first + 1]


def test_stochastic_runs_and_matches_context():
    """Temperature=1: output need not match AR, but every committed token must
    be a valid continuation (in-vocab) and the engine must not crash."""
    eng = _make_engine(seed=3, temperature=1.0)
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, 30, 10).tolist()
    out, stats = eng.generate(prompt, max_new_tokens=30, eos_token_id=-1,
                              seed=7)
    gen = out[len(prompt):]
    assert len(gen) == 30
    assert all(0 <= t < 32 for t in gen)
    assert stats["accept_per_round"] >= 1.0


def test_prefill_keeps_all_draft_pairs():
    """Prompts longer than depth_cap+1 must not lose draft (token, hidden)
    pairs: the pending buffers are sized to the prefill chunk and the sampled
    root is patched into the final valid slot (advisor finding r1-high —
    ctx_pad=depth_cap+1 buffers silently truncated real prompts' draft
    conditioning, collapsing acceptance)."""
    eng = _make_engine(seed=4)
    d_cap = eng.cfg.tree.depth_cap
    pc = eng.cfg.prefill_chunk
    assert pc > d_cap + 1, "test config must exercise the long-chunk case"

    # single full chunk: every pair (incl. the patched root pair) must land
    # in the draft KV via the prefill drain, and the decode-round pending
    # buffers shrink to the depth_cap+1 envelope
    rng = np.random.default_rng(4)
    prompt = rng.integers(3, 30, pc).tolist()
    state = eng.init_state(0)
    state = eng.prefill(state, prompt)
    assert int(state.n_pending) == 0
    assert int(state.draft_cache.length) == pc      # all pc pairs drained
    assert state.pending_tokens.shape == (d_cap + 1,)
    assert float(np.abs(np.asarray(state.root_hidden)).sum()) > 0

    # multi-chunk: 1.5 chunks — both chunks' pairs fully drained
    prompt2 = rng.integers(3, 30, pc + pc // 2).tolist()
    state = eng.init_state(0)
    state = eng.prefill(state, prompt2)
    assert int(state.n_pending) == 0
    assert int(state.draft_cache.length) == len(prompt2)


def test_generate_rejects_overlong_request():
    eng = _make_engine(seed=5)
    limit = eng.cfg.max_seq_len
    prompt = list(range(3, 13))
    with pytest.raises(ValueError):
        eng.generate(prompt, max_new_tokens=limit)


def test_kv_bucket_growth_lossless():
    """cfg.kv_buckets: generate_fused starts in a small KV bucket and
    migrates to larger ones as commit_len grows — the emitted stream must be
    identical to the single-allocation path (attention reads only change in
    how much masked padding they span), and multiple buckets must actually
    engage."""
    import dataclasses as dc
    eng = _make_engine(seed=6)
    ref, _ = eng.generate_fused([5, 9, 3, 7, 4, 8, 6], max_new_tokens=40,
                                eos_token_id=-1)

    cfgb = dc.replace(eng.cfg, kv_buckets=(16, 32, 64))
    engb = SpecEngine(eng.params, eng.draft, cfgb)
    outb, stats = engb.generate_fused([5, 9, 3, 7, 4, 8, 6],
                                      max_new_tokens=40, eos_token_id=-1)
    assert outb == ref
    assert stats["new_tokens"] == 40
    assert stats["kv_buckets_used"] >= 2, stats

    # eos inside an early bucket stops the chain early
    eos = ref[len([5, 9, 3, 7, 4, 8, 6]) + 5]
    oute, stats_e = engb.generate_fused([5, 9, 3, 7, 4, 8, 6],
                                        max_new_tokens=40, eos_token_id=eos)
    refe, _ = eng.generate_fused([5, 9, 3, 7, 4, 8, 6], max_new_tokens=40,
                                 eos_token_id=eos)
    assert oute == refe


def test_grow_kv_preserves_content():
    """_grow_kv zero-pads the seq axis only: live rows, lengths and all
    other state fields must survive a bucket migration bit-exactly."""
    from flowspec_tpu.runtime.engine import _grow_kv
    eng = _make_engine(seed=7)
    state = eng.init_state(0, max_seq=40)     # 256-row allocs
    state = eng.prefill(state, list(range(3, 23)))
    base_rows0 = state.base_cache.k.shape[3]
    k0 = np.asarray(state.base_cache.k)
    dk0 = np.asarray(state.draft_cache.k)
    commit0 = int(state.commit_len)
    length0 = int(state.base_cache.length)

    grown = _grow_kv(state, *eng._kv_rows(600))   # donates `state`
    assert grown.base_cache.k.shape[3] > base_rows0
    assert int(grown.commit_len) == commit0
    assert int(grown.base_cache.length) == length0
    np.testing.assert_array_equal(
        np.asarray(grown.base_cache.k)[:, :, :, :base_rows0], k0)
    np.testing.assert_array_equal(
        np.asarray(grown.draft_cache.k)[:, :, :, :dk0.shape[3]], dk0)
    assert not np.asarray(
        grown.base_cache.k)[:, :, :, base_rows0:].any()


def test_force_accept_bench_mode():
    """Synthetic-acceptance measurement mode: with force_accept=n the engine
    commits min(n, deepest path) nodes per round through the real commit/
    compaction path — accept_per_round rises accordingly, and the default
    (force_accept=0) path is untouched."""
    import dataclasses as dc
    eng = _make_engine(seed=8)
    prompt = [5, 9, 3, 7, 4, 8, 6]
    ref, ref_stats = eng.generate_fused(prompt, max_new_tokens=24,
                                        eos_token_id=-1)

    engf = SpecEngine(eng.params, eng.draft,
                      dc.replace(eng.cfg, force_accept=3))
    outf, stats = engf.generate_fused(prompt, max_new_tokens=24,
                                      eos_token_id=-1)
    assert stats["new_tokens"] == 24
    # beam depth is 4 in this config, so paths of >= 4 nodes exist
    assert stats["accept_per_round"] >= 2.5, stats
    assert stats["rounds"] < ref_stats["rounds"], (stats, ref_stats)


def test_formats_pinned_engine_lossless():
    """SpecEngine(formats=...) — the AOT layout-negotiated bf16 path bench
    uses for unquantized 7B — must decode losslessly through the fused
    loop. Regression: the in_shardings pin tuples must track the loop's
    argument count (adding commit_cap broke them)."""
    import bench as benchmod
    from flowspec_tpu.config import (
        EngineConfig as EC, ModelConfig as MC, SamplingConfig as SC,
        TreeConfig as TC,
    )
    mc = MC.tiny(vocab_size=32, n_layers=2)
    tc = TC(top_k=8, depth=4, total_tokens=24, expand_tokens=16,
            expand_depth=2, node_cap=48, leaf_cap=48, depth_cap=12,
            chunk_len=8)
    cfg = EC(model=mc, tree=tc, sampling=SC(temperature=0.0),
             max_new_tokens=24, max_seq_len=256, prefill_chunk=16)
    params, draft, formats = benchmod.build_into_formats(mc, cfg)
    eng = SpecEngine(params, draft, cfg, formats=formats)
    ar, _ = eng.generate_ar([5, 9, 3, 7, 4, 8, 6], max_new_tokens=16,
                            eos_token_id=-1)
    out, stats = eng.generate_fused([5, 9, 3, 7, 4, 8, 6],
                                    max_new_tokens=16, eos_token_id=-1)
    assert out == ar, stats
