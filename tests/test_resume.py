"""Multi-turn continuation (resume_and_generate): KV reuse across turns.

Correctness bar: continuing a conversation from a kept state must produce
EXACTLY the tokens a fresh engine produces when prefilling the whole
concatenated history — greedy decoding is a pure function of the context,
so any divergence means the reused KV/draft state is corrupted.

The tricky boundary: a generation can stop mid-round (budget or eos), so
the state may have committed PAST the returned stream, and the draft KV's
final pair fuses the overshoot token. The trained tiny draft fixture
(accept/round ~2.2) makes multi-token commits — and therefore real
overshoot — happen naturally in these tests.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from flowspec_tpu.config import (
    EngineConfig, ModelConfig, SamplingConfig, TreeConfig,
)
from flowspec_tpu.draft.eagle import EagleParams, init_eagle_params
from flowspec_tpu.models.llama import init_llama_params
from flowspec_tpu.runtime.engine import SpecEngine

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tiny_draft_trained.npz")


def _engine(trained=True, prefill_chunk=16):
    mc = ModelConfig.tiny(vocab_size=64, n_layers=2)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    base = init_llama_params(jax.random.key(0), mc, dtype=jnp.float32)
    if trained:
        z = np.load(FIXTURE)
        draft = EagleParams(embed=base.embed, **{
            f: jnp.asarray(z[f]) for f in
            ("fc_w", "fc_b", "wq", "wk", "wv", "wo",
             "w_gate", "w_up", "w_down", "post_ln")})
    else:
        draft = init_eagle_params(jax.random.key(9), mc, embed=base.embed,
                                  dtype=jnp.float32)
    tc = TreeConfig(top_k=6, depth=5, total_tokens=24, expand_tokens=12,
                    expand_depth=2, node_cap=48, leaf_cap=48, depth_cap=10,
                    chunk_len=8)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_seq_len=256, prefill_chunk=prefill_chunk)
    return SpecEngine(base, draft, cfg)


def _check_resume(eng, prompt, extra, n1, n2):
    out1, st1, state = eng.generate(prompt, max_new_tokens=n1,
                                    eos_token_id=-1, return_state=True)
    out2, st2 = eng.resume_and_generate(state, out1, extra,
                                        max_new_tokens=n2, eos_token_id=-1)
    # reference: fresh full-history prefill
    ref, _ = eng.generate(out1 + extra, max_new_tokens=n2, eos_token_id=-1)
    assert out2 == ref, (out2, ref)
    return st1, st2


def test_resume_matches_fresh_full_prefill():
    """Trained draft -> multi-token commits -> the first turn's stop falls
    mid-round and the state overshoots; the continuation must still equal
    the fresh full-prefill run exactly."""
    eng = _engine(trained=True)
    rng = np.random.default_rng(31)
    for i in range(3):
        prompt = rng.integers(0, 64, 7 + i).tolist()
        extra = rng.integers(0, 64, 5).tolist()
        # 13 is not a multiple of typical accepts (~2-3): overshoot likely
        st1, st2 = _check_resume(eng, prompt, extra, 13, 11)


def test_resume_random_draft():
    """Acceptance-1 regime (every round commits exactly one token)."""
    eng = _engine(trained=False)
    rng = np.random.default_rng(37)
    prompt = rng.integers(0, 64, 9).tolist()
    extra = rng.integers(0, 64, 6).tolist()
    _check_resume(eng, prompt, extra, 8, 7)


def test_resume_long_extra_exceeds_pair_buffer():
    """A continuation longer than depth_cap+1 (the decode-state pair-buffer
    width) must not truncate draft pairs — the resume path re-widens the
    pending buffers to prefill_chunk before chunk-prefilling."""
    eng = _engine(trained=True, prefill_chunk=16)
    rng = np.random.default_rng(41)
    prompt = rng.integers(0, 64, 6).tolist()
    extra = rng.integers(0, 64, 29).tolist()   # >> depth_cap+1 == 11
    _check_resume(eng, prompt, extra, 9, 12)


def test_resume_chained_three_turns():
    eng = _engine(trained=True)
    rng = np.random.default_rng(43)
    prompt = rng.integers(0, 64, 8).tolist()
    out1, _, state = eng.generate(prompt, max_new_tokens=10,
                                  eos_token_id=-1, return_state=True)
    e2 = rng.integers(0, 64, 4).tolist()
    out2, _, state = eng.resume_and_generate(state, out1, e2,
                                             max_new_tokens=9,
                                             eos_token_id=-1,
                                             return_state=True)
    e3 = rng.integers(0, 64, 6).tolist()
    out3, _ = eng.resume_and_generate(state, out2, e3, max_new_tokens=8,
                                      eos_token_id=-1)
    ref, _ = eng.generate(out2 + e3, max_new_tokens=8, eos_token_id=-1)
    assert out3 == ref


def test_resume_after_eos_cut():
    """Stop by eos (possibly mid-path), then continue the conversation."""
    eng = _engine(trained=True)
    rng = np.random.default_rng(47)
    prompt = rng.integers(0, 64, 8).tolist()
    probe, _ = eng.generate(prompt, max_new_tokens=12, eos_token_id=-1)
    eos = probe[len(prompt) + 5]               # 6th generated token
    out1, _, state = eng.generate(prompt, max_new_tokens=12,
                                  eos_token_id=eos, return_state=True)
    assert out1[-1] == eos and len(out1) <= len(probe)
    extra = rng.integers(0, 64, 5).tolist()
    out2, _ = eng.resume_and_generate(state, out1, extra,
                                      max_new_tokens=9, eos_token_id=-1)
    ref, _ = eng.generate(out1 + extra, max_new_tokens=9, eos_token_id=-1)
    assert out2 == ref


def test_pipeline_resume_matches_full_prefill():
    """PipelineEngine.resume_and_generate (r2 verdict #4): continuing from
    a kept PipeState must equal a fresh full-history pipelined run — and
    both must equal the single-chip engine (losslessness chain)."""
    from flowspec_tpu.config import StageTopology
    from flowspec_tpu.parallel import PipelineEngine
    mc = ModelConfig.tiny(vocab_size=64, n_layers=4)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    base = init_llama_params(jax.random.key(0), mc, dtype=jnp.float32)
    draft = init_eagle_params(jax.random.key(9), mc, embed=base.embed,
                              dtype=jnp.float32)
    tc = TreeConfig(top_k=6, depth=4, total_tokens=20, expand_tokens=10,
                    expand_depth=2, node_cap=48, leaf_cap=48, depth_cap=12,
                    chunk_len=6, chunk_cap=12)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_seq_len=256, prefill_chunk=8,
                       topology=StageTopology.even(4, 4))
    eng = PipelineEngine(base, draft, cfg, schedule="continuous")
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 64, 11).tolist()
    out1, st1, state = eng.generate(prompt, max_new_tokens=10,
                                    eos_token_id=-1, return_state=True)
    extra = rng.integers(0, 64, 7).tolist()
    # (the round programs donate the carried state, so a state feeds
    # exactly one continuation — same contract as SpecEngine)
    out2, st2, state2 = eng.resume_and_generate(
        state, out1, extra, max_new_tokens=10, eos_token_id=-1,
        return_state=True)
    ref, _ = eng.generate(out1 + extra, max_new_tokens=10, eos_token_id=-1)
    assert out2 == ref, (out2, ref)
    assert st2["new_tokens"] == 10

    # chain a third turn off the second
    e3 = rng.integers(0, 64, 4).tolist()
    out3, _ = eng.resume_and_generate(state2, out2, e3, max_new_tokens=8,
                                      eos_token_id=-1)
    ref3, _ = eng.generate(out2 + e3, max_new_tokens=8, eos_token_id=-1)
    assert out3 == ref3
