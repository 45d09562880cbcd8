"""End-to-end speculative speedup with a TRAINED draft.

Every other engine test runs a random draft against a random base, so
acceptance is worst-case (~1 token/round) and the speculative machinery is
only exercised for losslessness. This fixture draft was distilled against
the tiny base the EAGLE way (tools/train_tiny_draft.py: huber on the base's
next final-norm hidden + CE against the base's next-token distribution
through the shared lm_head, trained on the base's own greedy rollouts).
The engine must now commit >1 token/round — the acceptance machinery
productively accepting multi-token paths — while staying exactly lossless
vs AR (the spec-decoding contract: acceptance changes SPEED, never output).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowspec_tpu.config import (
    EngineConfig, ModelConfig, SamplingConfig, TreeConfig,
)
from flowspec_tpu.draft.eagle import EagleParams, init_eagle_params
from flowspec_tpu.models.llama import init_llama_params
from flowspec_tpu.runtime.engine import SpecEngine

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tiny_draft_trained.npz")


def _setup():
    mc = ModelConfig.tiny(vocab_size=64, n_layers=2)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    base = init_llama_params(jax.random.key(0), mc, dtype=jnp.float32)
    z = np.load(FIXTURE)
    draft = EagleParams(embed=base.embed, **{
        f: jnp.asarray(z[f]) for f in
        ("fc_w", "fc_b", "wq", "wk", "wv", "wo",
         "w_gate", "w_up", "w_down", "post_ln")})
    tc = TreeConfig(top_k=6, depth=5, total_tokens=24, expand_tokens=12,
                    expand_depth=2, node_cap=48, leaf_cap=48, depth_cap=10,
                    chunk_len=8)
    return mc, base, draft, tc


def test_trained_draft_accepts_multiple_tokens_per_round():
    """Held-out prompts (different rng than training): accept/round must
    clearly exceed the worst case, and outputs stay exactly AR-lossless."""
    mc, base, draft, tc = _setup()
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_seq_len=256, prefill_chunk=16)
    eng = SpecEngine(base, draft, cfg)
    rng = np.random.default_rng(555)
    accs = []
    for i in range(4):
        prompt = rng.integers(0, 64, 8).tolist()
        ar, _ = eng.generate_ar(prompt, max_new_tokens=40, eos_token_id=-1)
        out, st = eng.generate(prompt, max_new_tokens=40, eos_token_id=-1)
        assert out == ar, (i, out, ar)
        accs.append(st["accept_per_round"])
    mean_acc = float(np.mean(accs))
    # training measured 2.22 on its own eval prompts; demand a clear margin
    # over worst-case 1.0 on held-out prompts
    assert mean_acc >= 1.5, accs


def test_trained_draft_beats_untrained_acceptance():
    mc, base, draft, tc = _setup()
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_seq_len=256, prefill_chunk=16)
    draft0 = init_eagle_params(jax.random.key(9), mc, embed=base.embed,
                               dtype=jnp.float32)
    eng = SpecEngine(base, draft, cfg)
    eng0 = SpecEngine(base, draft0, cfg)
    prompt = np.random.default_rng(777).integers(0, 64, 10).tolist()
    _, st = eng.generate(prompt, max_new_tokens=40, eos_token_id=-1)
    _, st0 = eng0.generate(prompt, max_new_tokens=40, eos_token_id=-1)
    assert st["accept_per_round"] > st0["accept_per_round"] + 0.3, (st, st0)


def test_trained_draft_fused_loop_and_rounds_drop():
    """The fused on-device loop sees the same acceptance, and the round
    count for a fixed budget drops accordingly (the actual speedup)."""
    mc, base, draft, tc = _setup()
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_seq_len=256, prefill_chunk=16)
    eng = SpecEngine(base, draft, cfg)
    prompt = np.random.default_rng(888).integers(0, 64, 8).tolist()
    ar, _ = eng.generate_ar(prompt, max_new_tokens=36, eos_token_id=-1)
    out, st = eng.generate_fused(prompt, max_new_tokens=36, eos_token_id=-1)
    assert out == ar
    assert st["rounds"] <= 36 * 2 // 3, st   # >=1.5 tokens/round


def test_trained_draft_stochastic_still_valid():
    """Temperature=1 with the trained draft: the stochastic acceptance law
    holds (in-vocab, full budget) and acceptance stays above worst case."""
    mc, base, draft, tc = _setup()
    cfg = EngineConfig(model=mc, tree=tc,
                       sampling=SamplingConfig(temperature=1.0),
                       max_seq_len=256, prefill_chunk=16)
    eng = SpecEngine(base, draft, cfg)
    prompt = np.random.default_rng(999).integers(0, 64, 8).tolist()
    out, st = eng.generate(prompt, max_new_tokens=30, eos_token_id=-1)
    gen = out[len(prompt):]
    assert len(gen) >= 30 and all(0 <= t < 64 for t in gen)
