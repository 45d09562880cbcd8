"""Thin-draft variant: a draft layer with its own width W < H and a
w_out: (W, H) output projection (draft/eagle.py thin layout).

The reference's draft is always a full-width base decoder layer
(eagle/cnets.py:476-520); the thin layout is a deliberate capability
beyond it — the distilled bench drafts (tools/train_bench_draft.py) use
it so the checkpoint stays small and the beam's weight read shrinks.
Greedy speculative decoding is draft-independent in OUTPUT (any proposal
set yields the base's greedy stream), so these tests pin exact AR parity
through every engine the thin draft can reach.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from flowspec_tpu.config import (
    EngineConfig, ModelConfig, SamplingConfig, TreeConfig,
)
from flowspec_tpu.draft.eagle import (
    draft_view, init_eagle_params, quantize_eagle_params,
)
from flowspec_tpu.models.llama import init_llama_params
from flowspec_tpu.runtime.engine import SpecEngine


def _setup(width=32, quant=None):
    mc = ModelConfig.tiny(vocab_size=32, n_layers=2)
    mc = dataclasses.replace(mc, dtype="float32")
    base = init_llama_params(jax.random.key(0), mc, dtype=jnp.float32)
    draft = init_eagle_params(jax.random.key(5), mc, embed=base.embed,
                              dtype=jnp.float32, width=width)
    if quant:
        draft = quantize_eagle_params(draft, quant)
    tc = TreeConfig(top_k=5, depth=3, total_tokens=14, expand_tokens=8,
                    expand_depth=2, node_cap=24, leaf_cap=24, depth_cap=8,
                    chunk_len=6)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_seq_len=128, prefill_chunk=8)
    return mc, base, draft, cfg


def test_draft_view_geometry():
    mc, base, draft, cfg = _setup(width=32)
    dv = draft_view(draft, mc)
    assert dv.hidden_size == 32
    assert dv.head_dim_ == mc.head_dim_          # rope-compatible
    assert dv.num_attention_heads == 32 // mc.head_dim_
    assert draft.w_out is not None and draft.w_out.shape == (
        32, mc.hidden_size)
    # full-size drafts return the base config unchanged (is-identity)
    full = init_eagle_params(jax.random.key(5), mc, embed=base.embed,
                             dtype=jnp.float32)
    assert draft_view(full, mc) is mc
    assert full.w_out is None


def test_thin_draft_lossless_spec():
    mc, base, draft, cfg = _setup(width=32)
    eng = SpecEngine(base, draft, cfg)
    rng = np.random.default_rng(0)
    for i in range(3):
        prompt = rng.integers(0, 32, 9 + i).tolist()
        ar, _ = eng.generate_ar(prompt, max_new_tokens=20, eos_token_id=-1)
        out, st = eng.generate(prompt, max_new_tokens=20, eos_token_id=-1)
        assert out == ar, i
        assert st["rounds"] >= 1


def test_thin_draft_quantized_lossless():
    mc, base, draft, cfg = _setup(width=32, quant="int8")
    from flowspec_tpu.ops.quant import Int8Tensor
    assert isinstance(draft.w_out, Int8Tensor)   # w_out quantizes too
    assert draft_view(draft, mc).hidden_size == 32   # view sees through q
    eng = SpecEngine(base, draft, cfg)
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 32, 10).tolist()
    ar, _ = eng.generate_ar(prompt, max_new_tokens=16, eos_token_id=-1)
    out, _ = eng.generate(prompt, max_new_tokens=16, eos_token_id=-1)
    assert out == ar


def test_thin_draft_fused_and_stochastic():
    mc, base, draft, cfg = _setup(width=32)
    eng = SpecEngine(base, draft, cfg)
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, 32, 8).tolist()
    ar, _ = eng.generate_ar(prompt, max_new_tokens=18, eos_token_id=-1)
    out, _ = eng.generate_fused(prompt, max_new_tokens=18, eos_token_id=-1)
    assert out == ar
    # stochastic path: runs and emits the budget (distributional law is
    # pinned by test_posterior; here we exercise the thin shapes)
    cfg1 = dataclasses.replace(cfg, sampling=SamplingConfig(temperature=1.0))
    eng1 = SpecEngine(base, draft, cfg1)
    out1, _ = eng1.generate(prompt, max_new_tokens=12, eos_token_id=-1)
    assert len(out1) == len(prompt) + 12


def test_thin_draft_checkpoint_roundtrip(tmp_path):
    """save_params/load_params carry the optional w_out (None and present)."""
    from flowspec_tpu.models.checkpoint import load_params, save_params
    mc, base, draft, cfg = _setup(width=32)
    d = str(tmp_path / "thin")
    save_params(draft, d)
    back = load_params(d)
    for f in ("fc_w", "w_out", "wq", "w_down"):
        np.testing.assert_array_equal(np.asarray(getattr(back, f)),
                                      np.asarray(getattr(draft, f)))
    full = init_eagle_params(jax.random.key(3), mc, embed=base.embed,
                             dtype=jnp.float32)
    d2 = str(tmp_path / "full")
    save_params(full, d2)
    assert load_params(d2).w_out is None


def test_thin_draft_npz_loader(tmp_path):
    """tools/train_bench_draft.py save format -> load_thin_draft."""
    from flowspec_tpu.draft.eagle import load_thin_draft
    mc, base, draft, cfg = _setup(width=32)
    fields = ("fc_w", "fc_b", "wq", "wk", "wv", "wo",
              "w_gate", "w_up", "w_down", "post_ln", "w_out")
    path = str(tmp_path / "d.npz")
    np.savez_compressed(path, **{
        f: np.asarray(getattr(draft, f)).astype(np.float16)
        for f in fields})
    back = load_thin_draft(path, base.embed, jnp.float32)
    assert back.w_out.shape == draft.w_out.shape
    eng = SpecEngine(base, back, cfg)
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 32, 8).tolist()
    ar, _ = eng.generate_ar(prompt, max_new_tokens=12, eos_token_id=-1)
    out, _ = eng.generate(prompt, max_new_tokens=12, eos_token_id=-1)
    assert out == ar


def test_batch_tree_adaptation():
    """adapt_tree_for_batch applies the measured table and stays lossless
    (greedy outputs are tree-size-invariant)."""
    from flowspec_tpu.runtime.batched import (
        BatchedSpecEngine, adapt_tree_for_batch,
    )
    tc = TreeConfig()                     # reference defaults: 80 nodes
    assert adapt_tree_for_batch(tc, 1) is tc
    assert adapt_tree_for_batch(tc, 2).total_tokens == 47
    assert adapt_tree_for_batch(tc, 4).total_tokens == 31
    small = TreeConfig(top_k=5, depth=3, total_tokens=14, node_cap=24,
                       leaf_cap=24, depth_cap=8)
    assert adapt_tree_for_batch(small, 4) is small   # already under target

    mc, base, draft, cfg = _setup(width=32)
    big = dataclasses.replace(
        cfg, tree=dataclasses.replace(cfg.tree, total_tokens=60,
                                      node_cap=80, leaf_cap=80))
    eng = BatchedSpecEngine(base, draft, big, batch_size=4)
    assert eng.cfg.tree.total_tokens == 31           # adapted
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, 32, 8 + i).tolist() for i in range(4)]
    refs = [eng.generate_ar(p, max_new_tokens=10, eos_token_id=-1)[0]
            for p in prompts]
    outs, _ = eng.generate_batch(prompts, max_new_tokens=10,
                                 eos_token_id=-1)
    assert outs == refs


def test_score_temperature_reshapes_tree_losslessly():
    """TreeConfig.score_temperature: per-node proposal sets are invariant
    (top-k order survives logit scaling), the node budget shifts toward
    depth as tau drops, and greedy output stays exactly AR."""
    from flowspec_tpu.draft.beam import topk_generate
    from flowspec_tpu.models.kv_cache import init_kv_cache
    mc, base, draft, cfg = _setup(width=32)

    def tree_at(tau):
        tc = dataclasses.replace(cfg.tree, depth=4, depth_cap=8,
                                 total_tokens=14, node_cap=24, leaf_cap=24,
                                 score_temperature=tau)
        cache = init_kv_cache(1, 1, 2, 64, mc.head_dim_, jnp.float32)
        root_h = jax.random.normal(jax.random.key(3),
                                   (mc.hidden_size,), jnp.float32)
        tree, _, _ = topk_generate(draft, base.lm_head, cache,
                                   jnp.asarray(5, jnp.int32), root_h,
                                   tc, mc)
        return tree

    t1 = tree_at(1.0)
    t01 = tree_at(0.1)
    # same node count; the root's children (depth-1 tokens) are drawn from
    # the same per-row top-k set
    assert int(t1.n_nodes) == int(t01.n_nodes)
    d1 = np.asarray(t1.depth)[:int(t1.n_nodes)]
    d01 = np.asarray(t01.depth)[:int(t01.n_nodes)]
    # sharpened scores allocate the budget deeper
    assert d01.max() >= d1.max()
    assert d01.mean() > d1.mean()

    # losslessness end-to-end at tau 0.1
    tc = dataclasses.replace(cfg.tree, score_temperature=0.1)
    eng = SpecEngine(base, draft, dataclasses.replace(cfg, tree=tc))
    rng = np.random.default_rng(6)
    prompt = rng.integers(0, 32, 9).tolist()
    ar, _ = eng.generate_ar(prompt, max_new_tokens=16, eos_token_id=-1)
    out, _ = eng.generate(prompt, max_new_tokens=16, eos_token_id=-1)
    assert out == ar
