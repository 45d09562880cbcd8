"""Model layer: HF parity, KV increments, tree-mask consistency.

The tree-mask test is the load-bearing one: a tree-chunk forward must produce,
at every node, exactly the hidden state a plain causal forward of that node's
root->node token path would produce (this is the defining property of
tree-masked attention, ref eagle/modeling_llama_kv.py:915-919).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowspec_tpu.config import ModelConfig
from flowspec_tpu.models import (
    init_kv_cache, init_llama_params, llama_forward, final_hidden,
    embed_tokens, lm_head_logits, prefill_bias, tree_bias,
)
from flowspec_tpu.models.llama import LlamaParams, LlamaLayerParams
from flowspec_tpu.tree.types import tree_attention_bias
from tests.helpers import to_token_tree
from tests.oracle import random_tree

CFG = ModelConfig.tiny(vocab_size=128, n_layers=3)
S_MAX = 128


def _params(key=0, dtype=jnp.float32):
    return init_llama_params(jax.random.key(key), CFG, dtype=dtype)


def _causal_forward(params, tokens):
    """Single-shot causal forward -> (T, V) logits, (T, H) pre-norm hidden."""
    t = len(tokens)
    cache = init_kv_cache(CFG.num_hidden_layers, 1, CFG.num_key_value_heads,
                          S_MAX, CFG.head_dim_, jnp.float32)
    hidden = embed_tokens(params, jnp.asarray(tokens)[None])
    bias = prefill_bias(jnp.asarray(0), t, S_MAX)
    out, cache = llama_forward(params, cache, hidden,
                               jnp.arange(t, dtype=jnp.int32), bias,
                               jnp.asarray(0), CFG)
    logits = lm_head_logits(params, final_hidden(params, out, CFG))
    return np.asarray(logits[0]), np.asarray(out[0]), cache


def test_against_transformers():
    """Numerical parity with HF LlamaForCausalLM on random weights (fp32)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.num_key_value_heads,
        rms_norm_eps=CFG.rms_norm_eps, rope_theta=CFG.rope_theta,
        attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    # copy HF weights into stacked params
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    L = CFG.num_hidden_layers

    def stack(fmt, transpose=True):
        ws = [sd[fmt.format(i)] for i in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return jnp.asarray(np.stack(ws), jnp.float32)

    pre = "model.layers.{}."
    nq, nkv, d = (CFG.num_attention_heads, CFG.num_key_value_heads,
                  CFG.head_dim_)
    layers = LlamaLayerParams(
        wq=stack(pre + "self_attn.q_proj.weight"),
        wk=stack(pre + "self_attn.k_proj.weight"),
        wv=stack(pre + "self_attn.v_proj.weight"),
        wo=stack(pre + "self_attn.o_proj.weight"),
        bq=jnp.zeros((L, nq * d)), bk=jnp.zeros((L, nkv * d)),
        bv=jnp.zeros((L, nkv * d)),
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

    tokens = list(np.random.default_rng(0).integers(0, CFG.vocab_size, 17))
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    got, _, _ = _causal_forward(params, tokens)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_incremental_prefill_matches_single_shot():
    params = _params()
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, CFG.vocab_size, 24).tolist()
    ref_logits, ref_hidden, _ = _causal_forward(params, tokens)

    # chunked: 3 chunks of 8
    cache = init_kv_cache(CFG.num_hidden_layers, 1, CFG.num_key_value_heads,
                          S_MAX, CFG.head_dim_, jnp.float32)
    outs = []
    for c in range(3):
        chunk = jnp.asarray(tokens[c * 8:(c + 1) * 8])[None]
        start = jnp.asarray(c * 8)
        hidden = embed_tokens(params, chunk)
        bias = prefill_bias(start, 8, S_MAX)
        out, cache = llama_forward(params, cache, hidden,
                                   c * 8 + jnp.arange(8, dtype=jnp.int32),
                                   bias, start, CFG)
        cache = cache.with_length(jnp.asarray((c + 1) * 8))
        outs.append(np.asarray(out[0]))
    got_hidden = np.concatenate(outs)
    np.testing.assert_allclose(got_hidden, ref_hidden, rtol=2e-4, atol=2e-4)


def test_tree_forward_equals_path_forwards():
    """Every tree node's output == plain causal forward of its path."""
    params = _params(2)
    rng = np.random.default_rng(2)
    prefix = rng.integers(0, CFG.vocab_size, 9).tolist()
    t = random_tree(rng, 14, vocab=CFG.vocab_size)
    tt = to_token_tree(t, node_cap=16, leaf_cap=16, depth_cap=8)

    # prefill the prefix
    cache = init_kv_cache(CFG.num_hidden_layers, 1, CFG.num_key_value_heads,
                          S_MAX, CFG.head_dim_, jnp.float32)
    hidden = embed_tokens(params, jnp.asarray(prefix)[None])
    bias = prefill_bias(jnp.asarray(0), len(prefix), S_MAX)
    _, cache = llama_forward(params, cache, hidden,
                             jnp.arange(len(prefix), dtype=jnp.int32), bias,
                             jnp.asarray(0), CFG)
    cache = cache.with_length(jnp.asarray(len(prefix)))

    # tree forward in two chunks of 8 (exercises rectangular masks)
    anc_bias = tree_attention_bias(tt.parents, tt.depth_cap, tt.valid())
    node_out = np.zeros((t.n, CFG.hidden_size), np.float32)
    tree_base = len(prefix)
    for c0 in (0, 8):
        rows = jax.lax.dynamic_slice(anc_bias, (c0, 0), (8, 16))
        bias = tree_bias(rows, jnp.asarray(tree_base), jnp.asarray(c0), S_MAX)
        toks = jnp.asarray(np.asarray(tt.tokens)[c0:c0 + 8])[None]
        toks = jnp.where(toks >= 0, toks, 0)
        positions = tree_base + jnp.asarray(np.asarray(tt.depth)[c0:c0 + 8])
        hidden = embed_tokens(params, toks)
        out, cache = llama_forward(params, cache, hidden, positions, bias,
                                   jnp.asarray(tree_base + c0), CFG)
        n_here = min(8, t.n - c0) if t.n > c0 else 0
        if n_here > 0:
            node_out[c0:c0 + n_here] = np.asarray(out[0])[:n_here]

    # reference: per-path causal forward
    for leaf_row in t.retrieve():
        path = [x for x in leaf_row if x >= 0]
        toks = prefix + [t.tokens[n] for n in path]
        _, ref_hidden, _ = _causal_forward(params, toks)
        for depth_pos, node in enumerate(path):
            ref = ref_hidden[len(prefix) + depth_pos]
            np.testing.assert_allclose(
                node_out[node], ref, rtol=2e-4, atol=2e-4,
                err_msg=f"node {node} path {path}")


def test_kv_compact():
    params = _params(3)
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, CFG.vocab_size, 12).tolist()
    _, _, cache = _causal_forward(params, tokens)
    cache = cache.with_length(jnp.asarray(12))

    keep = [0, 1, 2, 5, 7]   # keep prefix 0-2, compact 5,7 to 3,4
    src = jnp.zeros((8,), jnp.int32).at[:2].set(jnp.asarray([5, 7]))
    cache2 = cache.compact(src, jnp.asarray(2), jnp.asarray(3))
    assert int(cache2.length) == 5
    k_old = np.asarray(cache.k)
    k_new = np.asarray(cache2.k)
    np.testing.assert_array_equal(k_new[:, :, :, :3], k_old[:, :, :, :3])
    np.testing.assert_array_equal(k_new[:, :, :, 3], k_old[:, :, :, 5])
    np.testing.assert_array_equal(k_new[:, :, :, 4], k_old[:, :, :, 7])


def test_tree_bias_masks_past_tree_region():
    """Columns at/after tree_base + node_cap hold stale KV from earlier
    rounds and must be -inf for EVERY query row — including node n_cap-1,
    whose self-bias (0) used to leak through the column clamp when the tree
    occupied its last slot (advisor finding r1-medium)."""
    from flowspec_tpu.tree.types import NEG_INF
    n_cap = 8
    tree_base = 5
    # full tree: a chain occupying all n_cap slots
    parents = jnp.asarray([-1, 0, 1, 2, 3, 4, 5, 6], jnp.int32)
    valid = jnp.ones((n_cap,), jnp.bool_)
    rows = tree_attention_bias(parents, 8, valid)      # (8, 8)
    bias = np.asarray(tree_bias(rows, jnp.asarray(tree_base),
                                jnp.asarray(0), 32))
    # committed context fully attendable
    assert (bias[:, :tree_base] == 0.0).all()
    # tree region follows the ancestor rows
    ref = np.asarray(rows)
    np.testing.assert_array_equal(bias[:, tree_base:tree_base + n_cap], ref)
    # everything past the tree region is masked for every row
    assert (bias[:, tree_base + n_cap:] <= NEG_INF).all()


def test_blocked_attention_matches_dense():
    """The length-aware blocked path (_attention_blocked: online-softmax over
    256-row KV blocks, dynamic trip count) must match the dense single-einsum
    path exactly — including when n_valid is far below the allocation, lands
    mid-block, and under a tree-style (non-causal) bias."""
    from flowspec_tpu.models.llama import _attention_blocked, attention

    rng = np.random.default_rng(11)
    b, nq, nkv, t, d = 1, 4, 2, 7, 16
    s_alloc = 1024
    q = jnp.asarray(rng.standard_normal((b, nq, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nkv, s_alloc, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nkv, s_alloc, d)), jnp.float32)

    for n_valid in (1, 5, 256, 300, 517):
        # random tree-ish mask over the valid region; every query row keeps
        # at least one live column; everything past n_valid is masked
        mask = rng.random((t, s_alloc)) < 0.5
        mask[:, 0] = True
        mask[:, n_valid:] = False
        bias = jnp.where(jnp.asarray(mask), 0.0, -1e9).astype(jnp.float32)
        dense = attention(q, k, v, bias, nq // nkv)   # no n_valid -> dense
        blocked = _attention_blocked(q, k, v, bias, nq // nkv,
                                     jnp.asarray(n_valid, jnp.int32))
        np.testing.assert_allclose(np.asarray(blocked), np.asarray(dense),
                                   rtol=2e-5, atol=2e-5)


def test_dyn_attn_gate_env(monkeypatch):
    """attention() routes through the blocked path only for large enough
    allocations (or when forced), and the result still matches dense."""
    from flowspec_tpu.models import llama as L

    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.standard_normal((1, 2, 3, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 512, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 512, 8)), jnp.float32)
    i = np.arange(3)[:, None]
    j = np.arange(512)[None, :]
    bias = jnp.where(jnp.asarray(j <= i + 100), 0.0, -1e9).astype(jnp.float32)

    dense = L.attention(q, k, v, bias, 1)
    monkeypatch.setenv("FLOWSPEC_DYN_ATTN", "1")
    forced = L.attention(q, k, v, bias, 1, n_valid=jnp.asarray(103))
    np.testing.assert_allclose(np.asarray(forced), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)
    # opted in: only large allocations take the blocked path
    assert not L._use_dyn_attn(512)
    assert L._use_dyn_attn(1024)
    # default (no env): routed by STATIC query width (r2 verdict #6) —
    # wide verify passes on large allocations take the blocked path, the
    # 1-row AR step (which lost its hardware A/B) keeps dense
    monkeypatch.delenv("FLOWSPEC_DYN_ATTN")
    assert not L._use_dyn_attn(1024)            # t=0 (AR-like)
    assert not L._use_dyn_attn(1024, t=1)
    assert L._use_dyn_attn(1024, t=L.DYN_ATTN_MIN_Q)
    assert not L._use_dyn_attn(512, t=96)       # small alloc: dense
    # force-off wins over any width
    monkeypatch.setenv("FLOWSPEC_DYN_ATTN", "0")
    assert not L._use_dyn_attn(2560, t=96)
