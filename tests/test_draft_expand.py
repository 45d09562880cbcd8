"""Incremental beam expansion (ref expand_last, eagle/cnets.py:1439-1708).

Invariants (the reference asserts these at :1650-1676): the expanded tree
contains the previously selected node set verbatim, and merging it onto the
old tree appends only new nodes whose parents are already present.
"""

import numpy as np
import jax
import jax.numpy as jnp

from flowspec_tpu.config import ModelConfig, TreeConfig
from flowspec_tpu.draft.eagle import init_eagle_params, draft_context_forward
from flowspec_tpu.draft.beam import topk_generate, expand_tree
from flowspec_tpu.models.kv_cache import init_kv_cache
from flowspec_tpu.models.llama import init_llama_params
from flowspec_tpu.tree.merge import merge_trees


def test_expand_superset_and_merge():
    mc = ModelConfig.tiny(vocab_size=64, n_layers=1)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    tc = TreeConfig(top_k=6, depth=3, total_tokens=16, expand_tokens=12,
                    expand_depth=2, node_cap=64, leaf_cap=48, depth_cap=12,
                    chunk_len=8)
    params = init_llama_params(jax.random.key(0), mc, dtype=jnp.float32)
    draft = init_eagle_params(jax.random.key(1), mc, embed=params.embed,
                              dtype=jnp.float32)

    max_levels = tc.depth + tc.expand_depth
    cache = init_kv_cache(1, 1, mc.num_key_value_heads,
                          128 + max_levels * tc.top_k, mc.head_dim_,
                          jnp.float32)
    # seed a tiny draft context
    rng = np.random.default_rng(0)
    ctx_t = jnp.asarray(rng.integers(0, 64, 8), jnp.int32)
    ctx_h = jnp.asarray(rng.normal(size=(1, 8, mc.hidden_size)), jnp.float32)
    out, cache = draft_context_forward(draft, cache, ctx_t, ctx_h,
                                       jnp.asarray(0), jnp.asarray(8), mc)
    root_hidden = out[0, 7]
    root = jnp.asarray(5, jnp.int32)

    tree, st, cache = topk_generate(draft, params.lm_head, cache, root,
                                    root_hidden, tc, mc)
    n1 = int(tree.n_nodes)
    assert n1 == tc.total_tokens + 1

    tree2, st2, cache = expand_tree(draft, params.lm_head, cache, st, root,
                                    tc, mc, extra_depth=tc.expand_depth,
                                    expand_size=tc.expand_tokens)
    n2 = int(tree2.n_nodes)
    # superset: old selection force-included, plus up to expand_tokens new
    assert n1 <= n2 <= n1 + tc.expand_tokens
    assert n2 > n1, "expansion added nothing"

    res = merge_trees(tree, tree2)
    m = res.tree
    assert int(res.n_appended) == n2 - n1
    # old nodes unchanged in the merged tree (reference invariant)
    assert np.asarray(m.tokens)[:n1].tolist() == \
        np.asarray(tree.tokens)[:n1].tolist()
    assert np.asarray(m.parents)[:n1].tolist() == \
        np.asarray(tree.parents)[:n1].tolist()
    # appended parents precede their children
    nm = int(m.n_nodes)
    par = np.asarray(m.parents)[:nm]
    assert (par[1:] < np.arange(1, nm)).all()


def test_expand_scores_consistent():
    """Candidate scores must be monotone along paths after expansion."""
    mc = ModelConfig.tiny(vocab_size=32, n_layers=1)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    tc = TreeConfig(top_k=4, depth=2, total_tokens=8, expand_tokens=8,
                    expand_depth=2, node_cap=32, leaf_cap=32, depth_cap=10,
                    chunk_len=4)
    params = init_llama_params(jax.random.key(2), mc, dtype=jnp.float32)
    draft = init_eagle_params(jax.random.key(3), mc, embed=params.embed,
                              dtype=jnp.float32)
    max_levels = tc.depth + tc.expand_depth
    cache = init_kv_cache(1, 1, mc.num_key_value_heads,
                          64 + max_levels * tc.top_k, mc.head_dim_,
                          jnp.float32)
    ctx_t = jnp.asarray([1, 2, 3, 4], jnp.int32)
    ctx_h = jnp.ones((1, 4, mc.hidden_size), jnp.float32) * 0.1
    out, cache = draft_context_forward(draft, cache, ctx_t, ctx_h,
                                       jnp.asarray(0), jnp.asarray(4), mc)
    tree, st, cache = topk_generate(draft, params.lm_head, cache,
                                    jnp.asarray(1, jnp.int32), out[0, 3],
                                    tc, mc)
    tree2, _, _ = expand_tree(draft, params.lm_head, cache, st,
                              jnp.asarray(1, jnp.int32), tc, mc,
                              extra_depth=tc.expand_depth,
                              expand_size=tc.expand_tokens)
    for t in (tree, tree2):
        n = int(t.n_nodes)
        sc = np.asarray(t.scores)[:n]
        par = np.asarray(t.parents)[:n]
        for i in range(1, n):
            assert sc[i] <= sc[par[i]] + 1e-5


def test_beam_hidden_is_a_pure_path_function():
    """A beam node's draft-output hidden depends only on its root->node
    token path (the K-wide masked beam forward equals a 1-wide sequential
    chain recompute). This is the property that makes persisting per-node
    draft hiddens across pipedec turns EXACTLY equivalent to the
    reference's per-turn re-embedding of the pruned tree
    (eagle/cnets.py:1711-1957) — re-embedding recomputes the same function
    of the same path."""
    mc = ModelConfig.tiny(vocab_size=64, n_layers=1)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    tc = TreeConfig(top_k=6, depth=3, total_tokens=16, expand_tokens=12,
                    expand_depth=2, node_cap=64, leaf_cap=48, depth_cap=12,
                    chunk_len=8)
    params = init_llama_params(jax.random.key(2), mc, dtype=jnp.float32)
    draft = init_eagle_params(jax.random.key(3), mc, embed=params.embed,
                              dtype=jnp.float32)
    max_levels = tc.depth + tc.expand_depth
    cache = init_kv_cache(1, 1, mc.num_key_value_heads,
                          128 + max_levels * tc.top_k, mc.head_dim_,
                          jnp.float32)
    rng = np.random.default_rng(4)
    ctx_t = jnp.asarray(rng.integers(0, 64, 8), jnp.int32)
    ctx_h = jnp.asarray(rng.normal(size=(1, 8, mc.hidden_size)), jnp.float32)
    out, cache0 = draft_context_forward(draft, cache, ctx_t, ctx_h,
                                        jnp.asarray(0), jnp.asarray(8), mc)
    root_hidden = out[0, 7]
    root = jnp.asarray(5, jnp.int32)

    tree, st, _ = topk_generate(draft, params.lm_head, cache0, root,
                                root_hidden, tc, mc)

    par = np.asarray(st.cand_parents)
    toks = np.asarray(st.cand_tokens)
    for row in range(3):
        # st.hidden[row] is the draft output of frontier node `row`'s PARENT
        node = int(par[int(np.asarray(st.flat_ids)[row])])
        chain = []
        while node >= 0:
            chain.append(int(toks[node]))
            node = int(par[node])
        chain = chain[::-1]
        assert len(chain) == tc.depth, chain
        h, c = root_hidden, cache0
        for tok in chain:
            o, c = draft_context_forward(
                draft, c, jnp.asarray([tok], jnp.int32), h[None, None, :],
                c.length, jnp.asarray(1), mc)
            h = o[0, 0]
        np.testing.assert_allclose(np.asarray(h),
                                   np.asarray(st.hidden[row]),
                                   rtol=2e-3, atol=2e-3)
