"""Pruning + merging vs oracle (ref pipeline_utils.py:944-1303)."""

import numpy as np
import jax.numpy as jnp

from tests.helpers import (
    CAPS, to_token_tree, retrieve_rows,
    j_pruning_info as compute_pruning_info, j_prune_tree as prune_tree,
    j_merge_trees as merge_trees, j_kv_keep as kv_keep_positions,
)
from tests.oracle import (
    NaiveTree, random_tree, pruning_info as np_pruning_info,
    prune as np_prune, merge as np_merge,
)


def _tree_equal(tt, nt: NaiveTree):
    n = nt.n
    assert int(tt.n_nodes) == n
    assert np.asarray(tt.tokens)[:n].tolist() == nt.tokens.tolist()
    assert np.asarray(tt.parents)[:n].tolist() == nt.parents.tolist()
    assert np.asarray(tt.depth)[:n].tolist() == nt.depth().tolist()
    ref_rows = [[int(x) for x in row if x >= 0] for row in nt.retrieve()]
    assert retrieve_rows(tt) == ref_rows


def test_prune_matches_oracle():
    rng = np.random.default_rng(10)
    n_trunc = n_keep = 0
    for trial in range(40):
        t = random_tree(rng, int(rng.integers(3, 60)), vocab=12)
        tt = to_token_tree(t)
        ri = t.retrieve()
        best = int(rng.integers(ri.shape[0]))
        path_len = int((ri[best] >= 0).sum())
        accept_len = int(rng.integers(1, path_len + 1))
        sampled = int(rng.integers(12))

        ref_trunc, ref_root, ref_kept = np_pruning_info(
            t, best, accept_len, sampled)
        info = compute_pruning_info(
            tt, jnp.asarray(best), jnp.asarray(accept_len),
            jnp.asarray(sampled))
        assert bool(info.truncate) == ref_trunc, (trial, ref_trunc)
        if ref_trunc:
            n_trunc += 1
            continue
        n_keep += 1
        assert int(info.new_root) == ref_root
        got_kept = [int(x) for x in np.asarray(info.kept_old_ids)
                    if x >= 0]
        assert got_kept == ref_kept
        # accepted path = first accept_len nodes of best path
        acc = [int(x) for x in np.asarray(info.accepted_path) if x >= 0]
        assert acc == [int(x) for x in ri[best, :accept_len]]

        ref_new = np_prune(t, ref_root, ref_kept)
        got_new = prune_tree(tt, info)
        _tree_equal(got_new, ref_new)
    assert n_trunc > 3 and n_keep > 3   # both branches exercised


def test_kv_keep_positions():
    rng = np.random.default_rng(11)
    for trial in range(20):
        t = random_tree(rng, 30, vocab=8)
        tt = to_token_tree(t)
        ri = t.retrieve()
        best = int(rng.integers(ri.shape[0]))
        path_len = int((ri[best] >= 0).sum())
        accept_len = int(rng.integers(1, path_len + 1))
        sampled = int(rng.integers(8))
        ref_trunc, ref_root, ref_kept = np_pruning_info(
            t, best, accept_len, sampled)
        if ref_trunc:
            continue
        info = compute_pruning_info(tt, jnp.asarray(best),
                                    jnp.asarray(accept_len),
                                    jnp.asarray(sampled))
        offset = 100
        kv_in_tree = 17    # only first 17 tree nodes are in this stage's cache
        src, n_src = kv_keep_positions(info, jnp.asarray(offset),
                                       jnp.asarray(kv_in_tree), 64)
        # reference semantics: accepted path first, then kept ids < kv_in_tree
        ref_positions = [x + offset for x in ri[best, :accept_len]] + \
            [k + offset for k in ref_kept if k < kv_in_tree]
        assert int(n_src) == len(ref_positions)
        assert np.asarray(src)[:len(ref_positions)].tolist() == ref_positions


def test_merge_matches_oracle():
    rng = np.random.default_rng(12)
    for trial in range(30):
        root_tok = 3
        # sizes bounded so t1+t2 can never exceed node_cap=64 (no spill here;
        # spill behavior is covered by test_merge_capacity_spill)
        t1 = random_tree(rng, int(rng.integers(2, 32)), vocab=10)
        t2 = random_tree(rng, int(rng.integers(2, 32)), vocab=10)
        t1.tokens[0] = root_tok
        t2.tokens[0] = root_tok
        ref_merged, ref_map = np_merge(t1, t2)
        res = merge_trees(to_token_tree(t1), to_token_tree(t2))
        got = res.tree
        assert int(got.n_nodes) == ref_merged.n
        assert np.asarray(got.tokens)[:ref_merged.n].tolist() == \
            ref_merged.tokens.tolist()
        assert np.asarray(got.parents)[:ref_merged.n].tolist() == \
            ref_merged.parents.tolist()
        got_map = np.asarray(res.map2_to_merged)
        for i in range(t2.n):
            assert int(got_map[i]) == ref_map[i]
        # retrieve of merged tree consistent with recomputed leaves
        ref_rows = [[int(x) for x in row if x >= 0]
                    for row in ref_merged.retrieve()]
        assert retrieve_rows(got) == ref_rows


def test_merge_identical_trees_is_noop():
    rng = np.random.default_rng(13)
    t = random_tree(rng, 25, vocab=10)
    tt = to_token_tree(t)
    res = merge_trees(tt, tt)
    assert int(res.n_appended) == 0
    assert int(res.tree.n_nodes) == t.n
    _tree_equal(res.tree, t)


def test_merge_capacity_spill():
    """Overflow: appended nodes beyond node_cap are spilled, best-score kept,
    and the result stays ancestor-closed."""
    rng = np.random.default_rng(14)
    cap = 32
    t1 = random_tree(rng, 20, vocab=6)
    t2 = random_tree(rng, 30, vocab=6)
    t2.tokens[0] = t1.tokens[0]
    tt1 = to_token_tree(t1, node_cap=cap, leaf_cap=cap)
    tt2 = to_token_tree(t2, node_cap=cap, leaf_cap=cap)
    res = merge_trees(tt1, tt2)
    n = int(res.tree.n_nodes)
    assert n <= cap
    parents = np.asarray(res.tree.parents)[:n]
    assert parents[0] == -1 and (parents[1:] >= 0).all()
    assert (parents[1:] < np.arange(1, n)).all()   # topological order kept
