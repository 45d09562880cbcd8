"""Tree library vs the NumPy oracle (reference semantics).

Covers: ancestor matrix, depths, retrieve construction, partition lengths,
cum depths — the pure structural algebra (ref pipeline_utils.py:673-740,
eagle/cnets.py:901-989).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.helpers import (
    CAPS, to_token_tree, retrieve_rows,
    j_ancestor as ancestor_matrix, j_depths as depths_from_parents,
    j_partition as partition_lengths, j_cum_depths as retrieve_cum_depths,
    j_split as split_close_equal,
)
from tests.oracle import NaiveTree, random_tree, partition_lengths as np_partition, cum_depths as np_cum_depths


@pytest.fixture(scope="module")
def trees():
    rng = np.random.default_rng(0)
    out = [
        NaiveTree([7], [-1]),                       # root only
        NaiveTree([7, 1, 2], [-1, 0, 0]),           # star
        NaiveTree([7, 1, 2, 3], [-1, 0, 1, 2]),     # chain
    ]
    for n in (5, 17, 40, 63):
        out.append(random_tree(rng, n))
    return out


def test_ancestor_matrix(trees):
    for t in trees:
        tt = to_token_tree(t)
        anc = np.asarray(ancestor_matrix(tt.parents, tt.depth_cap, tt.valid()))
        ref = t.ancestor_mask()
        assert (anc[:t.n, :t.n] == ref).all()
        assert not anc[t.n:].any() and not anc[:, t.n:].any()


def test_depths(trees):
    for t in trees:
        tt = to_token_tree(t)
        d = np.asarray(depths_from_parents(tt.parents, tt.depth_cap))
        assert (d[:t.n] == t.depth()).all()
        # finalize_tree's depth (via ancestor matrix) must agree too
        assert (np.asarray(tt.depth)[:t.n] == t.depth()).all()


def test_retrieve(trees):
    for t in trees:
        tt = to_token_tree(t)
        got = retrieve_rows(tt)
        ref = t.retrieve()
        assert int(tt.n_leaves) == ref.shape[0]
        ref_rows = [[int(x) for x in row if x >= 0] for row in ref]
        assert got == ref_rows


def test_candidates(trees):
    for t in trees:
        tt = to_token_tree(t)
        cand = np.asarray(tt.candidates())
        ri = t.retrieve()
        for r, row in enumerate(ri):
            for d, node in enumerate(row):
                want = t.tokens[node] if node >= 0 else -1
                assert cand[r, d] == want


def test_split_close_equal():
    for total in range(1, 40):
        for n in range(1, 8):
            if total <= n:
                continue
            got = np.asarray(split_close_equal(jnp.asarray(total), n))
            base, rem = divmod(total, n)
            ref = [base + 1 if i < rem else base for i in range(n)]
            ref.reverse()
            assert got.tolist() == ref
            assert got.sum() == total


def test_partition_lengths():
    for n_tokens in (20, 63, 65, 81, 100):
        for stages in (2, 4):
            for chunk in (8, 16):
                lens, n_chunks = partition_lengths(
                    jnp.asarray(n_tokens), stages, chunk, CAPS["node_cap"] // 4)
                ref = np_partition(n_tokens, stages, chunk)
                got = np.asarray(lens)[:int(n_chunks)].tolist()
                assert got == ref, (n_tokens, stages, chunk)
                assert np.asarray(lens)[int(n_chunks):].sum() == 0


def test_cum_depths(trees):
    for t in trees:
        if t.n < 6:
            continue
        tt = to_token_tree(t)
        lens = np_partition(t.n, 4, 8)
        lens_arr = jnp.zeros((8,), jnp.int32).at[:len(lens)].set(
            jnp.asarray(lens, jnp.int32))
        got = np.asarray(retrieve_cum_depths(tt.retrieve, lens_arr))
        ref = np_cum_depths(t.retrieve(), lens)
        L = ref.shape[1]
        assert (got[:len(lens), :L] == ref).all()


def test_build_tree_sort_score_order():
    """sort_score (ref eagle/cnets.py:856-866): nodes laid out by descending
    cumulative score, ancestors still before descendants, same node set as
    BFS order."""
    from flowspec_tpu.tree.build import build_tree

    # flat candidate pool: 2 levels of a k=3 beam (3 + 9 candidates)
    cand_tokens = jnp.asarray([5, 6, 7] + [8, 9, 10, 11, 12, 13, 14, 15, 16],
                              jnp.int32)
    cand_scores = jnp.asarray([-1.0, -3.0, -2.0,
                               -1.5, -4.0, -5.0,   # children of cand 0
                               -6.0, -7.0, -8.0,   # children of cand 1
                               -2.5, -9.0, -10.0], jnp.float32)
    cand_parents = jnp.asarray([-1, -1, -1, 0, 0, 0, 1, 1, 1, 2, 2, 2],
                               jnp.int32)
    sel = jnp.asarray([True] * 3 + [True, False, False,
                       False, False, False, True, False, False])
    root = jnp.asarray(99, jnp.int32)

    bfs = build_tree(cand_tokens, cand_scores, cand_parents, sel, root,
                     16, 16, 8, sort_score=False)
    ss = build_tree(cand_tokens, cand_scores, cand_parents, sel, root,
                    16, 16, 8, sort_score=True)

    n = int(ss.n_nodes)
    assert n == int(bfs.n_nodes) == 6
    tok_ss = np.asarray(ss.tokens)[:n]
    tok_bfs = np.asarray(bfs.tokens)[:n]
    assert sorted(tok_ss.tolist()) == sorted(tok_bfs.tolist())
    # descending score among non-root nodes
    sc = np.asarray(ss.scores)[1:n]
    assert (np.diff(sc) <= 1e-6).all(), sc
    # expected order: root, then -1.0(tok5), -1.5(tok8), -2.0(tok7),
    # -2.5(tok14), -3.0(tok6)
    assert tok_ss.tolist() == [99, 5, 8, 7, 14, 6]
    # parents precede children
    par = np.asarray(ss.parents)[:n]
    assert all(par[i] < i for i in range(1, n))
    # depths consistent: tok8's parent is tok5, tok14's parent is tok7
    assert tok_ss[par[2]] == 5
    assert tok_ss[par[4]] == 7


def test_queue_appended_split():
    from flowspec_tpu.parallel.pipeline import _queue_appended

    lens = jnp.zeros((8,), jnp.int32).at[0].set(6).at[1].set(6)
    nch = jnp.asarray(2, jnp.int32)

    # uncapped: one entry
    l2, n2, ok = _queue_appended(lens, nch, jnp.asarray(13), -1, 8)
    assert bool(ok) and int(n2) == 3
    assert np.asarray(l2).tolist() == [6, 6, 13, 0, 0, 0, 0, 0]

    # capped at 5: 5+5+3
    l2, n2, ok = _queue_appended(lens, nch, jnp.asarray(13), 5, 8)
    assert bool(ok) and int(n2) == 5
    assert np.asarray(l2).tolist() == [6, 6, 5, 5, 3, 0, 0, 0]

    # overflow: would need 3 entries but only 2 slots free
    l2, n2, ok = _queue_appended(lens, nch, jnp.asarray(13), 5, 4)
    assert not bool(ok) and int(n2) == 2
    assert np.asarray(l2).tolist() == np.asarray(lens).tolist()

    # nothing to append
    l2, n2, ok = _queue_appended(lens, nch, jnp.asarray(0), 5, 8)
    assert not bool(ok) and int(n2) == 2
