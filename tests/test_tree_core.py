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
