"""Graft a freshly drafted tree onto the pruned in-flight tree.

Reference: `merge_two_tree` (pipeline_utils.py:1176-1303) — a CPU/NumPy
path-keyed dict dedup. Here the dedup is a depth-synchronous vectorized match:
two nodes represent the same token path iff their parents match and their
tokens are equal, so a scan over depth levels resolves the full node mapping
with (N1 x N2) comparisons per level — exact (no hashing), jit-compatible,
and O(N^2 * D) bitwise work on <=node_cap-sized operands.

Capacity: if tree1 + appended nodes exceed node_cap, the lowest-score appended
nodes are spilled. Cumulative-log-prob scores are monotone along paths, so a
top-score cut of the appended set stays ancestor-closed (same argument as
build_tree's top-N selection).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from flowspec_tpu.tree.build import finalize_tree
from flowspec_tpu.tree.types import TokenTree


class MergeResult(NamedTuple):
    tree: TokenTree
    n_appended: jax.Array     # () int32 — nodes appended to tree1
    map2_to_merged: jax.Array  # (N,) int32 — tree2 node id -> merged node id


def merge_trees(tree1: TokenTree, tree2: TokenTree) -> MergeResult:
    """Both trees must share the same root token (ref merges trees whose roots
    are the same sampled token). Appended nodes keep BFS-compatible order:
    they are placed after tree1's nodes in tree2-BFS order, so every parent
    still precedes its children (parents are either matched tree1 nodes or
    earlier appended nodes)."""
    n = tree1.node_cap
    assert tree2.node_cap == n
    valid1 = tree1.valid()
    valid2 = tree2.valid()

    # --- depth-synchronous path matching: map2[i] = tree1 node for tree2's i.
    def level_step(map2, d):
        # Candidate match matrix: tree2 node i matches tree1 node j iff their
        # parents are mapped to each other and tokens agree.
        p2 = tree2.parents                                  # (N,)
        mapped_p2 = jnp.where(p2 >= 0, map2[jnp.clip(p2, 0, n - 1)], -2)
        pm = mapped_p2[:, None] == jnp.where(
            tree1.parents >= 0, tree1.parents, -2)[None, :]  # (N2, N1)
        tm = tree2.tokens[:, None] == tree1.tokens[None, :]
        at_d = (tree2.depth == d) & valid2
        cand = pm & tm & at_d[:, None] & valid1[None, :]
        hit = jnp.any(cand, axis=1)
        j = jnp.argmax(cand, axis=1).astype(jnp.int32)
        new_map2 = jnp.where(at_d, jnp.where(hit, j, -1), map2)
        return new_map2, None

    map2 = jnp.full((n,), -1, jnp.int32)
    map2 = map2.at[0].set(0)    # roots coincide
    map2, _ = jax.lax.scan(level_step, map2,
                           jnp.arange(1, tree1.depth_cap, dtype=jnp.int32))

    # --- select appended nodes (unmatched, capacity-capped by score).
    unmatched = valid2 & (map2 < 0)
    n1 = tree1.n_nodes
    capacity = (n - n1).astype(jnp.int32)
    # Rank unmatched nodes by score (desc); keep top `capacity`.
    scores2 = jnp.where(unmatched, tree2.scores, -jnp.inf)
    rank_order = jnp.argsort(-scores2, stable=True)          # best first
    rank_of = jnp.zeros((n,), jnp.int32).at[rank_order].set(
        jnp.arange(n, dtype=jnp.int32))
    appended = unmatched & (rank_of < capacity)
    # Ancestor-closure safety: drop nodes whose parent is unmatched-and-dropped.
    for _ in range(4):   # score monotonicity makes >1 iteration a no-op
        p2c = jnp.clip(tree2.parents, 0, n - 1)
        parent_ok = (map2[p2c] >= 0) | appended[p2c]
        parent_ok = jnp.where(tree2.parents >= 0, parent_ok, True)
        appended = appended & parent_ok
    n_app = jnp.sum(appended).astype(jnp.int32)

    # Merged id of appended tree2 node = n1 + (# appended nodes before it).
    app_pos = jnp.cumsum(appended.astype(jnp.int32)) - 1
    merged_id_app = n1 + app_pos
    map2m = jnp.where(map2 >= 0, map2,
                      jnp.where(appended, merged_id_app, -1)).astype(jnp.int32)

    # --- build merged arrays by per-position select (no scatter collisions).
    app_order = jnp.argsort(~appended, stable=True)  # appended tree2-ids first
    q = jnp.arange(n, dtype=jnp.int32)
    src2 = app_order[jnp.clip(q - n1, 0, n - 1)]     # tree2 id for merged slot q
    in_app = (q >= n1) & (q < n1 + n_app)

    src_par = map2m[jnp.clip(tree2.parents[src2], 0, n - 1)]
    tokens_new = jnp.where(q < n1, tree1.tokens,
                           jnp.where(in_app, tree2.tokens[src2], -1))
    parents_new = jnp.where(q < n1, tree1.parents,
                            jnp.where(in_app, src_par, -1))
    scores_new = jnp.where(q < n1, tree1.scores,
                           jnp.where(in_app, tree2.scores[src2], -jnp.inf))

    n_nodes = n1 + n_app
    merged = finalize_tree(tokens_new, parents_new, scores_new, n_nodes,
                           tree1.leaf_cap, tree1.depth_cap)
    return MergeResult(tree=merged, n_appended=n_app, map2_to_merged=map2m)
