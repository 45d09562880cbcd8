"""Construct a TokenTree from flat (token, score, parent) candidate arrays.

This is the jit-compatible equivalent of the post-processing half of
`Model.topK_genrate` (eagle/cnets.py:833-989): global top-N selection over all
beam candidates, BFS re-indexing, ancestor-mask/position construction, and
retrieve-indices (per-leaf root->leaf paths). Selection is mask-based so
`expand_last` (eagle/cnets.py:1439-1708) can force-include the previously
selected node set while topping up with new candidates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flowspec_tpu.tree.types import TokenTree, ancestor_matrix


def select_topn(cand_scores: jax.Array, cand_valid: jax.Array,
                num_select, force_include: jax.Array | None = None
                ) -> jax.Array:
    """(M,) bool — top-`num_select` valid candidates by score, plus everything
    in `force_include`. Cumulative log-prob scores are monotone along paths so
    the result is ancestor-closed (same tie caveat as the reference's plain
    top-k, eagle/cnets.py:841-846)."""
    m = cand_scores.shape[0]
    eligible = cand_valid
    if force_include is not None:
        eligible = eligible & ~force_include
    masked = jnp.where(eligible, cand_scores, -jnp.inf)
    order = jnp.argsort(-masked, stable=True)
    rank = jnp.zeros((m,), jnp.int32).at[order].set(
        jnp.arange(m, dtype=jnp.int32))
    sel = eligible & (rank < num_select) & (masked > -jnp.inf)
    if force_include is not None:
        sel = sel | (force_include & cand_valid)
    return sel


def build_tree(
    cand_tokens: jax.Array,    # (M,) int32 — all beam candidates, flat
    cand_scores: jax.Array,    # (M,) float32 — cumulative log-probs
    cand_parents: jax.Array,   # (M,) int32 — flat candidate index of parent, -1 = root
    selected: jax.Array,       # (M,) bool — ancestor-closed selection mask
    root_token: jax.Array,     # () int32 — the sampled token the tree hangs off
    node_cap: int,
    leaf_cap: int,
    depth_cap: int,
    sort_score: bool = False,
) -> TokenTree:
    """Assemble the tree from a selection mask. Selected candidates become
    nodes 1..n, ordered by ascending flat index (level-major == BFS) or, with
    `sort_score` (ref eagle/cnets.py:856-866), by descending cumulative score
    so the first chunk streamed holds the likeliest paths. Both orders keep
    parents before children: flat ids grow with beam level, and cumulative
    log-probs are monotone non-increasing along paths with score ties broken
    by flat id. Selections beyond node_cap-1 are dropped lowest-score first."""
    m = cand_tokens.shape[0]

    # Cap selection count at node_cap-1 (drop lowest scores).
    masked = jnp.where(selected, cand_scores, -jnp.inf)
    order = jnp.argsort(-masked, stable=True)
    rank = jnp.zeros((m,), jnp.int32).at[order].set(
        jnp.arange(m, dtype=jnp.int32))
    selected = selected & (rank < node_cap - 1)

    n_sel = jnp.sum(selected).astype(jnp.int32)
    if sort_score:
        # selected first by descending score (stable: ties keep flat order)
        sel_order = jnp.argsort(-jnp.where(selected, cand_scores, -jnp.inf),
                                stable=True)
    else:
        sel_order = jnp.argsort(~selected, stable=True)  # selected idx asc
    q = jnp.arange(node_cap, dtype=jnp.int32)
    src = sel_order[jnp.clip(q - 1, 0, m - 1)]          # candidate for node q
    in_sel = (q >= 1) & (q <= n_sel)

    # invmap: flat candidate index -> node index (0 = root for parent -1).
    invmap = jnp.full((m,), -1, jnp.int32)
    invmap = invmap.at[sel_order].set(
        jnp.where(jnp.arange(m) < n_sel,
                  jnp.arange(1, m + 1, dtype=jnp.int32), -1))

    pf = cand_parents[src]
    parents = jnp.where(pf < 0, 0, invmap[jnp.clip(pf, 0, m - 1)])
    tokens = jnp.where(in_sel, cand_tokens[src], -1)
    parents = jnp.where(in_sel, parents, -1)
    scores = jnp.where(in_sel, cand_scores[src], -jnp.inf)

    tokens = tokens.at[0].set(root_token.astype(jnp.int32))
    parents = parents.at[0].set(-1)
    scores = scores.at[0].set(0.0)

    return finalize_tree(tokens, parents, scores, n_sel + 1,
                         leaf_cap, depth_cap)


def finalize_tree(tokens: jax.Array, parents: jax.Array, scores: jax.Array,
                  n_nodes: jax.Array, leaf_cap: int, depth_cap: int) -> TokenTree:
    """Derive depth + retrieve from (tokens, parents) and pack a TokenTree."""
    node_cap = tokens.shape[0]
    valid = jnp.arange(node_cap, dtype=jnp.int32) < n_nodes
    anc = ancestor_matrix(parents, depth_cap, valid)
    depth = jnp.sum(anc, axis=1).astype(jnp.int32) - 1   # root -> 0
    depth = jnp.where(valid, depth, 0)
    retrieve, n_leaves = compute_retrieve(parents, depth, valid, anc,
                                          leaf_cap, depth_cap)
    return TokenTree(tokens=tokens, parents=parents, depth=depth,
                     scores=scores, retrieve=retrieve,
                     n_nodes=n_nodes, n_leaves=n_leaves)


def compute_retrieve(parents: jax.Array, depth: jax.Array, valid: jax.Array,
                     anc: jax.Array, leaf_cap: int, depth_cap: int):
    """(L, D) per-leaf root->leaf node paths in ascending-node-index leaf order.

    Reference equivalent: the leaf walk in eagle/cnets.py:947-961. A node is a
    leaf iff no valid node names it as parent. Path entry at tree-depth d is
    the unique ancestor j of the leaf with depth[j] == d.
    """
    node_cap = parents.shape[0]
    idx = jnp.arange(node_cap, dtype=jnp.int32)

    has_child = jnp.zeros((node_cap,), jnp.bool_)
    safe_parents = jnp.clip(parents, 0, node_cap - 1)
    has_child = has_child.at[safe_parents].max(valid & (parents >= 0))
    is_leaf = valid & ~has_child

    n_leaves = jnp.sum(is_leaf).astype(jnp.int32)
    # Stable-compact leaf node indices to the front (ascending node order).
    order = jnp.argsort(~is_leaf, stable=True)
    leaf_nodes = jnp.where(jnp.arange(node_cap) < n_leaves, idx[order], -1)
    leaf_nodes = leaf_nodes[:leaf_cap]

    # For each leaf l and depth d: the ancestor with that depth (or -1).
    safe_leaf = jnp.clip(leaf_nodes, 0, node_cap - 1)
    leaf_anc = anc[safe_leaf]                                # (L, N)
    # (L, D, N): ancestor at each depth. Built via equality broadcast.
    depth_eq = (depth[None, None, :] ==
                jnp.arange(depth_cap, dtype=jnp.int32)[None, :, None])  # (1,D,N)
    hit = leaf_anc[:, None, :] & depth_eq                     # (L, D, N)
    found = jnp.any(hit, axis=-1)
    entry = jnp.argmax(hit, axis=-1).astype(jnp.int32)
    retrieve = jnp.where(found, entry, -1)
    retrieve = jnp.where((leaf_nodes >= 0)[:, None], retrieve, -1)
    return retrieve, jnp.minimum(n_leaves, leaf_cap)
