"""Construct a TokenTree from flat (token, score, parent) candidate arrays.

This is the jit-compatible equivalent of the post-processing half of
`Model.topK_genrate` (eagle/cnets.py:833-989): global top-N selection over all
beam candidates, BFS re-indexing, ancestor-mask/position construction, and
retrieve-indices (per-leaf root->leaf paths).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flowspec_tpu.tree.types import TokenTree, ancestor_matrix


def build_tree(
    cand_tokens: jax.Array,    # (M,) int32 — all beam candidates, flat
    cand_scores: jax.Array,    # (M,) float32 — cumulative log-probs
    cand_parents: jax.Array,   # (M,) int32 — flat candidate index of parent, -1 = root
    cand_valid: jax.Array,     # (M,) bool — candidate exists
    root_token: jax.Array,     # () int32 — the sampled token the tree hangs off
    num_select: int,           # select top-`num_select` candidates (ref total_tokens)
    node_cap: int,
    leaf_cap: int,
    depth_cap: int,
) -> TokenTree:
    """Select top-`num_select` candidates by score and assemble the tree.

    The beam guarantees score(child) <= score(parent) (scores are cumulative
    log-probs), so the selected set is ancestor-closed — same property the
    reference relies on for its searchsorted parent lookup
    (eagle/cnets.py:903-906). Ties could in principle cut a parent while
    keeping a child; like the reference we accept that risk (argsort is
    deterministic, and exact float ties across distinct tree nodes are
    vanishingly rare).
    """
    m = cand_tokens.shape[0]
    assert num_select <= m and num_select < node_cap

    masked_scores = jnp.where(cand_valid, cand_scores, -jnp.inf)
    # Top-`num_select` candidate flat-indices, then ascending index order ==
    # BFS order (level-major) so parents precede children.
    _, top_idx = jax.lax.top_k(masked_scores, num_select)
    top_idx = jnp.sort(top_idx)

    # invmap: flat candidate index -> node index (1-based; 0 is the root).
    invmap = jnp.full((m,), -1, jnp.int32)
    invmap = invmap.at[top_idx].set(jnp.arange(1, num_select + 1, dtype=jnp.int32))

    sel_tokens = cand_tokens[top_idx]
    sel_scores = cand_scores[top_idx]
    sel_parent_flat = cand_parents[top_idx]
    # Parent node index: -1 (root child) -> 0; otherwise remap via invmap.
    safe_pf = jnp.clip(sel_parent_flat, 0, m - 1)
    sel_parents = jnp.where(sel_parent_flat < 0, 0, invmap[safe_pf])

    n_nodes = jnp.asarray(num_select + 1, jnp.int32)
    pad_n = node_cap - (num_select + 1)
    tokens = jnp.concatenate([root_token[None].astype(jnp.int32), sel_tokens,
                              jnp.full((pad_n,), -1, jnp.int32)])
    parents = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sel_parents,
                               jnp.full((pad_n,), -1, jnp.int32)])
    scores = jnp.concatenate([jnp.zeros((1,), jnp.float32), sel_scores,
                              jnp.full((pad_n,), -jnp.inf, jnp.float32)])

    return finalize_tree(tokens, parents, scores, n_nodes, leaf_cap, depth_cap)


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
