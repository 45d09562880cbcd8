"""In-flight tree pruning after a chunk verdict.

Reference: `cal_pruning_info` (pipeline_utils.py:944-991),
`draft_stage_pruning` (:995-1056), `token_pruning` (:1076-1151).

The reference computes an explicit `left_indices` int vector (accepted path
node ids followed by surviving-subtree node ids, ascending) and broadcasts it
to every stage. Here the same information is a fixed-shape bool keep-mask plus
scalars, derived directly from the parents array: the surviving subtree is
exactly the descendants-or-self of the unique child of the last accepted node
whose token equals the newly sampled token ("the new root").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from flowspec_tpu.tree.build import finalize_tree
from flowspec_tpu.tree.types import TokenTree, ancestor_matrix


class PruneInfo(NamedTuple):
    truncate: jax.Array        # () bool — round ends, no surviving tree
    new_root: jax.Array        # () int32 — old node id of the new root (-1 if truncate)
    accept_len: jax.Array      # () int32 — accepted nodes incl. old root
    accepted_path: jax.Array   # (D,) int32 — old node ids, -1 padded
    keep: jax.Array            # (N,) bool — descendants-or-self of new_root
    kept_old_ids: jax.Array    # (N,) int32 — kept old ids ascending, -1 padded
    n_kept: jax.Array          # () int32


def compute_pruning_info(tree: TokenTree, best_leaf: jax.Array,
                         accept_len: jax.Array,
                         sampled_token: jax.Array) -> PruneInfo:
    """`accept_len` counts accepted nodes *including* the root (the reference
    passes accept_length+1 into cal_pruning_info, stage_ea_model.py:902-907).

    Truncate conditions (ref :957-978): the accepted path reached a leaf of
    the current tree, or no child of the last accepted node carries the newly
    sampled token.
    """
    node_cap = tree.node_cap
    depth_cap = tree.depth_cap
    d_idx = jnp.arange(depth_cap, dtype=jnp.int32)

    path = tree.retrieve[best_leaf]                        # (D,)
    accepted_path = jnp.where(d_idx < accept_len, path, -1)
    last_accepted = path[jnp.clip(accept_len - 1, 0, depth_cap - 1)]

    # Reached a leaf: no node at depth accept_len on the best path.
    at_leaf = (accept_len >= depth_cap) | \
              (tree.retrieve[best_leaf, jnp.clip(accept_len, 0, depth_cap - 1)] < 0)

    # The new root: child of last_accepted whose token == sampled_token.
    is_child = (tree.parents == last_accepted) & tree.valid()
    tok_match = is_child & (tree.tokens == sampled_token)
    has_match = jnp.any(tok_match)
    new_root = jnp.where(has_match,
                         jnp.argmax(tok_match).astype(jnp.int32), -1)

    truncate = at_leaf | ~has_match
    new_root = jnp.where(truncate, -1, new_root)

    anc = ancestor_matrix(tree.parents, depth_cap, tree.valid())
    keep = anc[:, jnp.clip(new_root, 0, node_cap - 1)] & (new_root >= 0)

    n_kept = jnp.sum(keep).astype(jnp.int32)
    order = jnp.argsort(~keep, stable=True)   # kept ids ascending, then rest
    kept_old_ids = jnp.where(jnp.arange(node_cap) < n_kept,
                             jnp.arange(node_cap, dtype=jnp.int32)[order], -1)

    return PruneInfo(truncate=truncate, new_root=new_root,
                     accept_len=accept_len, accepted_path=accepted_path,
                     keep=keep, kept_old_ids=kept_old_ids, n_kept=n_kept)


def prune_tree(tree: TokenTree, info: PruneInfo) -> TokenTree:
    """Re-root the tree at `info.new_root`, compacting kept nodes to the front
    in ascending old-id order (ancestors always precede descendants, so BFS
    ordering is preserved). Ref: draft_stage_pruning (pipeline_utils.py:995-1056).

    On truncate the result is an empty 1-node tree (callers re-draft anyway).
    """
    node_cap = tree.node_cap
    kept = jnp.clip(info.kept_old_ids, 0, node_cap - 1)
    in_range = jnp.arange(node_cap, dtype=jnp.int32) < info.n_kept

    # old id -> new id
    old2new = jnp.full((node_cap,), -1, jnp.int32)
    old2new = old2new.at[kept].set(
        jnp.where(in_range, jnp.arange(node_cap, dtype=jnp.int32), -1))

    tokens = jnp.where(in_range, tree.tokens[kept], -1)
    old_parents = tree.parents[kept]
    parents = jnp.where(in_range,
                        old2new[jnp.clip(old_parents, 0, node_cap - 1)], -1)
    parents = parents.at[0].set(-1)     # new root
    root_score = tree.scores[jnp.clip(info.new_root, 0, node_cap - 1)]
    scores = jnp.where(in_range, tree.scores[kept] - root_score, -jnp.inf)

    return finalize_tree(tokens, parents, scores,
                         jnp.maximum(info.n_kept, 1),
                         tree.leaf_cap, tree.depth_cap)


def kv_keep_positions(info: PruneInfo, global_offset: jax.Array,
                      kv_in_tree: jax.Array, pos_cap: int):
    """Positions to keep in a verify-stage KV cache after pruning.

    Ref token_pruning (pipeline_utils.py:1076-1151): the cache holds
    `global_offset` committed positions followed by `kv_in_tree` tree
    positions (tree node id == cache offset - global_offset, because chunks
    enter the cache in BFS node order). Keep the accepted path (incl. old
    root) first, then kept subtree nodes that are already in cache; compact
    them to `global_offset`. Returns (src_positions (pos_cap,), n_src) where
    n_src = accept_len + #kept-in-cache; new kv_len = global_offset + n_src.
    """
    node_cap = info.keep.shape[0]
    d = info.accepted_path.shape[0]

    acc_valid = info.accepted_path >= 0
    n_acc = jnp.sum(acc_valid).astype(jnp.int32)            # == accept_len

    kept_in_cache = (info.kept_old_ids >= 0) & (info.kept_old_ids < kv_in_tree)
    n_keep_c = jnp.sum(kept_in_cache).astype(jnp.int32)

    src = jnp.full((pos_cap,), 0, jnp.int32)
    idx_d = jnp.arange(pos_cap, dtype=jnp.int32)
    # First n_acc entries: accepted path node ids; next n_keep_c: kept ids.
    acc_part = jnp.where(idx_d < d, info.accepted_path[jnp.clip(idx_d, 0, d - 1)], -1)
    kept_part_idx = jnp.clip(idx_d - n_acc, 0, node_cap - 1)
    kept_part = info.kept_old_ids[kept_part_idx]
    entry = jnp.where(idx_d < n_acc, acc_part, kept_part)
    n_src = n_acc + n_keep_c
    entry = jnp.where(idx_d < n_src, entry, 0)
    src = jnp.clip(entry, 0, None) + global_offset
    return src, n_src
