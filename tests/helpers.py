"""Shared test helpers: NaiveTree <-> TokenTree conversion + jitted ops.

The tree ops are jitted here (shapes are fixed across trials) so the
property-test loops dispatch compiled code instead of hundreds of eager ops
per trial.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from flowspec_tpu.tree.build import finalize_tree
from flowspec_tpu.tree.merge import merge_trees
from flowspec_tpu.tree.prune import (
    compute_pruning_info, kv_keep_positions, prune_tree,
)
from tests.oracle import NaiveTree

from flowspec_tpu.tree.types import ancestor_matrix, depths_from_parents
from flowspec_tpu.tree.partition import (
    partition_lengths, retrieve_cum_depths, split_close_equal,
)
from flowspec_tpu.tree.posterior import (
    evaluate_posterior_greedy, evaluate_posterior_stochastic,
)

j_ancestor = jax.jit(ancestor_matrix, static_argnums=(1,))
j_depths = jax.jit(depths_from_parents, static_argnums=(1,))
j_partition = jax.jit(partition_lengths, static_argnums=(1, 2, 3))
j_cum_depths = jax.jit(retrieve_cum_depths)
j_split = jax.jit(split_close_equal, static_argnums=(1,))
j_greedy = jax.jit(evaluate_posterior_greedy)
j_stochastic = jax.jit(evaluate_posterior_stochastic,
                       static_argnums=(2, 4))
j_pruning_info = jax.jit(compute_pruning_info)
j_prune_tree = jax.jit(prune_tree)
j_merge_trees = jax.jit(merge_trees)
j_kv_keep = jax.jit(kv_keep_positions, static_argnums=(3,))
j_finalize = jax.jit(finalize_tree, static_argnums=(4, 5))

CAPS = dict(node_cap=64, leaf_cap=64, depth_cap=16)


def to_token_tree(t: NaiveTree, node_cap=None, leaf_cap=None, depth_cap=None):
    node_cap = node_cap or CAPS["node_cap"]
    leaf_cap = leaf_cap or CAPS["leaf_cap"]
    depth_cap = depth_cap or CAPS["depth_cap"]
    n = t.n
    pad = node_cap - n
    tokens = jnp.asarray(np.concatenate([t.tokens, -np.ones(pad)]), jnp.int32)
    parents = jnp.asarray(np.concatenate([t.parents, -np.ones(pad)]), jnp.int32)
    scores = jnp.asarray(
        np.concatenate([t.scores, np.full(pad, -np.inf)]), jnp.float32)
    return j_finalize(tokens, parents, scores, jnp.asarray(n, jnp.int32),
                      leaf_cap, depth_cap)


def retrieve_rows(tree) -> list[list[int]]:
    """Valid retrieve rows of a TokenTree as python lists (strip -1 pad)."""
    ri = np.asarray(tree.retrieve)
    n_leaves = int(tree.n_leaves)
    out = []
    for r in range(n_leaves):
        row = [int(x) for x in ri[r] if x >= 0]
        out.append(row)
    return out
