"""Shared test helpers: NaiveTree <-> TokenTree conversion."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from flowspec_tpu.tree.build import finalize_tree
from tests.oracle import NaiveTree

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
    return finalize_tree(tokens, parents, scores, jnp.asarray(n, jnp.int32),
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
