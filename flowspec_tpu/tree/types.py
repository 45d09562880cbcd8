"""TokenTree: the static-capacity draft-tree representation.

The reference carries five dynamically-shaped tensors around the pipeline
(draft_tokens (1,N), tree_mask (1,1,N,N), tree_position_ids (N),
retrieve_indices (L,D), lens_split (S) — see SURVEY.md section 2.2). On TPU we
instead keep a *parents array* as the canonical encoding, padded to a fixed
node capacity, and derive the ancestor mask / retrieve paths on demand with
vectorized index ops. This is O(N) state instead of O(N^2), makes
prune/merge a gather + inverse-permutation instead of 2-D mask surgery, and
keeps every shape static for XLA.

Node 0 is always the root (the last accepted/sampled token, matching
`draft_tokens[0] = sample_token`, eagle/cnets.py:894). Parent indices are
always < child index (nodes stored in BFS order), so a single forward pass
over depth levels resolves any ancestor query. Invalid slots (i >= n_nodes)
have parent -1, token -1, depth 0.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

NEG_INF = -1e9


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TokenTree:
    tokens: jax.Array    # (N,) int32 — node tokens; [0] = root token
    parents: jax.Array   # (N,) int32 — parent node index; -1 for root/invalid
    depth: jax.Array     # (N,) int32 — root depth 0
    scores: jax.Array    # (N,) float32 — cumulative draft log-prob (root 0)
    retrieve: jax.Array  # (L, D) int32 — per-leaf root->leaf node paths, -1 pad
    n_nodes: jax.Array   # () int32
    n_leaves: jax.Array  # () int32

    @property
    def node_cap(self) -> int:
        return self.tokens.shape[0]

    @property
    def leaf_cap(self) -> int:
        return self.retrieve.shape[0]

    @property
    def depth_cap(self) -> int:
        return self.retrieve.shape[1]

    def valid(self) -> jax.Array:
        """(N,) bool — which node slots are live."""
        return jnp.arange(self.node_cap, dtype=jnp.int32) < self.n_nodes

    def leaf_valid(self) -> jax.Array:
        return jnp.arange(self.leaf_cap, dtype=jnp.int32) < self.n_leaves

    def candidates(self) -> jax.Array:
        """(L, D) int32 token sequences along each root->leaf path, -1 pad.

        Equivalent to the reference's `candidates = draft_tokens[0, retrieve]`
        (eagle/utils.py tree_decoding) but -1-safe.
        """
        safe = jnp.clip(self.retrieve, 0, self.node_cap - 1)
        toks = self.tokens[safe]
        return jnp.where(self.retrieve >= 0, toks, -1)

    def leaf_depths(self) -> jax.Array:
        """(L,) int32 — number of valid entries per retrieve row."""
        return jnp.sum(self.retrieve >= 0, axis=1).astype(jnp.int32)


def ancestor_matrix(parents: jax.Array, depth_cap: int,
                    valid: jax.Array | None = None) -> jax.Array:
    """(N, N) bool: out[i, j] == True iff j is an ancestor of i or i == j.

    Row i is exactly the reference's tree-mask row for node i
    (eagle/cnets.py:920-925 builds it by iterated parent-row OR; here we do the
    same with `depth_cap` vectorized gather-OR steps, jit-friendly).
    """
    n = parents.shape[0]
    eye = jnp.eye(n, dtype=jnp.bool_)

    # Pointer doubling: after k steps `anc` covers 2^k - 1 ancestor hops and
    # `ptr` points 2^k hops up (−1 past the root).
    def step(carry, _):
        anc, ptr = carry
        safe = jnp.clip(ptr, 0, n - 1)
        hop_rows = jnp.where((ptr >= 0)[:, None], anc[safe], False)
        ptr2 = jnp.where(ptr >= 0, ptr[safe], -1)
        return (anc | hop_rows, ptr2), None

    (anc, _), _ = jax.lax.scan(step, (eye, parents), None,
                               length=_ceil_log2(depth_cap) + 1)
    if valid is not None:
        anc = anc & valid[:, None] & valid[None, :]
    return anc


def _ceil_log2(x: int) -> int:
    n = 0
    while (1 << n) < x:
        n += 1
    return n


def tree_attention_bias(parents: jax.Array, depth_cap: int,
                        valid: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(N, N) additive attention bias: 0 where attendable, -inf otherwise.

    Matches folding the tree mask into the causal mask
    (model/stage_modeling_llama.py:99-105) for the tree segment.
    """
    anc = ancestor_matrix(parents, depth_cap, valid)
    return jnp.where(anc, jnp.zeros((), dtype), jnp.asarray(NEG_INF, dtype))


def depths_from_parents(parents: jax.Array, depth_cap: int) -> jax.Array:
    """(N,) int32 depth of each node (root = 0) by pointer doubling."""
    n = parents.shape[0]
    depth = jnp.where(parents >= 0, 1, 0).astype(jnp.int32)
    ptr = parents
    for _ in range(_ceil_log2(depth_cap) + 1):
        safe = jnp.clip(ptr, 0, n - 1)
        hop_depth = jnp.where(ptr >= 0, depth[safe], 0)
        hop_ptr = jnp.where(ptr >= 0, ptr[safe], -1)
        depth = depth + hop_depth
        ptr = jnp.where(ptr >= 0, hop_ptr, -1)
    return depth
