"""Attention-bias builders for prefill and tree chunks.

The reference folds the tree mask into a causal mask inside each model fork
(model/stage_modeling_llama.py:99-105, eagle/modeling_llama_kv.py:915-919).
Here the model is mask-agnostic: callers build one additive (T, S) bias per
forward and every layer reuses it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flowspec_tpu.tree.types import NEG_INF


def prefill_bias(start: jax.Array, t: int, s_max: int,
                 dtype=jnp.float32) -> jax.Array:
    """(T, S) bias for a contiguous chunk written at [start, start+T):
    query i attends cache positions j <= start + i (padded query rows beyond
    the chunk's valid length produce garbage outputs that callers ignore)."""
    i = jnp.arange(t, dtype=jnp.int32)[:, None]
    j = jnp.arange(s_max, dtype=jnp.int32)[None, :]
    ok = j <= start + i
    return jnp.where(ok, 0.0, NEG_INF).astype(dtype)


def tree_bias(anc_bias_rows: jax.Array, tree_base: jax.Array,
              chunk_start: jax.Array, s_max: int,
              dtype=jnp.float32) -> jax.Array:
    """(T, S) bias for a tree chunk written at cache positions
    [tree_base + chunk_start, ...).

    `anc_bias_rows` (T, N_cap): additive ancestor bias rows for the chunk's
    query nodes against *all* tree nodes (0 = ancestor-or-self, -inf
    otherwise), i.e. rows [chunk_start : chunk_start+T) of
    tree_attention_bias(). Cache layout: [0, tree_base) committed context
    (always attendable), [tree_base, tree_base + N) the tree nodes in BFS
    order. This reproduces the reference's rectangular mask slices
    `tree_mask[..., start:end, :end]` (pipeline_utils.py:756-760) without
    dynamic shapes.
    """
    t, n_cap = anc_bias_rows.shape
    j = jnp.arange(s_max, dtype=jnp.int32)[None, :]
    tree_col = jnp.clip(j - tree_base, 0, n_cap - 1)
    tree_part = jnp.take_along_axis(
        anc_bias_rows, jnp.broadcast_to(tree_col, (t, s_max)), axis=1)
    # Columns past the tree region hold stale KV from earlier rounds and must
    # be masked: without the upper bound they clamp to tree column n_cap-1,
    # whose own query row (bias 0 to itself) would attend every stale column
    # when the tree fills its last slot (advisor finding r1-medium; mirrors
    # the beam bias bound in draft/beam.py `ok & (j < ctx_end + LVLS*K)`).
    return jnp.where(j < tree_base, 0.0,
                     jnp.where(j < tree_base + n_cap, tree_part,
                               NEG_INF)).astype(dtype)
