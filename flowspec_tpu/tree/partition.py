"""Tree partitioning into pipeline chunks.

Reference: `token_tree_partition` / `get_subseq_ri_cum_depths`
(pipeline_utils.py:673-740) and `split_close_equal` (:136-146). The reference
loops over token positions on CPU to accumulate per-leaf chunk depths; here we
exploit the BFS invariant (node indices along any root->leaf path are strictly
increasing) so the cum-depth is a single vectorized comparison-count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_close_equal(total: jax.Array, n: int) -> jax.Array:
    """(n,) int32 near-equal split with smaller chunks first (ref :136-146)."""
    base = total // n
    rem = total % n
    i = jnp.arange(n, dtype=jnp.int32)
    return (base + jnp.where(i >= n - rem, 1, 0)).astype(jnp.int32)


def partition_lengths(n_tokens: jax.Array, num_stages: int, chunk_len: int,
                      chunk_cap: int) -> tuple[jax.Array, jax.Array]:
    """Initial chunking of a fresh tree (ref token_tree_partition:673-705).

    If the even split across `num_stages` stays <= chunk_len, use it
    (num_stages chunks); otherwise num_stages chunks of exactly `chunk_len`
    plus one leftover "waiting" chunk.

    Returns (lens (chunk_cap,), n_chunks ()).
    """
    even = split_close_equal(n_tokens, num_stages)
    small = (n_tokens // num_stages) <= chunk_len

    lens_small = jnp.zeros((chunk_cap,), jnp.int32).at[:num_stages].set(even)
    leftover = n_tokens - chunk_len * num_stages
    lens_big = jnp.zeros((chunk_cap,), jnp.int32)
    lens_big = lens_big.at[:num_stages].set(chunk_len)
    lens_big = lens_big.at[num_stages].set(leftover)

    lens = jnp.where(small, lens_small, lens_big)
    n_chunks = jnp.where(small, num_stages, num_stages + 1).astype(jnp.int32)
    return lens, n_chunks


def retrieve_cum_depths(retrieve: jax.Array, lens: jax.Array) -> jax.Array:
    """(S, L) — depth each leaf path reaches within each cumulative chunk prefix.

    Ref: get_subseq_ri_cum_depths (pipeline_utils.py:718-740), minus its CPU
    token loop: entry (s, l) counts retrieve[l, :] values in [0, cum_len[s]).
    """
    cum = jnp.cumsum(lens)                                    # (S,)
    inside = (retrieve[None, :, :] >= 0) & \
             (retrieve[None, :, :] < cum[:, None, None])      # (S, L, D)
    return jnp.sum(inside, axis=-1).astype(jnp.int32)


def rebucket_lengths(old_lens: jax.Array, kept_old_indices: jax.Array,
                     n_kept: jax.Array) -> jax.Array:
    """Recompute chunk lengths after pruning (ref draft_stage_pruning:1049-1051).

    `kept_old_indices` (K,) — old node ids retained (padded with -1); each old
    chunk keeps however many of its node ids survived.
    """
    cum = jnp.cumsum(old_lens)                                # (S,)
    valid = (jnp.arange(kept_old_indices.shape[0]) < n_kept) & \
            (kept_old_indices >= 0)
    lo = jnp.concatenate([jnp.zeros((1,), cum.dtype), cum[:-1]])
    in_chunk = (kept_old_indices[None, :] >= lo[:, None]) & \
               (kept_old_indices[None, :] < cum[:, None]) & valid[None, :]
    return jnp.sum(in_chunk, axis=1).astype(jnp.int32)
