"""Preallocated KV cache with explicit length + gather-compaction.

Reference: eagle/kv_cache.py — one big tensor per device with a
`current_length` scalar, `cat()` append and `copy()` index-compaction. The
TPU version keeps the same design (it is already the right shape for static
allocation): stacked over layers, appended via dynamic-update-slice, and
compacted with a static-size gather (positions beyond the valid count gather
row 0 and are masked irrelevant by `length`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KVCache:
    k: jax.Array        # (L, B, H_kv, S, D)
    v: jax.Array        # (L, B, H_kv, S, D)
    length: jax.Array   # () int32 — valid positions

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    def append(self, layer_k: jax.Array, layer_v: jax.Array,
               start: jax.Array) -> "KVCache":
        """Write (L, B, H_kv, T, D) chunks at [start, start+T). Does not move
        `length` — callers advance it once per logical step (writes for padded
        slots land beyond the final length and are never attended)."""
        k = jax.lax.dynamic_update_slice(
            self.k, layer_k.astype(self.k.dtype), (0, 0, 0, start, 0))
        v = jax.lax.dynamic_update_slice(
            self.v, layer_v.astype(self.v.dtype), (0, 0, 0, start, 0))
        return KVCache(k=k, v=v, length=self.length)

    def with_length(self, length: jax.Array) -> "KVCache":
        return KVCache(k=self.k, v=self.v, length=length.astype(jnp.int32))

    def compact(self, src_positions: jax.Array, n_src: jax.Array,
                dst_start: jax.Array) -> "KVCache":
        """Move rows `src_positions[:n_src]` to [dst_start, dst_start+n_src)
        and set length = dst_start + n_src.

        Ref: the KV pruning copy in token_pruning (pipeline_utils.py:1101-1107)
        and update_stage_inference_inputs (:652-661). `src_positions` has a
        static pad; padded entries write to garbage slots past the new length.
        """
        pos_cap = src_positions.shape[0]
        src = jnp.clip(src_positions, 0, self.max_len - 1)
        gk = jnp.take(self.k, src, axis=3)     # (L, B, H, pos_cap, D)
        gv = jnp.take(self.v, src, axis=3)
        k = jax.lax.dynamic_update_slice(self.k, gk, (0, 0, 0, dst_start, 0))
        v = jax.lax.dynamic_update_slice(self.v, gv, (0, 0, 0, dst_start, 0))
        return KVCache(k=k, v=v,
                       length=(dst_start + n_src).astype(jnp.int32))


def init_kv_cache(num_layers: int, batch: int, num_kv_heads: int,
                  max_len: int, head_dim: int,
                  dtype=jnp.bfloat16) -> KVCache:
    """Ref: initialize_past_key_values (eagle/kv_cache.py:69-162)."""
    shape = (num_layers, batch, num_kv_heads, max_len, head_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   length=jnp.zeros((), jnp.int32))
