"""Logits warping + token sampling.

Reference: `prepare_logits_processor` (pipeline_utils.py:61-77) composes HF
TemperatureLogitsWarper / TopPLogitsWarper / TopKLogitsWarper; `gen_token`
(pipeline_utils.py:167-180) samples (multinomial) or argmaxes. Same order
here: temperature -> top-p -> top-k (HF applies them in append order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flowspec_tpu.config import SamplingConfig

_FILTER = -float("inf")


def warp_logits(logits: jax.Array, cfg: SamplingConfig) -> jax.Array:
    """Apply temperature / top-p / top-k filters to a (..., V) logits array."""
    if cfg.is_greedy:
        return logits
    if cfg.temperature != 1.0:
        logits = logits / cfg.temperature
    if 1e-8 <= cfg.top_p < 1.0:
        logits = _top_p_filter(logits, cfg.top_p)
    if cfg.top_k > 0:
        logits = _top_k_filter(logits, cfg.top_k)
    return logits


def _top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    return jnp.where(logits < kth, _FILTER, logits)


def _top_p_filter(logits: jax.Array, top_p: float) -> jax.Array:
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # HF TopPLogitsWarper keeps tokens until cumulative prob exceeds top_p,
    # always keeping at least one.
    cutoff_mask = cum - probs > top_p
    sorted_filtered = jnp.where(cutoff_mask, _FILTER, sorted_logits)
    threshold = jnp.min(jnp.where(cutoff_mask, jnp.inf, sorted_logits),
                        axis=-1, keepdims=True)
    return jnp.where(logits < threshold, _FILTER, logits)


def sample_token(key: jax.Array, probs_or_logits: jax.Array,
                 cfg: SamplingConfig, is_probs: bool) -> jax.Array:
    """() int32 — ref gen_token (pipeline_utils.py:167-180)."""
    if cfg.is_greedy:
        return jnp.argmax(probs_or_logits, axis=-1).astype(jnp.int32)
    if is_probs:
        logp = jnp.log(jnp.maximum(probs_or_logits, 1e-30))
    else:
        logp = warp_logits(probs_or_logits, cfg)
    return jax.random.categorical(key, logp).astype(jnp.int32)
