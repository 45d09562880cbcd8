"""Fused tree-attention kernel vs the XLA reference path.

The Pallas kernel (ops/tree_attention.py) streams KV blocks through VMEM
with an online softmax; it must match the materialized-scores einsum path in
models/llama.py:attention exactly (same masked-out columns, same GQA
grouping). Tested in interpreter mode on CPU. Ref semantics:
model/stage_modeling_llama.py:99-105 (tree mask folded into the causal
mask as an additive bias).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from flowspec_tpu.ops.tree_attention import tree_attention

NEG_INF = -1e9


def _xla_attention(q, k_all, v_all, bias):
    nq, nkv = q.shape[1], k_all.shape[1]
    if nq != nkv:
        k_all = jnp.repeat(k_all, nq // nkv, axis=1)
        v_all = jnp.repeat(v_all, nq // nkv, axis=1)
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k_all,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + bias[None, None].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v_all,
                      preferred_element_type=jnp.float32)


def _rand_case(key, nq, nkv, t, s, d, ctx_end):
    kq, kk, kv, kb = jax.random.split(key, 4)
    q = jax.random.normal(kq, (1, nq, t, d), jnp.bfloat16)
    k = jax.random.normal(kk, (1, nkv, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (1, nkv, s, d), jnp.bfloat16)
    # tree-style bias: full context visible up to ctx_end, then a random
    # ancestor mask over the tree region, NEG_INF beyond
    tree = jax.random.bernoulli(kb, 0.4, (t, t))
    tree = jnp.tril(tree).at[jnp.arange(t), jnp.arange(t)].set(True)
    cols = jnp.arange(s)[None, :]
    bias = jnp.where(cols < ctx_end, 0.0, NEG_INF)
    bias = jax.lax.dynamic_update_slice(
        jnp.broadcast_to(bias, (t, s)),
        jnp.where(tree, 0.0, NEG_INF), (0, ctx_end))
    return q, k, v, bias.astype(jnp.float32)


@pytest.mark.parametrize("nq,nkv,t,s,d", [
    (4, 4, 8, 256, 64),      # MHA
    (8, 2, 16, 512, 64),     # GQA, 2 blocks at block_s=256
    (4, 1, 8, 768, 128),     # MQA, 3 blocks
])
def test_tree_attention_matches_xla(nq, nkv, t, s, d):
    q, k, v, bias = _rand_case(jax.random.key(0), nq, nkv, t, s, d,
                               ctx_end=s // 2)
    want = _xla_attention(q, k, v, bias)
    with pltpu.force_tpu_interpret_mode():
        got = tree_attention(q, k, v, bias, block_s=256)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0, atol=2e-2)


def test_tree_attention_fully_masked_block():
    """Blocks whose every column is masked must not poison the accumulator
    (exp(NEG_INF - m) handling)."""
    q, k, v, bias = _rand_case(jax.random.key(1), 4, 4, 8, 512, 64,
                               ctx_end=64)  # cols 64+8..512 fully masked
    want = _xla_attention(q, k, v, bias)
    with pltpu.force_tpu_interpret_mode():
        got = tree_attention(q, k, v, bias, block_s=256)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0, atol=2e-2)
