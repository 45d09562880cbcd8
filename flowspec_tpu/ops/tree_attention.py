"""Fused (flash-style) tree-masked attention for the verify forward.

Reference semantics: tree-mask-in-causal-mask attention over a preallocated
KV cache (model/stage_modeling_llama.py:99-105) — here the mask arrives as
an additive (T, S) bias. XLA's default lowering materializes the
(H, T, S) float32 score tensor in HBM between the QK matmul, bias add,
softmax and AV matmul (~15MB x several passes x layers at 7B tree-verify
shapes). This kernel streams KV blocks through VMEM with an online-softmax
accumulator, so scores never leave VMEM.

Shape regime: T = tree rows (<= ~128), S = cache length (hundreds..2560),
one query block; grid = (kv_heads, S/BS) with the S axis innermost so the
(m, l, acc) scratch carries across KV blocks of one head.

GQA: q heads are grouped per kv head (n_rep = nq // nkv rows share a KV
stream); the kernel processes one kv head's full query group per grid row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, m_ref, l_ref, acc_ref,
                 *, scale, blocks):
    s_idx = pl.program_id(1)

    @pl.when(s_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                   # (G*T, D)
    k = k_ref[0]                                   # (BS, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (G*T, BS)
    s = s + b_ref[:]                               # bias tiled to (G*T, BS)

    m_prev = m_ref[:]                              # (G*T, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    m_ref[:] = m_new
    p = jnp.exp(s - m_new)                         # (G*T, BS)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(s_idx == blocks - 1)
    def _():
        o_ref[0] = (acc_ref[:] /
                    jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s",))
def tree_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                   bias: jax.Array, block_s: int = 512) -> jax.Array:
    """q (B=1, nq, T, D); k/v_cache (B=1, nkv, S, D); bias (T, S) additive.

    Returns (1, nq, T, D). S must divide block_s (cache buffers are padded
    to multiples of 128 by construction; callers pick block_s | S).
    """
    b, nq, t, d = q.shape
    _, nkv, s_max, _ = k_cache.shape
    assert b == 1
    g = nq // nkv
    while s_max % block_s:
        block_s //= 2
    blocks = s_max // block_s
    scale = d ** -0.5

    # group q rows per kv head: (nkv, G*T, D)
    qg = q[0].reshape(nkv, g, t, d).reshape(nkv, g * t, d)
    # bias is head-independent: tile to the grouped-query rows
    bias_g = jnp.tile(bias, (g, 1))                # (G*T, S)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, blocks=blocks),
        grid=(nkv, blocks),
        in_specs=[
            pl.BlockSpec((1, g * t, d), lambda h, si: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_s, d), lambda h, si: (h, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_s, d), lambda h, si: (h, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g * t, block_s), lambda h, si: (0, si),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g * t, d), lambda h, si: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nkv, g * t, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((g * t, 1), jnp.float32),   # m
            pltpu.VMEM((g * t, 1), jnp.float32),   # l
            pltpu.VMEM((g * t, d), jnp.float32),   # acc
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * nq * t * s_max * d,
            bytes_accessed=(2 * nkv * s_max * d * 2 + nq * t * d * 4 +
                            t * s_max * 4),
            transcendentals=nq * t * s_max),
    )(qg, k_cache[0], v_cache[0], bias_g)
    return out.reshape(nkv, g, t, d).reshape(1, nq, t, d)
