"""LLaMA-family transformer as pure functions over stacked-layer params.

Covers the reference's LLaMA forks (eagle/modeling_llama_kv.py,
model/stage_modeling_llama.py) and the Qwen2 variant (which differs only by
qkv bias=True, eagle/modeling_qwen2_kv.py:482-488 — here just a config flag).

Design: all decoder layers are stored stacked along a leading layer axis and
executed with `lax.scan`, so XLA compiles one layer body and pipeline stages
shard the layer axis of the same pytree. Attention is mask-agnostic — a
single additive (T, S) bias (see models/bias.py) carries causal/tree
structure. GQA via head repetition. RMSNorm + rotary match HF semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from flowspec_tpu.config import ModelConfig
from flowspec_tpu.models.kv_cache import KVCache
from flowspec_tpu.ops.quant import qmatmul, quantize_int8, quantize_nf4


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LlamaLayerParams:
    """All arrays have a leading (num_layers,) axis."""
    wq: jax.Array        # (L, H, nq*D)
    wk: jax.Array        # (L, H, nkv*D)
    wv: jax.Array        # (L, H, nkv*D)
    wo: jax.Array        # (L, nq*D, H)
    bq: jax.Array        # (L, nq*D) — zeros unless attention_bias (qwen2)
    bk: jax.Array
    bv: jax.Array
    w_gate: jax.Array    # (L, H, I)
    w_up: jax.Array      # (L, H, I)
    w_down: jax.Array    # (L, I, H)
    input_ln: jax.Array  # (L, H)
    post_ln: jax.Array   # (L, H)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LlamaParams:
    embed: jax.Array          # (V, H)
    layers: LlamaLayerParams
    final_norm: jax.Array     # (H,)
    lm_head: jax.Array        # (H, V)


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    x = x.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return (x * w.astype(jnp.float32)).astype(dt)


def rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """HF-style rotary: x (B, H, T, D), positions (T,) int32."""
    d = x.shape[-1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, d, 2, jnp.float32) / d))
    ang = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # (T, D/2)
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    cos = jnp.concatenate([cos, cos], axis=-1)[None, None]            # (1,1,T,D)
    sin = jnp.concatenate([sin, sin], axis=-1)[None, None]
    x1, x2 = jnp.split(x, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos +
            rotated.astype(jnp.float32) * sin).astype(x.dtype)


_FLASH = {}


def _use_flash() -> bool:
    """FLOWSPEC_FLASH=1 routes multi-row attention through the Pallas
    online-softmax kernel (ops/tree_attention.py); default off pending the
    hardware A/B (the XLA path is the measured baseline)."""
    if "on" not in _FLASH:
        import os
        on = bool(os.environ.get("FLOWSPEC_FLASH"))
        try:
            on = on and jax.default_backend() not in ("cpu",)
        except Exception:
            on = False
        _FLASH["on"] = on
    return _FLASH["on"]


DYN_ATTN_BLOCK = 256
DYN_ATTN_MIN_ALLOC = 1024
DYN_ATTN_MIN_Q = 16


def _use_dyn_attn(s_alloc: int, t: int = 0) -> bool:
    """Length-aware blocked attention: read the KV cache only up to the live
    context length instead of the whole static allocation. The dense path's
    QK^T spans every allocated row — at a 2560-token allocation that is
    ~1.5GB of KV read per 7B verify pass even when the context is 100
    tokens.

    Hardware A/B (7B int8, 2560-row alloc, ~100-token live context,
    PROFILE_ITERS=32): the blocked path wins the wide verify forward
    (14.2ms vs 16.0 dense) but LOSES the 1-query-row AR step (the
    dynamic-trip-count while_loop runs once per layer, and its per-iteration
    overhead exceeds the skipped KV read for narrow queries). The query
    width `t` is STATIC per compiled program, so the gate routes by it
    (r2 verdict #6): wide passes (tree verify, t >= DYN_ATTN_MIN_Q) on
    large allocations (>= DYN_ATTN_MIN_ALLOC) take the blocked path by
    default — this is what makes KV bucket growth pay in its final bucket
    — while narrow AR/drain steps keep the dense path. Combined with
    right-sizing/buckets this removes the long-context allocation tax.
    FLOWSPEC_DYN_ATTN=0 forces the dense path everywhere; =1 forces the
    blocked path for any query width (allocation floor still applies)."""
    import os
    env = os.environ.get("FLOWSPEC_DYN_ATTN")
    if env is not None:
        if env in ("0", ""):
            return False
        return s_alloc >= DYN_ATTN_MIN_ALLOC
    return s_alloc >= DYN_ATTN_MIN_ALLOC and t >= DYN_ATTN_MIN_Q


def _attention_blocked(q, k_all, v_all, bias, n_rep: int, n_valid):
    """Online-softmax attention over ceil(n_valid / 256) KV blocks via a
    dynamic-trip-count fori_loop; rows past n_valid are never read. Exact
    same math as the dense path (flash-style rescaling is exact)."""
    b, nq, t, d = q.shape
    nkv = k_all.shape[1]
    blk = DYN_ATTN_BLOCK
    scale = d ** -0.5
    n_blocks = (n_valid.astype(jnp.int32) + (blk - 1)) // blk

    m0 = jnp.full((b, nq, t), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, nq, t), jnp.float32)
    a0 = jnp.zeros((b, nq, t, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        s0 = i * blk
        kb = jax.lax.dynamic_slice(k_all, (0, 0, s0, 0), (b, nkv, blk, d))
        vb = jax.lax.dynamic_slice(v_all, (0, 0, s0, 0), (b, nkv, blk, d))
        bb = jax.lax.dynamic_slice(bias, (jnp.zeros((), jnp.int32), s0),
                                   (t, blk)).astype(jnp.float32)
        if n_rep > 1:
            kb = jnp.repeat(kb, n_rep, axis=1)
            vb = jnp.repeat(vb, n_rep, axis=1)
        # bf16 operands + f32 accumulate: the MXU runs bf16 inputs at full
        # rate; casting inputs to f32 first would be ~8x slower
        s = jnp.einsum("bhtd,bhsd->bhts", q, kb,
                       preferred_element_type=jnp.float32) * scale
        s = s + bb[None, None]
        m2 = jnp.maximum(m, jnp.max(s, axis=-1))
        # masked columns carry -1e9 (finite); only the -inf init needs a
        # guard, on the first block's correction factor
        p = jnp.exp(s - m2[..., None])
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - m2), 0.0)
        l2 = l * corr + jnp.sum(p, axis=-1)
        acc2 = acc * corr[..., None] + jnp.einsum(
            "bhts,bhsd->bhtd", p.astype(q.dtype), vb,
            preferred_element_type=jnp.float32)
        return m2, l2, acc2

    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, a0))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(q.dtype)


def attention(q, k_all, v_all, bias, n_rep: int, n_valid=None):
    """q (B, nq, T, D); k_all/v_all (B, nkv, S, D); bias (T, S) additive.
    `n_valid` (traced scalar), when given, is the number of live KV rows —
    rows at or past it carry -inf bias. Large allocations then take the
    length-aware blocked path (see _use_dyn_attn)."""
    s_alloc = k_all.shape[2]
    if (n_valid is not None and s_alloc % DYN_ATTN_BLOCK == 0
            and _use_dyn_attn(s_alloc, q.shape[2])):
        return _attention_blocked(q, k_all, v_all, bias, n_rep, n_valid)
    if (_use_flash() and q.shape[0] == 1 and q.shape[2] > 1
            and k_all.shape[2] % 256 == 0):
        from flowspec_tpu.ops.tree_attention import tree_attention
        return tree_attention(q, k_all, v_all,
                              bias.astype(jnp.float32)).astype(q.dtype)
    if n_rep > 1:
        k_all = jnp.repeat(k_all, n_rep, axis=1)
        v_all = jnp.repeat(v_all, n_rep, axis=1)
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k_all,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + bias[None, None].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v_all,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def attention_block(x, wq, wk, wv, wo, k_cache, v_cache, positions, bias,
                    write_start, cfg: ModelConfig, bq=None, bk=None, bv=None,
                    layer=None):
    """Shared attention sub-layer: qkv projections (+optional bias), rope,
    KV-cache append, tree/causal-masked attention, output projection. Used by
    the llama/qwen2 layer, the mixtral layer and the EAGLE draft layer —
    they differ only in norms and MLPs.

    With `layer=None`, k_cache/v_cache are one layer's (B, H, S, D) buffers.
    With a (traced) `layer` index, they are the FULL stacked (L, B, H, S, D)
    caches carried through the layer scan and updated in place — lax.scan
    aliases its carry buffers across steps, which avoids the whole-cache
    copy that scanning per-layer caches as xs/ys costs every forward
    (~2x the cache size per step in HBM traffic, see PROFILE_7b_int8.md).
    """
    b, t, _ = x.shape
    d = cfg.head_dim_
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads

    q = qmatmul(x, wq)
    k = qmatmul(x, wk)
    v = qmatmul(x, wv)
    if bq is not None:
        q, k, v = q + bq, k + bk, v + bv
    q = rope(q.reshape(b, t, nq, d).transpose(0, 2, 1, 3), positions,
             cfg.rope_theta)
    k = rope(k.reshape(b, t, nkv, d).transpose(0, 2, 1, 3), positions,
             cfg.rope_theta)
    v = v.reshape(b, t, nkv, d).transpose(0, 2, 1, 3)

    if layer is None:
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k.astype(k_cache.dtype), (0, 0, write_start, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v.astype(v_cache.dtype), (0, 0, write_start, 0))
        k_all, v_all = k_cache, v_cache
    else:
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k.astype(k_cache.dtype)[None],
            (layer, 0, 0, write_start, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v.astype(v_cache.dtype)[None],
            (layer, 0, 0, write_start, 0))
        lshape = (1,) + k_cache.shape[1:]
        zero = jnp.zeros((), jnp.int32)
        k_all = jax.lax.dynamic_slice(
            k_cache, (layer, zero, zero, zero, zero), lshape)[0]
        v_all = jax.lax.dynamic_slice(
            v_cache, (layer, zero, zero, zero, zero), lshape)[0]

    attn = attention(q, k_all, v_all, bias, nq // nkv,
                     n_valid=write_start + t)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, nq * d)
    return qmatmul(attn, wo), k_cache, v_cache


def decoder_layer(x, lp, k_cache, v_cache, positions, bias, write_start,
                  cfg: ModelConfig, layer=None):
    """One decoder layer. x (B, T, H); k/v_cache per-layer (B, nkv, S, D)
    or, with `layer`, the full stacked caches (see attention_block)."""
    res = x
    x = rms_norm(x, lp.input_ln, cfg.rms_norm_eps)
    attn, k_cache, v_cache = attention_block(
        x, lp.wq, lp.wk, lp.wv, lp.wo, k_cache, v_cache, positions, bias,
        write_start, cfg, bq=lp.bq, bk=lp.bk, bv=lp.bv, layer=layer)
    x = res + attn

    res = x
    x = rms_norm(x, lp.post_ln, cfg.rms_norm_eps)
    x = res + qmatmul(jax.nn.silu(qmatmul(x, lp.w_gate)) * qmatmul(x, lp.w_up),
                      lp.w_down)
    return x, k_cache, v_cache


def llama_forward(params: LlamaParams, cache: KVCache, hidden: jax.Array,
                  positions: jax.Array, bias: jax.Array,
                  write_start: jax.Array, cfg: ModelConfig,
                  layer_offset: int = 0):
    """Run the stacked decoder layers over a (B, T, H) chunk.

    `hidden` is post-embedding (callers embed / receive activations — mirrors
    the reference stage model accepting input_ids or inputs_embeds,
    model/stage_modeling_llama.py:344-420). Returns (hidden, cache') where
    hidden is **not** final-normed (stages pass raw activations; only the
    last stage applies final_norm via `final_hidden`).
    """
    del layer_offset
    n_layers = cache.k.shape[0]

    def body(carry, xs):
        x, kc, vc = carry
        lp, l = xs
        x, kc, vc = decoder_layer(x, lp, kc, vc, positions, bias,
                                  write_start, cfg, layer=l)
        return (x, kc, vc), None

    (x, k_new, v_new), _ = jax.lax.scan(
        body, (hidden, cache.k, cache.v),
        (params.layers, jnp.arange(n_layers, dtype=jnp.int32)))
    return x, KVCache(k=k_new, v=v_new, length=cache.length)


def final_hidden(params: LlamaParams, hidden: jax.Array,
                 cfg: ModelConfig) -> jax.Array:
    return rms_norm(hidden, params.final_norm, cfg.rms_norm_eps)


def embed_tokens(params: LlamaParams, tokens: jax.Array) -> jax.Array:
    return params.embed[jnp.clip(tokens, 0, params.embed.shape[0] - 1)]


def lm_head_logits(params: LlamaParams, hidden: jax.Array) -> jax.Array:
    """(..., H) -> (..., V), fp32 accumulation without materializing an fp32
    copy of the (H, V) weight (matters at 7B: the copy alone is ~0.5GB)."""
    return jnp.einsum("...h,hv->...v", hidden, params.lm_head,
                      preferred_element_type=jnp.float32)


def init_llama_params(key: jax.Array, cfg: ModelConfig,
                      dtype=None) -> LlamaParams:
    """Random init (tests / benches use random weights; real weights come
    from models/loader.py)."""
    dtype = dtype or jnp.dtype(cfg.dtype)
    h, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    l = cfg.num_hidden_layers
    d = cfg.head_dim_
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    ks = jax.random.split(key, 16)

    def init(k, shape, scale=None):
        scale = scale if scale is not None else (shape[-2] ** -0.5 if len(shape) > 1 else 1.0)
        # generate directly in the target dtype — at 7B an fp32 staging copy
        # of the largest leaves is multi-GB
        return jax.random.normal(k, shape, dtype) * jnp.asarray(scale, dtype)

    layers = LlamaLayerParams(
        wq=init(ks[0], (l, h, nq * d)),
        wk=init(ks[1], (l, h, nkv * d)),
        wv=init(ks[2], (l, h, nkv * d)),
        wo=init(ks[3], (l, nq * d, h)),
        bq=jnp.zeros((l, nq * d), dtype),
        bk=jnp.zeros((l, nkv * d), dtype),
        bv=jnp.zeros((l, nkv * d), dtype),
        w_gate=init(ks[4], (l, h, i)),
        w_up=init(ks[5], (l, h, i)),
        w_down=init(ks[6], (l, i, h)),
        input_ln=jnp.ones((l, h), dtype),
        post_ln=jnp.ones((l, h), dtype),
    )
    return LlamaParams(
        embed=init(ks[7], (v, h), scale=0.02),
        layers=layers,
        final_norm=jnp.ones((h,), dtype),
        lm_head=init(ks[8], (h, v)),
    )


QUANT_FIELDS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_llama_params(params: LlamaParams, kind: str) -> LlamaParams:
    """Weight-only quantize the decoder matmuls (ref: bitsandbytes int8/nf4
    via BitsAndBytesConfig, config/run_config.py:69-75). Embeddings, lm_head,
    norms and biases stay in the working dtype, matching HF's bnb behavior.
    Stacked (L, In, Out) leaves quantize per layer along the leading axis.

    kind "mixed" = attention int4 + FFN int8: on a 16GB chip 13B cannot hold
    full int8 (~13.3GB weights), and full int4 runs at the ~155GB/s VPU-bound
    4-bit decode rate; demoting only the attention stacks (1/3 of bytes) to
    int4 fits the budget (~10.6GB) while 2/3 of the weight read stays on
    XLA's 537GB/s fused int8 path (tools/int4_probe.py measurements)."""
    from flowspec_tpu.ops.quant import quantize_int4
    if kind == "mixed":
        kinds = {f: ("int4" if f in ("wq", "wk", "wv", "wo") else "int8")
                 for f in QUANT_FIELDS}
    else:
        kinds = {f: kind for f in QUANT_FIELDS}
    fns = {"int8": quantize_int8, "nf4": quantize_nf4,
           "int4": quantize_int4}
    lp = params.layers
    lp = dataclasses.replace(lp, **{f: fns[kinds[f]](getattr(lp, f))
                                    for f in QUANT_FIELDS})
    return dataclasses.replace(params, layers=lp)
