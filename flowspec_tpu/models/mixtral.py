"""Mixtral-style sparse-MoE decoder with tree-masked attention.

Reference: eagle/modeling_mixtral_kv.py — the same KV/tree-mask treatment as
the llama fork with `MixtralSparseMoeBlock` MLPs (:449-518): softmax router,
top-k expert selection with renormalized weights.

At speculative-decode batch sizes (<= node_cap tokens) we evaluate the
selected experts via one-hot mixture einsums over the stacked expert weights
— dense compute over E experts but zero gather/scatter overhead, which on
TPU beats dynamic dispatch until T*k/E is large. Attention reuses the llama
implementation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from flowspec_tpu.config import ModelConfig
from flowspec_tpu.models.kv_cache import KVCache
from flowspec_tpu.models.llama import attention_block, rms_norm
from flowspec_tpu.ops.quant import qmatmul


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MixtralLayerParams:
    """Leading (num_layers,) axis on every leaf."""
    wq: jax.Array          # (L, H, nq*D)
    wk: jax.Array
    wv: jax.Array
    wo: jax.Array
    router: jax.Array      # (L, H, E)
    w_gate: jax.Array      # (L, E, H, I)
    w_up: jax.Array        # (L, E, H, I)
    w_down: jax.Array      # (L, E, I, H)
    input_ln: jax.Array
    post_ln: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MixtralParams:
    embed: jax.Array
    layers: MixtralLayerParams
    final_norm: jax.Array
    lm_head: jax.Array


def moe_block(x: jax.Array, lp: MixtralLayerParams,
              cfg: ModelConfig) -> jax.Array:
    """x (B, T, H) -> (B, T, H). Ref MixtralSparseMoeBlock
    (eagle/modeling_mixtral_kv.py:449-518): full-softmax router, top-k
    selection, renormalized weights."""
    e = cfg.num_local_experts
    k = cfg.num_experts_per_tok
    logits = jnp.einsum("bth,he->bte", x, lp.router,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    top_p, top_i = jax.lax.top_k(probs, k)                   # (B, T, k)
    top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)
    # per-token expert mixture weights (B, T, E)
    onehot = jax.nn.one_hot(top_i, e, dtype=probs.dtype)     # (B, T, k, E)
    mix = jnp.einsum("btk,btke->bte", top_p, onehot)

    # dense mixture over stacked experts
    g = jnp.einsum("bth,ehi->btei", x, lp.w_gate)
    u = jnp.einsum("bth,ehi->btei", x, lp.w_up)
    act = jax.nn.silu(g) * u
    y = jnp.einsum("btei,eih->bteh", act, lp.w_down)
    return jnp.einsum("bteh,bte->bth", y, mix.astype(y.dtype))


def mixtral_decoder_layer(x, lp, k_cache, v_cache, positions, bias,
                          write_start, cfg: ModelConfig, layer=None):
    res = x
    x = rms_norm(x, lp.input_ln, cfg.rms_norm_eps)
    attn, k_cache, v_cache = attention_block(
        x, lp.wq, lp.wk, lp.wv, lp.wo, k_cache, v_cache, positions, bias,
        write_start, cfg, layer=layer)
    x = res + attn

    res = x
    x = rms_norm(x, lp.post_ln, cfg.rms_norm_eps)
    x = res + moe_block(x, lp, cfg)
    return x, k_cache, v_cache


def mixtral_forward(params: MixtralParams, cache: KVCache, hidden, positions,
                    bias, write_start, cfg: ModelConfig):
    n_layers = cache.k.shape[0]

    def body(carry, xs):
        x, kc, vc = carry
        lp, l = xs
        x, kc, vc = mixtral_decoder_layer(x, lp, kc, vc, positions, bias,
                                          write_start, cfg, layer=l)
        return (x, kc, vc), None

    (x, k_new, v_new), _ = jax.lax.scan(
        body, (hidden, cache.k, cache.v),
        (params.layers, jnp.arange(n_layers, dtype=jnp.int32)))
    return x, KVCache(k=k_new, v=v_new, length=cache.length)


def init_mixtral_params(key: jax.Array, cfg: ModelConfig,
                        dtype=None) -> MixtralParams:
    dtype = dtype or jnp.dtype(cfg.dtype)
    h, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    l, e = cfg.num_hidden_layers, cfg.num_local_experts
    d = cfg.head_dim_
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    ks = jax.random.split(key, 12)

    def init(k, shape, fan):
        return jax.random.normal(k, shape, dtype) * jnp.asarray(
            fan ** -0.5, dtype)

    layers = MixtralLayerParams(
        wq=init(ks[0], (l, h, nq * d), h),
        wk=init(ks[1], (l, h, nkv * d), h),
        wv=init(ks[2], (l, h, nkv * d), h),
        wo=init(ks[3], (l, nq * d, h), nq * d),
        router=init(ks[4], (l, h, e), h),
        w_gate=init(ks[5], (l, e, h, i), h),
        w_up=init(ks[6], (l, e, h, i), h),
        w_down=init(ks[7], (l, e, i, h), i),
        input_ln=jnp.ones((l, h), dtype),
        post_ln=jnp.ones((l, h), dtype),
    )
    return MixtralParams(
        embed=init(ks[8], (v, h), 2500),
        layers=layers,
        final_norm=jnp.ones((h,), dtype),
        lm_head=init(ks[9], (h, v), h),
    )


def load_mixtral_params(model_dir: str, cfg=None, dtype=jnp.bfloat16,
                        put=jnp.asarray) -> MixtralParams:
    """HF Mixtral checkpoint loader (block_sparse_moe.experts.{j}.w1/w2/w3)."""
    import numpy as np
    from flowspec_tpu.models.loader import _open_safetensors, load_model_config

    cfg = cfg or load_model_config(model_dir)
    t = _open_safetensors(model_dir)
    L, E = cfg.num_hidden_layers, cfg.num_local_experts

    def lin(fmt):
        return np.stack([np.asarray(t[fmt.format(i)]).T for i in range(L)])

    def moe(w_idx):
        # HF names: w1 = gate, w3 = up, w2 = down
        return np.stack([
            np.stack([np.asarray(
                t[f"model.layers.{i}.block_sparse_moe.experts.{j}.w{w_idx}.weight"]).T
                for j in range(E)])
            for i in range(L)])

    pre = "model.layers.{}."
    layers = MixtralLayerParams(
        wq=put(lin(pre + "self_attn.q_proj.weight").astype(dtype)),
        wk=put(lin(pre + "self_attn.k_proj.weight").astype(dtype)),
        wv=put(lin(pre + "self_attn.v_proj.weight").astype(dtype)),
        wo=put(lin(pre + "self_attn.o_proj.weight").astype(dtype)),
        router=put(lin(pre + "block_sparse_moe.gate.weight").astype(dtype)),
        w_gate=put(moe(1).astype(dtype)),
        w_up=put(moe(3).astype(dtype)),
        w_down=put(moe(2).astype(dtype)),
        input_ln=put(np.stack([np.asarray(
            t[pre.format(i) + "input_layernorm.weight"]) for i in range(L)]
        ).astype(dtype)),
        post_ln=put(np.stack([np.asarray(
            t[pre.format(i) + "post_attention_layernorm.weight"])
            for i in range(L)]).astype(dtype)),
    )
    return MixtralParams(
        embed=put(np.asarray(t["model.embed_tokens.weight"]).astype(dtype)),
        layers=layers,
        final_norm=put(np.asarray(t["model.norm.weight"]).astype(dtype)),
        lm_head=put(np.asarray(t["lm_head.weight"]).T.astype(dtype)),
    )
