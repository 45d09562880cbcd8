"""EAGLE draft network: hidden = decoder_layer(fc(concat(embed(tok), h))).

Reference: eagle/cnets.py `Model.__init__`/`forward` (:476-674). Structure:
frozen base embeddings, `fc: 2H -> H` fusion, a single LLaMA decoder layer
whose *input layernorm is skipped* (cnets layer index 0 drops it), and the
base model's lm_head applied to the raw layer output (no final norm).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from flowspec_tpu.config import ModelConfig
from flowspec_tpu.models.kv_cache import KVCache
from flowspec_tpu.models.llama import attention_block, rms_norm
from flowspec_tpu.ops.quant import qmatmul, quantize_int8, quantize_nf4


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EagleParams:
    """Full-size draft (reference layout): the decoder layer works in the
    base hidden space H and `w_out` is None. Thin draft (a capability the
    reference lacks — its draft is always a full-width base layer,
    eagle/cnets.py:476-520): the layer works in its own width W < H
    (fc: 2H -> W, attention/MLP on W) and `w_out: (W, H)` projects the
    output back to base hidden space for lm_head scoring and the next
    level's fusion. All downstream code derives the draft geometry from
    these shapes via `draft_view` — no second config to thread."""
    embed: jax.Array      # (V, H) — tied to base model (frozen, cnets:519)
    fc_w: jax.Array       # (2H, W)   (W == H for the reference layout)
    fc_b: jax.Array       # (W,)
    wq: jax.Array         # (W, nq*D)
    wk: jax.Array
    wv: jax.Array
    wo: jax.Array
    w_gate: jax.Array
    w_up: jax.Array
    w_down: jax.Array
    post_ln: jax.Array    # (W,) — input_ln intentionally absent
    w_out: jax.Array | None = None   # (W, H) thin-draft output projection


def _odim(x) -> int:
    """Output (last) dim of a possibly-quantized weight: quant containers
    pack along the *input* axis (-2), so the last axis is always real."""
    q = getattr(x, "q", None)
    return (x if q is None else q).shape[-1]


def draft_view(p: EagleParams, base_cfg: ModelConfig) -> ModelConfig:
    """ModelConfig describing the draft layer's geometry, derived from the
    param shapes (width, head count, MLP width may all differ from the
    base — thin drafts). head_dim is inherited from the base so rope is
    compatible across widths."""
    d = base_cfg.head_dim_
    w = _odim(p.fc_w)
    nq = _odim(p.wq) // d
    nkv = _odim(p.wk) // d
    inter = _odim(p.w_gate)
    if (w == base_cfg.hidden_size and inter == base_cfg.intermediate_size
            and nq == base_cfg.num_attention_heads
            and nkv == base_cfg.num_key_value_heads):
        return base_cfg
    return dataclasses.replace(
        base_cfg, hidden_size=w, intermediate_size=inter,
        num_attention_heads=nq, num_key_value_heads=nkv, head_dim=d)


def project_out(p: EagleParams, x: jax.Array,
                hidden_in: jax.Array) -> jax.Array:
    """Draft output in base H space. Full-width drafts (w_out None) return
    the layer output directly — reference parity (cnets applies lm_head to
    the raw layer output). THIN drafts return hidden_in + x @ w_out: the
    layer predicts the next hidden's DELTA from the input hidden. The
    rank-W bottleneck (fc -> W -> w_out) cannot represent the identity map
    on H > W dims, so a direct-prediction thin draft can only memorize the
    hidden vectors it trained on (measured: 0.97 teacher-forced top-1 on
    the training rollouts, chance on held-out prompts); the residual form
    makes 'hidden barely moves' the zero function, which generalizes."""
    if p.w_out is None:
        return x
    return hidden_in.astype(x.dtype) + qmatmul(x, p.w_out)


def eagle_layer(x: jax.Array, p: EagleParams, k_cache, v_cache,
                positions: jax.Array, bias: jax.Array, write_start,
                cfg: ModelConfig):
    """x (B, T, H) already fc-fused. No input RMSNorm (cnets LlamaDecoderLayer
    index 0 skips it, eagle/cnets.py:417-421)."""
    res = x
    attn, k_cache, v_cache = attention_block(
        x, p.wq, p.wk, p.wv, p.wo, k_cache, v_cache, positions, bias,
        write_start, cfg)
    x = res + attn

    res = x
    x = rms_norm(x, p.post_ln, cfg.rms_norm_eps)
    x = res + qmatmul(jax.nn.silu(qmatmul(x, p.w_gate)) * qmatmul(x, p.w_up),
                      p.w_down)
    return x, k_cache, v_cache


def fuse(p: EagleParams, tokens: jax.Array, hidden: jax.Array) -> jax.Array:
    """fc(concat(embed(tokens), hidden)) — eagle/cnets.py:615."""
    emb = p.embed[jnp.clip(tokens, 0, p.embed.shape[0] - 1)]
    x = jnp.concatenate([emb.astype(hidden.dtype), hidden], axis=-1)
    return qmatmul(x, p.fc_w) + p.fc_b


EAGLE_QUANT_FIELDS = ("fc_w", "wq", "wk", "wv", "wo",
                      "w_gate", "w_up", "w_down", "w_out")


def quantize_eagle_params(p: EagleParams, kind: str) -> EagleParams:
    """Weight-only quantize the draft matmuls. The beam re-reads the draft
    weights once per tree level (6-8x per round), so halving their bytes cuts
    a large slice of round latency. The reference does not quantize its
    draft (stage_ea_model.py:113-164 loads it full-precision); quality-wise
    the draft only proposes — verification still uses base-model logits."""
    from flowspec_tpu.ops.quant import quantize_int4
    # the draft is ~1/32 of the base model; "mixed" keeps it all-int8
    fn = {"int8": quantize_int8, "nf4": quantize_nf4,
          "int4": quantize_int4, "mixed": quantize_int8}[kind]
    import dataclasses as _dc
    return _dc.replace(p, **{f: fn(getattr(p, f))
                             for f in EAGLE_QUANT_FIELDS
                             if getattr(p, f) is not None})


def draft_context_forward(p: EagleParams, cache: KVCache, tokens: jax.Array,
                          hidden: jax.Array, start: jax.Array, n_valid,
                          cfg: ModelConfig):
    """Advance the draft KV over context pairs (token_{i+1}, base_hidden_i).

    tokens (T,), hidden (1, T, H) padded to static T; pairs [0, n_valid) are
    real. Returns (out_hidden (1, T, H), cache with beam-region length reset
    to start + n_valid — the reference's `stable_kv`, eagle/cnets.py:737-744).
    """
    dc = draft_view(p, cfg)
    t = tokens.shape[0]
    x = fuse(p, tokens[None], hidden)
    positions = start + jnp.arange(t, dtype=jnp.int32)
    i = jnp.arange(t, dtype=jnp.int32)[:, None]
    j = jnp.arange(cache.max_len, dtype=jnp.int32)[None, :]
    bias = jnp.where(j <= start + i, 0.0, -1e9).astype(jnp.float32)
    out, k, v = eagle_layer(x, p, cache.k[0], cache.v[0], positions, bias,
                            start, dc)
    new_cache = KVCache(k=k[None], v=v[None],
                        length=(start + n_valid).astype(jnp.int32))
    return project_out(p, out, hidden), new_cache


def init_eagle_params(key: jax.Array, cfg: ModelConfig,
                      embed: jax.Array | None = None,
                      dtype=None, width: int | None = None,
                      n_heads: int | None = None,
                      n_kv_heads: int | None = None,
                      inter: int | None = None) -> EagleParams:
    """Random-init draft. Default: the reference's full-width layout
    (W == H). `width`/`n_heads`/`n_kv_heads`/`inter` build a THIN draft —
    the layer works in W with its own head count / MLP width and a
    w_out: (W, H) projection; head_dim stays the base's so rope matches."""
    dtype = dtype or jnp.dtype(cfg.dtype)
    h, v = cfg.hidden_size, cfg.vocab_size
    d = cfg.head_dim_
    w = width or h
    i = inter or (cfg.intermediate_size if w == h else
                  int(2.75 * w) // 256 * 256 or w * 2)
    nq = n_heads or (cfg.num_attention_heads if w == h else max(w // d, 1))
    nkv = n_kv_heads or (cfg.num_key_value_heads if w == h
                         else max(w // d, 1))
    thin = (w != h or nq != cfg.num_attention_heads
            or nkv != cfg.num_key_value_heads or i != cfg.intermediate_size)
    ks = jax.random.split(key, 10)

    def init(k, shape):
        return jax.random.normal(k, shape, dtype) * jnp.asarray(
            shape[0] ** -0.5, dtype)

    return EagleParams(
        embed=embed if embed is not None else (
            jax.random.normal(ks[0], (v, h), dtype) * jnp.asarray(0.02, dtype)),
        fc_w=init(ks[1], (2 * h, w)),
        fc_b=jnp.zeros((w,), dtype),
        wq=init(ks[2], (w, nq * d)),
        wk=init(ks[3], (w, nkv * d)),
        wv=init(ks[4], (w, nkv * d)),
        wo=init(ks[5], (nq * d, w)),
        w_gate=init(ks[6], (w, i)),
        w_up=init(ks[7], (w, i)),
        w_down=init(ks[8], (i, w)),
        post_ln=jnp.ones((w,), dtype),
        w_out=init(ks[9], (w, h)) if thin else None,
    )


def load_thin_draft(path: str, embed: jax.Array,
                    dtype=jnp.bfloat16) -> EagleParams:
    """Load a distilled thin-draft checkpoint (npz of trainable fields,
    fp16 — written by tools/train_bench_draft.py). Embeddings come from
    the base model, like the reference's draft loading
    (stage_ea_model.py:113-164)."""
    z = np.load(path)
    kw = {f: jnp.asarray(z[f].astype(np.float32), dtype) for f in z.files}
    return EagleParams(embed=embed, **kw)


def load_eagle_params(draft_dir: str, embed: jax.Array,
                      dtype=jnp.bfloat16) -> EagleParams:
    """Load an EAGLE head checkpoint (HF layout used by the reference:
    fc.*, layers.0.*; embeddings come from the base model)."""
    import os
    from safetensors import safe_open

    files = [f for f in os.listdir(draft_dir) if f.endswith(".safetensors")]
    tensors = {}
    for f in files:
        with safe_open(os.path.join(draft_dir, f), framework="np") as h:
            for name in h.keys():
                tensors[name] = h.get_tensor(name)
    if not tensors:
        import torch
        bins = [f for f in os.listdir(draft_dir) if f.endswith(".bin")]
        for f in bins:
            sd = torch.load(os.path.join(draft_dir, f), map_location="cpu")
            tensors.update({k: v.float().numpy() for k, v in sd.items()})

    def g(name):
        return jnp.asarray(np.asarray(tensors[name]).T.astype(dtype))

    pre = "layers.0."
    return EagleParams(
        embed=embed,
        fc_w=g("fc.weight"),
        fc_b=jnp.asarray(np.asarray(tensors["fc.bias"]).astype(dtype))
        if "fc.bias" in tensors else jnp.zeros(
            (np.asarray(tensors["fc.weight"]).shape[0],), dtype),
        wq=g(pre + "self_attn.q_proj.weight"),
        wk=g(pre + "self_attn.k_proj.weight"),
        wv=g(pre + "self_attn.v_proj.weight"),
        wo=g(pre + "self_attn.o_proj.weight"),
        w_gate=g(pre + "mlp.gate_proj.weight"),
        w_up=g(pre + "mlp.up_proj.weight"),
        w_down=g(pre + "mlp.down_proj.weight"),
        post_ln=jnp.asarray(np.asarray(
            tensors[pre + "post_attention_layernorm.weight"]).astype(dtype)),
    )
