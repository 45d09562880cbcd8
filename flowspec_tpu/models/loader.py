"""HF checkpoint -> stacked param pytrees.

Replaces the reference's per-stage HF `from_pretrained` loading
(stage_ea_model.py:92-172) and the offline weight splitter
(tools/split_and_save_models.py): here there is nothing to split offline —
the stacked layer axis is sharded over the pipeline mesh at load time by
`jax.device_put` with a sharding, so one checkpoint serves any topology.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flowspec_tpu.config import ModelConfig
from flowspec_tpu.models.llama import LlamaLayerParams, LlamaParams


def _open_safetensors(model_dir: str) -> Dict[str, "np.ndarray"]:
    """Lazy tensor accessor over (possibly sharded) safetensors files."""
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            weight_map = json.load(f)["weight_map"]
        files = sorted(set(weight_map.values()))
    else:
        files = [f for f in os.listdir(model_dir) if f.endswith(".safetensors")]
        weight_map = None

    handles = {f: safe_open(os.path.join(model_dir, f), framework="np")
               for f in files}
    name_to_file = weight_map or {
        name: f for f in files for name in handles[f].keys()}

    class Accessor(dict):
        def __missing__(self, name):
            return handles[name_to_file[name]].get_tensor(name)

        def keys(self):  # noqa: D102
            return name_to_file.keys()

    return Accessor()


def load_model_config(model_dir: str) -> ModelConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        c = json.load(f)
    return ModelConfig(
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        intermediate_size=c["intermediate_size"],
        num_hidden_layers=c["num_hidden_layers"],
        num_attention_heads=c["num_attention_heads"],
        num_key_value_heads=c.get("num_key_value_heads",
                                  c["num_attention_heads"]),
        head_dim=c.get("head_dim"),
        rms_norm_eps=c.get("rms_norm_eps", 1e-5),
        rope_theta=c.get("rope_theta", 10000.0),
        max_position_embeddings=c.get("max_position_embeddings", 2048),
        attention_bias=c.get("attention_bias",
                             c.get("model_type") == "qwen2"),
        tie_word_embeddings=c.get("tie_word_embeddings", False),
        num_local_experts=c.get("num_local_experts", 0),
        num_experts_per_tok=c.get("num_experts_per_tok", 2),
    )


def load_llama_params(model_dir: str, cfg: Optional[ModelConfig] = None,
                      dtype=jnp.bfloat16,
                      put: Callable = jnp.asarray) -> LlamaParams:
    """Load a LLaMA/Vicuna/Qwen2-style HF checkpoint into stacked params.

    `put` lets callers place each stacked array with a sharding
    (e.g. functools.partial(jax.device_put, device=NamedSharding(...))).
    HF stores linear weights as (out, in); we transpose to (in, out) so
    forward matmuls are plain `x @ w`.
    """
    cfg = cfg or load_model_config(model_dir)
    t = _open_safetensors(model_dir)
    L = cfg.num_hidden_layers
    d = cfg.head_dim_
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads

    def lin(name_fmt, out_dim):
        return np.stack([
            np.asarray(t[name_fmt.format(i)]).T for i in range(L)])

    def bias(name_fmt, out_dim):
        if cfg.attention_bias:
            return np.stack([
                np.asarray(t[name_fmt.format(i)]) for i in range(L)])
        return np.zeros((L, out_dim), np.float32)

    pre = "model.layers.{}."
    layers = LlamaLayerParams(
        wq=put(lin(pre + "self_attn.q_proj.weight", nq * d).astype(dtype)),
        wk=put(lin(pre + "self_attn.k_proj.weight", nkv * d).astype(dtype)),
        wv=put(lin(pre + "self_attn.v_proj.weight", nkv * d).astype(dtype)),
        wo=put(lin(pre + "self_attn.o_proj.weight", cfg.hidden_size).astype(dtype)),
        bq=put(bias(pre + "self_attn.q_proj.bias", nq * d).astype(dtype)),
        bk=put(bias(pre + "self_attn.k_proj.bias", nkv * d).astype(dtype)),
        bv=put(bias(pre + "self_attn.v_proj.bias", nkv * d).astype(dtype)),
        w_gate=put(lin(pre + "mlp.gate_proj.weight", cfg.intermediate_size).astype(dtype)),
        w_up=put(lin(pre + "mlp.up_proj.weight", cfg.intermediate_size).astype(dtype)),
        w_down=put(lin(pre + "mlp.down_proj.weight", cfg.hidden_size).astype(dtype)),
        input_ln=put(np.stack([
            np.asarray(t[pre.format(i) + "input_layernorm.weight"])
            for i in range(L)]).astype(dtype)),
        post_ln=put(np.stack([
            np.asarray(t[pre.format(i) + "post_attention_layernorm.weight"])
            for i in range(L)]).astype(dtype)),
    )
    embed = np.asarray(t["model.embed_tokens.weight"])
    if cfg.tie_word_embeddings or "lm_head.weight" not in t.keys():
        head = embed.T
    else:
        head = np.asarray(t["lm_head.weight"]).T
    return LlamaParams(
        embed=put(embed.astype(dtype)),
        layers=layers,
        final_norm=put(np.asarray(t["model.norm.weight"]).astype(dtype)),
        lm_head=put(head.astype(dtype)),
    )
