"""Model layer: transformer families with tree-masked attention.

Replaces the reference's HF forks (eagle/modeling_llama_kv.py,
eagle/modeling_qwen2_kv.py, eagle/modeling_mixtral_kv.py,
model/stage_modeling_llama.py) with pure-function JAX blocks over explicit
parameter pytrees. Layers are stored *stacked* (leading layer axis) so the
whole stack runs as one `lax.scan` and pipeline stages shard the layer axis.
"""

from flowspec_tpu.models.kv_cache import KVCache, init_kv_cache
from flowspec_tpu.models.llama import (
    LlamaParams, init_llama_params, llama_forward, final_hidden,
    embed_tokens, lm_head_logits,
)
from flowspec_tpu.models.mixtral import (
    MixtralParams, init_mixtral_params, mixtral_forward,
)
from flowspec_tpu.models.bias import prefill_bias, tree_bias


def model_forward(params, cache, hidden, positions, bias, write_start, cfg):
    """Dispatch on the parameter family (llama/qwen2 share LlamaParams;
    qwen2 differs only by qkv bias, a config flag)."""
    if isinstance(params, MixtralParams):
        return mixtral_forward(params, cache, hidden, positions, bias,
                               write_start, cfg)
    return llama_forward(params, cache, hidden, positions, bias,
                         write_start, cfg)

__all__ = [
    "KVCache", "init_kv_cache",
    "LlamaParams", "init_llama_params", "llama_forward", "final_hidden",
    "MixtralParams", "init_mixtral_params", "mixtral_forward",
    "model_forward", "embed_tokens", "lm_head_logits",
    "prefill_bias", "tree_bias",
]
