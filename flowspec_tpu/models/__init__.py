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
from flowspec_tpu.models.bias import prefill_bias, tree_bias

__all__ = [
    "KVCache", "init_kv_cache",
    "LlamaParams", "init_llama_params", "llama_forward", "final_hidden",
    "embed_tokens", "lm_head_logits",
    "prefill_bias", "tree_bias",
]
