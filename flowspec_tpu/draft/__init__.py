"""EAGLE draft model: fused embedding+hidden projection, one decoder layer,
and the beam-search token-tree generator.

Reference: eagle/cnets.py — `Model` (:476-674), `topK_genrate` (:700-991),
`expand_last` (:1439-1708), `expand_pipedec` (:1711-1957).
"""

from flowspec_tpu.draft.eagle import (
    EagleParams, init_eagle_params, load_eagle_params, draft_context_forward,
)
from flowspec_tpu.draft.beam import (
    BeamState, topk_generate, expand_tree,
)

__all__ = [
    "EagleParams", "init_eagle_params", "load_eagle_params",
    "draft_context_forward",
    "BeamState", "topk_generate", "expand_tree",
]
