"""Static-shape token-tree algebra (the algorithmic heart of FlowSpec).

Replaces the reference's dynamic-shape CPU/NumPy tree machinery
(pipeline_utils.py:673-1303, eagle/cnets.py:901-989) with jit-compatible,
fixed-capacity index operations that run on-chip.
"""

from flowspec_tpu.tree.types import TokenTree, ancestor_matrix, tree_attention_bias
from flowspec_tpu.tree.build import (
    build_tree, compute_retrieve, finalize_tree, select_topn,
)
from flowspec_tpu.tree.partition import partition_lengths, retrieve_cum_depths
from flowspec_tpu.tree.posterior import (
    evaluate_posterior_greedy,
    evaluate_posterior_stochastic,
)
from flowspec_tpu.tree.prune import compute_pruning_info, prune_tree
from flowspec_tpu.tree.merge import merge_trees

__all__ = [
    "TokenTree", "ancestor_matrix", "tree_attention_bias",
    "build_tree", "compute_retrieve", "finalize_tree", "select_topn",
    "partition_lengths", "retrieve_cum_depths",
    "evaluate_posterior_greedy", "evaluate_posterior_stochastic",
    "compute_pruning_info", "prune_tree", "merge_trees",
]
