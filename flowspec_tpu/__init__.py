"""flowspec-tpu: TPU-native continuous pipelined speculative decoding.

A from-scratch JAX/XLA/Pallas framework providing the capabilities of
FlowSpec (Leosang-lx/FlowSpec): EAGLE-style draft-tree speculative decoding
with pipelined, chunked, in-flight-pruned tree verification, rebuilt around
static shapes, SPMD meshes, and on-chip tree algebra.

Layer map (mirrors reference SURVEY.md section 1):
  config     -> flowspec_tpu.config          (ref: config/run_config.py)
  comm (L1)  -> jax collectives in flowspec_tpu.parallel (ref: comm/)
  models(L2) -> flowspec_tpu.models           (ref: model/, eagle/modeling_*_kv.py)
  draft (L3) -> flowspec_tpu.draft            (ref: eagle/cnets.py)
  runtime(L4)-> flowspec_tpu.runtime, flowspec_tpu.parallel.schedules
                                              (ref: stage_ea_model.py, pipeline_utils.py)
  entry (L5) -> flowspec_tpu.eval             (ref: run_pipe.py, eval/)
  tools (L6) -> flowspec_tpu.utils            (ref: profiler/, tools/)
"""

__version__ = "0.1.0"
