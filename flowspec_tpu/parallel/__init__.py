"""Distributed runtime: SPMD pipeline + tensor-parallel verification.

Replaces the reference's 5-process gloo ring (comm/comm_handler.py, the
schedule methods in stage_ea_model.py) with a single SPMD program over a
`stage` mesh axis: stage-sharded layers, `ppermute` activation hops,
`all_gather` verdicts, and a replicated draft/control plane (no broadcasts).
"""

from flowspec_tpu.parallel.pipeline import PipelineEngine
from flowspec_tpu.parallel.tp import TPEngine
from flowspec_tpu.parallel.mesh import (
    init_multihost, stage_mesh, stage_tp_mesh, tp_mesh,
)

__all__ = ["PipelineEngine", "TPEngine", "init_multihost", "stage_mesh",
           "stage_tp_mesh", "tp_mesh"]
