"""Single-chip generation engine (reference: eagle/ea_model.py) and the
building blocks shared with the pipelined runtime."""

from flowspec_tpu.runtime.engine import SpecEngine
from flowspec_tpu.runtime.batched import BatchedSpecEngine

__all__ = ["SpecEngine", "BatchedSpecEngine"]
