"""Single-chip generation engine (reference: eagle/ea_model.py) and the
building blocks shared with the pipelined runtime."""

from flowspec_tpu.runtime.engine import SpecEngine

__all__ = ["SpecEngine"]
