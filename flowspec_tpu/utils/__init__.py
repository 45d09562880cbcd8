"""Tools & observability: profiler, chat templates, autotuning."""

from flowspec_tpu.utils.profiler import Profiler, prof
from flowspec_tpu.utils.chat import build_prompt

__all__ = ["Profiler", "prof", "build_prompt"]
