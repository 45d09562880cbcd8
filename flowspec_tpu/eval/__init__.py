"""Benchmark / evaluation harness (ref eval/run_pipe_eval.py)."""

from flowspec_tpu.eval.harness import EvalResult, run_eval, load_questions

__all__ = ["EvalResult", "run_eval", "load_questions"]
