"""Evaluation harness: dataset sweeps with throughput/acceptance metrics.

Reference: eval/run_pipe_eval.py — iterates temperatures x pipeline_types x
datasets x questions, multi-turn conversations, measures per-question decode
time, and reports throughput = sum(tokens)/sum(time), average latency, and
mean accepted length per round/turn (:340-360). Dataset files are jsonl with
{"question_id": ..., "turns": [str, ...]} (ref data/*/question.jsonl).
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable, List, Optional, Sequence

import numpy as np

from flowspec_tpu.utils.chat import build_prompt


@dataclasses.dataclass
class EvalResult:
    name: str
    total_new_tokens: int = 0
    total_decode_s: float = 0.0
    total_rounds: int = 0
    total_turns: int = 0
    n_questions: int = 0
    n_conv_turns: int = 0

    @property
    def throughput(self) -> float:
        return self.total_new_tokens / max(self.total_decode_s, 1e-9)

    @property
    def avg_latency(self) -> float:
        return self.total_decode_s / max(self.n_questions, 1)

    @property
    def accept_per_round(self):
        """None when the engine doesn't track rounds (the fused pipeline
        loop runs rounds on-device and reports rounds=-1)."""
        if self.total_rounds <= 0:
            return None
        return self.total_new_tokens / self.total_rounds

    @property
    def accept_per_turn(self) -> float:
        return self.total_new_tokens / max(self.total_turns, 1)

    def summary(self) -> dict:
        return {
            "name": self.name,
            "questions": self.n_questions,
            "conversation_turns": self.n_conv_turns,
            "new_tokens": self.total_new_tokens,
            "throughput_tok_s": round(self.throughput, 3),
            "avg_latency_s": round(self.avg_latency, 3),
            "accept_per_round": (None if self.accept_per_round is None
                                 else round(self.accept_per_round, 3)),
            "accept_per_turn": round(self.accept_per_turn, 3),
        }


def load_questions(path: str, limit: Optional[int] = None) -> List[dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
            if limit and len(out) >= limit:
                break
    return out


def run_eval(
    generate: Callable,            # (prompt_tokens) -> (tokens, stats)
    tokenize: Callable[[str], Sequence[int]],
    detokenize: Callable[[Sequence[int]], str],
    questions: List[dict],
    name: str = "eval",
    template: str = "vicuna",
    max_turns: int = 2,
    results_path: Optional[str] = None,
) -> EvalResult:
    """Multi-turn loop mirroring run_pipe_eval.py:200-320: each turn's
    generated answer is appended to the conversation before the next turn."""
    res = EvalResult(name=name)
    for q in questions:
        convo: List[tuple] = []
        for turn_text in q.get("turns", [])[:max_turns]:
            convo.append((turn_text, None))
            prompt = build_prompt(convo, template=template)
            tokens = list(tokenize(prompt))
            t0 = time.perf_counter()
            out, stats = generate(tokens)
            dt = time.perf_counter() - t0
            answer_tokens = out[len(tokens):]
            answer = detokenize(answer_tokens)
            convo[-1] = (turn_text, answer)

            res.total_new_tokens += stats.get("new_tokens",
                                              len(answer_tokens))
            res.total_decode_s += dt
            # the fused pipeline loop reports rounds=-1 (rounds are not
            # tracked on-device); don't let the sentinel poison the mean
            res.total_rounds += max(stats.get("rounds", 0), 0)
            res.total_turns += stats.get("turns", stats.get("rounds", 0))
            res.n_conv_turns += 1
        res.n_questions += 1
    if results_path:
        with open(results_path, "a") as f:
            f.write(json.dumps(res.summary()) + "\n")
    return res


def length_sweep(forward_at_len: Callable[[int], float],
                 lengths: Sequence[int] = (4, 8, 16, 24, 32, 48, 64),
                 threshold: float = 0.95) -> int:
    """Chunk-length autotune (ref tools/length_sweep.py:5-30): pick the
    largest length whose per-token latency still improves by >= threshold
    relative to linear scaling — i.e. the knee where the forward stops being
    latency-bound. `forward_at_len(n)` returns measured seconds."""
    times = [forward_at_len(n) for n in lengths]
    best = lengths[0]
    for (n0, t0), (n1, t1) in zip(zip(lengths, times),
                                  zip(lengths[1:], times[1:])):
        # cost growth per token-ratio; sub-linear growth means still amortized
        if t1 / t0 < threshold * (n1 / n0):
            best = n1
        else:
            break
    return best
