"""Chat templates, eval harness, profiler, length sweep."""

import json

import numpy as np

from flowspec_tpu.eval.harness import (
    EvalResult, length_sweep, load_questions, run_eval,
)
from flowspec_tpu.utils.chat import build_prompt
from flowspec_tpu.utils.profiler import Profiler


def test_vicuna_template():
    p = build_prompt([("Hello", None)])
    assert p.endswith("USER: Hello ASSISTANT:")
    p2 = build_prompt([("Hi", "Hey there"), ("Bye", None)])
    assert "Hey there</s>" in p2 and p2.endswith("USER: Bye ASSISTANT:")


def test_llama2_template():
    p = build_prompt([("Q1", None)], template="llama2")
    assert p.startswith("[INST] <<SYS>>") and p.endswith("[/INST]")
    p2 = build_prompt([("Q1", "A1"), ("Q2", None)], template="llama2")
    assert p2.count("[INST]") == 2 and "A1" in p2


def test_llama3_template():
    p = build_prompt([("Q", None)], template="llama3")
    assert p.startswith("<|begin_of_text|>")
    assert p.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_run_eval_multiturn(tmp_path):
    qfile = tmp_path / "question.jsonl"
    with open(qfile, "w") as f:
        for i in range(3):
            f.write(json.dumps({"question_id": i,
                                "turns": [f"q{i}a", f"q{i}b"]}) + "\n")
    qs = load_questions(str(qfile), limit=2)
    assert len(qs) == 2

    calls = []

    def fake_generate(tokens):
        calls.append(list(tokens))
        return list(tokens) + [7, 8, 9], {"new_tokens": 3, "rounds": 2,
                                          "turns": 5}

    res = run_eval(fake_generate,
                   tokenize=lambda s: [min(ord(c), 255) for c in s[:20]],
                   detokenize=lambda t: "x" * len(t),
                   questions=qs, name="fake",
                   results_path=str(tmp_path / "out.jsonl"))
    assert res.n_questions == 2
    assert res.n_conv_turns == 4           # 2 questions x 2 turns
    assert res.total_new_tokens == 12
    assert res.accept_per_round == 12 / 8
    assert res.accept_per_turn == 12 / 20
    # second turn prompt must include the first answer
    summary = json.loads(open(tmp_path / "out.jsonl").read())
    assert summary["new_tokens"] == 12


def test_length_sweep_picks_knee():
    # latency flat until 16 (latency-bound), linear after (compute-bound)
    def fake_forward(n):
        return 1.0 if n <= 16 else 1.0 * n / 16
    best = length_sweep(fake_forward, lengths=(4, 8, 16, 32, 64))
    assert best == 16


def test_profiler_stream_and_summary():
    prof = Profiler(sync=False)
    with prof.time_context("step"):
        pass
    with prof.time_context("step"):
        pass
    prof.mark("boundary")
    s = prof.summary()
    assert s["step"]["count"] == 2
    names = [e for e, _ in prof.stream]
    assert names == ["step:start", "step:stop", "step:start", "step:stop",
                     "boundary"]
    times = [t for _, t in prof.stream]
    assert times == sorted(times)


def test_sweep_cli(tmp_path):
    """The eval_params-style sweep CLI (ref eval/eval_params.py:196-205) runs
    a (depth, chunk_len) grid end-to-end on sample questions and writes one
    summary row per grid point x dataset."""
    import json
    from flowspec_tpu.eval.sweep import main

    out = tmp_path / "rows.jsonl"
    rows = main([
        "--cpu", "--random", "tiny", "--engine", "single",
        "--data", "data/qa/question.jsonl",
        "--limit", "1", "--depths", "3,4", "--expand-depths", "2",
        "--chunk-lens", "8", "--max-new-tokens", "8",
        "--out", str(out),
    ])
    assert len(rows) == 2
    assert {r["depth"] for r in rows} == {3, 4}
    assert all(r["new_tokens"] == 8 for r in rows)
    disk = [json.loads(l) for l in out.read_text().splitlines()]
    assert disk == rows


def test_show_timestamps_renders(tmp_path, capsys):
    """The timestamp-stream timeline CLI (ref records/show_timestamps.ipynb)
    renders a saved profiler record with per-event deltas and a gap list."""
    import sys
    sys.path.insert(0, "tools")
    from flowspec_tpu.utils.profiler import Profiler
    import show_timestamps

    p = Profiler(sync=False)
    p.mark("prefill")
    p.mark("turn0")
    p.mark("turn1")
    rec = tmp_path / "r.json"
    p.save(str(rec))
    show_timestamps.main([str(rec), "--top", "2"])
    out = capsys.readouterr().out
    assert "turn0" in out and "top 2 gaps" in out
