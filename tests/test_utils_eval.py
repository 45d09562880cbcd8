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


def test_sweep_cli_serve_engine_prefix_cache(tmp_path):
    """--engine serve runs the whole dataset through continuous batching
    (run_eval_serve); --prefix-cache auto-detects the chat template's
    shared preamble and spends fewer device rounds for the same tokens."""
    from flowspec_tpu.eval.sweep import main

    base = ["--cpu", "--random", "tiny", "--engine", "serve",
            "--serve-slots", "2",
            "--data", "data/mt_bench/question.jsonl",
            "--limit", "4", "--depths", "3", "--expand-depths", "2",
            "--chunk-lens", "8", "--max-new-tokens", "8",
            "--max-seq-len", "512"]
    r0 = main(base + ["--out", str(tmp_path / "a.jsonl")])[0]
    r1 = main(base + ["--prefix-cache", "--queue-order", "sjf",
                      "--out", str(tmp_path / "b.jsonl")])[0]
    assert r0["new_tokens"] == r1["new_tokens"] == 32
    assert r1["rounds"] < r0["rounds"], (r1["rounds"], r0["rounds"])
    assert r1["prefix_cache"] and r1["queue_order"] == "sjf"
    assert 0 < r1["slot_utilization"] <= 1


def test_sweep_cli_temperature_grid_resume(tmp_path):
    """--temperatures sweeps T as the outer axis (ref run_pipe_eval.py:191)
    and --resume + --no-fused route through the host loop with KV reuse."""
    from flowspec_tpu.eval.sweep import main

    out = tmp_path / "rows.jsonl"
    rows = main([
        "--cpu", "--random", "tiny", "--engine", "single",
        "--data", "data/mt_bench/question.jsonl",
        "--limit", "1", "--max-conv-turns", "2",
        "--depths", "3", "--expand-depths", "2", "--chunk-lens", "8",
        "--temperatures", "0,1", "--resume", "--no-fused",
        "--max-new-tokens", "8", "--out", str(out),
    ])
    assert len(rows) == 2
    assert [r["temperature"] for r in rows] == [0.0, 1.0]
    # two conversation turns, the second continued via KV reuse
    assert all(r["resume_hits"] == 1 for r in rows)
    assert all(r["accept_per_round"] is not None for r in rows)


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


def test_run_eval_resume_matches_full_prefill():
    """--resume (r2 verdict #4): the harness multi-turn loop continuing via
    resume_and_generate must produce the same answers as full re-prefill,
    and must actually take the resume path (byte tokenizer is prefix-exact)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flowspec_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig, TreeConfig,
    )
    from flowspec_tpu.draft.eagle import init_eagle_params
    from flowspec_tpu.models.llama import init_llama_params
    from flowspec_tpu.runtime.engine import SpecEngine
    from flowspec_tpu.eval.sweep import byte_tokenizer

    mc = ModelConfig.tiny(vocab_size=512, n_layers=2)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    base = init_llama_params(jax.random.key(0), mc, dtype=jnp.float32)
    draft = init_eagle_params(jax.random.key(9), mc, embed=base.embed,
                              dtype=jnp.float32)
    tc = TreeConfig(top_k=4, depth=3, total_tokens=12, node_cap=24,
                    leaf_cap=24, depth_cap=8, chunk_len=8)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_seq_len=512, prefill_chunk=16)
    eng = SpecEngine(base, draft, cfg)
    tok, detok = byte_tokenizer(mc.vocab_size)
    qs = [{"question_id": 1, "turns": ["What is a tree?", "And a leaf?"]}]

    gen = lambda t: eng.generate(t, max_new_tokens=12, eos_token_id=-1)
    base_res = run_eval(gen, tok, detok, qs, max_turns=2)
    res = run_eval(gen, tok, detok, qs, max_turns=2,
                   engine=eng, resume=True, max_new_tokens=12)
    assert res.resume_hits == 1            # turn 2 resumed
    assert res.total_new_tokens == base_res.total_new_tokens == 24
    # greedy determinism: the resumed second turn saw the same context, so
    # totals (and the underlying token streams) match the re-prefill run
    assert res.total_rounds == base_res.total_rounds


def test_profiler_memory_context():
    """memory_context (ref profiler/profiler.py:137-194): allocated-delta
    and peak land in the summary. CPU backend exposes no stats -> the
    context still works and reports zeros."""
    import jax
    import jax.numpy as jnp
    from flowspec_tpu.utils.profiler import Profiler
    p = Profiler(sync=True)
    with p.memory_context("alloc"):
        x = jnp.ones((256, 256), jnp.float32) * 2.0
        jax.block_until_ready(x)
    s = p.summary()
    assert "alloc" in s and "alloc_delta_mb" in s["alloc"]
    assert s["alloc"]["count"] == 1 and s["alloc"]["total_s"] > 0
    stats = Profiler.memory_stats()
    assert set(stats) == {"bytes_in_use", "peak_bytes_in_use",
                          "bytes_limit"}
    with p.profile_context("both"):
        pass
    assert "both" in p.summary()
    p.reset()
    assert p.memory == {}


def test_run_eval_serve_multiturn_resumes_conversations():
    """run_eval_serve(max_turns=2) serves every question's turn 1, stores
    per-conversation lane snapshots, then serves turn 2 with KV resume —
    one row per turn, turn-2 row records the resumed count and spends
    fewer admission->finish rounds than a full re-prefill would."""
    import jax
    import jax.numpy as jnp
    from flowspec_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig, TreeConfig)
    from flowspec_tpu.draft.eagle import init_eagle_params
    from flowspec_tpu.models.llama import init_llama_params
    from flowspec_tpu.eval.harness import run_eval_serve

    mc = ModelConfig.tiny(vocab_size=512, n_layers=2)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    tc = TreeConfig(top_k=4, depth=3, total_tokens=12, node_cap=16,
                    leaf_cap=16, depth_cap=8)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_seq_len=768, prefill_chunk=16)
    p = init_llama_params(jax.random.key(0), mc, dtype=jnp.float32)
    d = init_eagle_params(jax.random.key(9), mc, embed=p.embed,
                          dtype=jnp.float32)
    from flowspec_tpu.runtime.batched import BatchedSpecEngine
    eng = BatchedSpecEngine(p, d, cfg, batch_size=2, adapt_tree=False)

    tok = lambda s: [3 + (b % 500) for b in s.encode()][:200]
    detok = lambda ts: bytes(int(max(0, t - 3)) % 256
                             for t in ts).decode("latin-1")
    qs = [{"turns": ["hi there", "more please"]},
          {"turns": ["hello you", "go on"]},
          {"turns": ["hey world", "and then"]}]
    rows = run_eval_serve(eng, tok, qs, max_new_tokens=6,
                          max_turns=2, detokenize=detok, warmup=False)
    assert len(rows) == 2
    assert rows[0]["turn"] == 1 and rows[1]["turn"] == 2
    assert rows[1]["resumed"] == 3, rows[1]
    # turn-2 prompts are ~2x longer, but resumed lanes chain only the new
    # turn: its p50 latency must not balloon with conversation length
    assert rows[1]["latency_rounds_p50"] <= \
        rows[0]["latency_rounds_p50"] + 4, rows
