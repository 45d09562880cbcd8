"""bench.py end-to-end smokes on the CPU tiny model.

The bench is the driver's measurement entry point; its mode/knob plumbing
(engine construction, formats path, fused-loop signatures) must not rot.
These caught a real regression: the layout-pinned fused loop's
in_shardings arity broke when the loop gained an argument, which no
engine-level test exercised (tests construct engines without formats).
"""

import contextlib
import io
import json
import os

import pytest


def _run_bench(monkeypatch, **env):
    import bench
    monkeypatch.setenv("BENCH_CPU", "1")
    monkeypatch.setenv("BENCH_MODEL", "tiny")
    monkeypatch.setenv("BENCH_TOKENS", "12")
    for k, v in env.items():
        monkeypatch.setenv(k, str(v))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    rows = [json.loads(l) for l in buf.getvalue().splitlines()
            if l.startswith("{")]
    assert rows, buf.getvalue()
    return rows[-1]


def test_bench_spec_formats_path(monkeypatch):
    row = _run_bench(monkeypatch, BENCH_MODE="spec", BENCH_QUANT="none")
    assert row["value"] > 0 and "spec" in row["metric"]


def test_bench_serve_mode(monkeypatch):
    row = _run_bench(monkeypatch, BENCH_MODE="serve", BENCH_QUANT="none")
    assert row["slot_utilization"] > 0.5, row


def test_bench_ttft_mode(monkeypatch):
    row = _run_bench(monkeypatch, BENCH_MODE="ttft", BENCH_QUANT="none")
    assert row["unit"] == "ms" and row["value"] > 0


def test_bench_buckets_and_force_accept(monkeypatch):
    row = _run_bench(monkeypatch, BENCH_MODE="spec", BENCH_QUANT="none",
                     BENCH_SEQ="256", BENCH_BUCKETS="48,96",
                     BENCH_FORCE_ACCEPT="3")
    assert row["metric"].endswith("_fa3")
    assert row["accept_per_round"] > 2.0, row
