"""Run the full hardware bench matrix in ONE process.

Through the tunneled backend every process pays its compiles remotely
(the persistent cache does not capture them — CLAUDE.md), and building
the 7B int8 params alone costs ~6-13 min of remote compiles. bench.py
stays the driver's standalone single-metric entry point; this suite
shares one param build across all modes and appends one JSON row per
mode to BENCH_SUITE_r03.jsonl.

Env: SUITE_MODES=comma list (default all), SUITE_MODEL=7b,
SUITE_OUT=path. Run: python tools/bench_suite.py   (holds the TPU)
"""

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import numpy as np

MODEL = os.environ.get("SUITE_MODEL", "7b")
OUT = os.environ.get("SUITE_OUT", os.path.join(_ROOT,
                                               "BENCH_SUITE_r05.jsonl"))
ALL_MODES = ("spec_trained", "spec_random", "ar", "t1_trained",
             "serve4", "batch4", "stream", "longgen", "serve_sched",
             "serve_prefix", "stream_prefix", "stream_preempt",
             "serve_tree_ab", "stream_dyntree", "stream_dynbatch_tail",
             "serve_multiturn")
SB = int(os.environ.get("SUITE_BATCH", "4"))
MODES = [m for m in os.environ.get("SUITE_MODES",
                                   ",".join(ALL_MODES)).split(",") if m]


def emit(row):
    row["model"] = MODEL
    print("ROW " + json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def timed(gen, prompt, n_tokens):
    gen(prompt, max_new_tokens=n_tokens, eos_token_id=-1)   # warmup+compile
    t0 = time.perf_counter()
    out, stats = gen(prompt, max_new_tokens=n_tokens, eos_token_id=-1)
    dt = time.perf_counter() - t0
    return stats["new_tokens"] / dt, stats


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/flowspec_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from bench import build_params
    from flowspec_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig, TreeConfig)
    from flowspec_tpu.draft.eagle import load_thin_draft, \
        quantize_eagle_params
    from flowspec_tpu.runtime.engine import SpecEngine
    from flowspec_tpu.runtime.batched import BatchedSpecEngine

    struct_parts = None
    if MODEL == "tiny":        # CPU smoke of the suite itself
        jax.config.update("jax_platforms", "cpu")
        mc, quant = ModelConfig.tiny(), "none"
    elif MODEL == "7b":
        mc, quant = ModelConfig.llama_7b(), "int8"
    elif MODEL == "struct":
        # the TRAINED ~0.5B structured base (r4: the whole serving matrix
        # on real dynamics with a learned draft — r3 verdict #1). bf16;
        # SUITE_QUANT=int8 optionally quantizes it.
        from bench import build_struct_params
        struct_parts = build_struct_params()
        mc, quant = struct_parts[0], os.environ.get("SUITE_QUANT", "none")
    else:
        mc, quant = ModelConfig.llama_13b(), "mixed"
    n_tokens = 256 if MODEL != "tiny" else 32
    max_seq = 64 + n_tokens + 24
    # reference-parity tree for random-draft rows; swept optimum (depth 8,
    # score_temperature 0.2 — tools/stemp_probe.py) for trained-draft rows,
    # matching bench.py's defaults. SUITE_DEPTH/SUITE_STEMP override.
    tc = TreeConfig(node_cap=96, leaf_cap=96, depth_cap=16)
    _sd = int(os.environ.get("SUITE_DEPTH", "8"))
    _st = int(os.environ.get("SUITE_TOTAL", "80"))
    # swept greedy optima differ per base: the random 7b base wants
    # tau 0.2 (flat softmax needs hard sharpening, SWEEP_r03), the
    # trained struct base wants tau 0.6 (SWEEP_r05_struct: accept 7.39
    # vs 6.10, end-to-end 1158 vs 1075 tok/s; deeper trees lose on beam
    # time — SWEEP_r05_struct_fine)
    tc_tuned = TreeConfig(
        total_tokens=_st, node_cap=max(96, _st + 16),
        leaf_cap=max(96, _st + 16),
        depth=_sd, depth_cap=max(16, _sd + 2),
        score_temperature=float(os.environ.get(
            "SUITE_STEMP", "0.6" if MODEL == "struct" else "0.2")))
    # the T=1 row gets its OWN swept tree (the stochastic optimum differs
    # from greedy — acceptance is bounded by probability mass, not
    # candidate count; r4 struct sweep); defaults to the greedy tree
    t1d = int(os.environ.get("SUITE_T1_DEPTH",
                             os.environ.get("SUITE_DEPTH", "8")))
    tc_t1 = TreeConfig(
        node_cap=96, leaf_cap=96, depth=t1d, depth_cap=max(16, t1d + 2),
        total_tokens=int(os.environ.get("SUITE_T1_TOTAL", "80")),
        score_temperature=float(os.environ.get(
            "SUITE_T1_STEMP", os.environ.get("SUITE_STEMP", "0.2"))))

    def cfg_of(temp=0.0, max_new=n_tokens, mseq=max_seq, buckets=(),
               tuned=False):
        tree = (tc_t1 if (tuned and temp > 0)
                else tc_tuned if tuned else tc)
        return EngineConfig(model=mc, tree=tree,
                            sampling=SamplingConfig(temperature=temp),
                            max_new_tokens=max_new, max_seq_len=mseq,
                            kv_buckets=buckets)

    print(f"building {quant} {MODEL} base...", flush=True)
    t0 = time.time()
    if struct_parts is not None:
        from flowspec_tpu.draft.eagle import init_eagle_params
        _, params, trained = struct_parts
        rnd_draft = init_eagle_params(jax.random.key(1), mc,
                                      embed=params.embed)
        if quant != "none":
            from flowspec_tpu.models.llama import quantize_llama_params
            params = quantize_llama_params(params, quant)
            qd = "int8" if quant == "mixed" else quant
            trained = quantize_eagle_params(trained, qd)
            rnd_draft = quantize_eagle_params(rnd_draft, qd)
    else:
        params, rnd_draft = build_params(mc, quant)
        ckpt = os.path.join(_ROOT, "checkpoints",
                            f"draft_{MODEL}_thin_fp16.npz")
        trained = None
        if os.path.exists(ckpt):
            trained = quantize_eagle_params(
                load_thin_draft(ckpt, params.embed),
                "int8" if quant == "mixed" else quant)
    print(f"built in {time.time()-t0:.0f}s", flush=True)

    rng0 = np.random.default_rng(0)
    prompt = rng0.integers(10, 1000, 64)

    for mode in MODES:
        print(f"=== {mode} ===", flush=True)
        t_mode = time.time()
        sb = SB     # slots for every batched mode (13B fits 2, not 4)
        try:
            if mode in ("spec_trained", "spec_random", "t1_trained"):
                d = rnd_draft if mode == "spec_random" else trained
                if d is None:
                    print("no trained checkpoint; skip", flush=True)
                    continue
                tuned = mode != "spec_random" and trained is not None
                eng = SpecEngine(params, d, cfg_of(
                    temp=1.0 if mode.startswith("t1") else 0.0,
                    tuned=tuned))
                tps, stats = timed(eng.generate_fused, prompt, n_tokens)
                emit({"mode": mode, "tok_s": round(tps, 2),
                      "accept_per_round": round(
                          stats.get("accept_per_round") or 0, 3),
                      "rounds": stats.get("rounds"),
                      "tree": (f"d{eng.cfg.tree.depth}"
                               f"/tau{eng.cfg.tree.score_temperature:g}")})
            elif mode == "ar":
                eng = SpecEngine(params, rnd_draft, cfg_of())
                tps, stats = timed(eng.generate_ar_fused, prompt, n_tokens)
                emit({"mode": mode, "tok_s": round(tps, 2)})
            elif mode in ("serve4", "batch4", "stream"):
                d = trained or rnd_draft
                # SUITE_BATCH/SUITE_MSEQ right-size the slots for memory:
                # 13B mixed OOMs at 4x384-row lanes beside 9GB of weights
                # (BENCH_SUITE rows r03); batch 2 fits
                sb = int(os.environ.get("SUITE_BATCH", "4"))
                eng = BatchedSpecEngine(
                    params, d,
                    cfg_of(mseq=int(os.environ.get("SUITE_MSEQ", "384")),
                           tuned=trained is not None),
                    batch_size=sb)
                prompts = [rng0.integers(10, 1000, 64) for _ in range(2 * sb)]
                if mode == "serve4":
                    gen = lambda p_, **kw: eng.serve(
                        prompts, rounds_per_dispatch=256, **kw)
                    tps, stats = timed(gen, prompt, 128)
                    emit({"mode": mode, "batch": sb,
                          "tok_s": round(tps, 2),
                          "slot_utilization": round(
                              stats["slot_utilization"], 3),
                          "tree_nodes": eng.cfg.tree.node_cap,
                          "draft": "trained" if trained else "random"})
                elif mode == "batch4":
                    gen = lambda p_, **kw: eng.generate_batch_fused(
                        prompts[:sb], **kw)
                    tps, stats = timed(gen, prompt, 128)
                    emit({"mode": mode, "tok_s": round(tps, 2),
                          "draft": "trained" if trained else "random"})
                else:
                    rps = 4.0
                    # SUITE_STREAM_K trades dispatch-overhead amortization
                    # (28ms per dispatch = 1 tunnel RTT, PROFILE_serve.md)
                    # against admission granularity (arrivals wait up to
                    # K rounds for a host boundary)
                    sk = int(os.environ.get("SUITE_STREAM_K", "8"))
                    gaps = np.random.default_rng(3).exponential(
                        1 / rps, len(prompts))
                    gaps[0] = 0
                    arr = np.cumsum(gaps).tolist()
                    eng.serve_stream(prompts[:2], [0, 0], max_new_tokens=8,
                                     eos_token_id=-1,
                                     rounds_per_dispatch=sk)
                    t0 = time.perf_counter()
                    outs, stats = eng.serve_stream(
                        prompts, arr, max_new_tokens=128, eos_token_id=-1,
                        rounds_per_dispatch=sk)
                    dt = time.perf_counter() - t0
                    emit({"mode": mode if sk == 8 else f"{mode}_k{sk}",
                          "tok_s": round(stats["new_tokens"] / dt, 2),
                          "admission_p50_s": round(
                              stats["admission_p50_s"], 3),
                          "admission_p95_s": round(
                              stats["admission_p95_s"], 3),
                          "completion_p50_s": round(
                              stats["completion_p50_s"], 3),
                          "completion_p95_s": round(
                              stats["completion_p95_s"], 3),
                          "slot_utilization": round(
                              stats["slot_utilization"], 3),
                          "draft": "trained" if trained else "random"})
            elif mode == "serve_sched":
                # admission policy A/B on a tail-wave workload: 7 short
                # requests + one 4x-long one submitted LAST. fifo leaves
                # the long job draining alone at the end; lpt admits it
                # first. One engine — the serve scan is policy-independent,
                # so all three rows share one compile.
                d = trained or rnd_draft
                eng = BatchedSpecEngine(params, d,
                                        cfg_of(mseq=384,
                                               tuned=trained is not None),
                                        batch_size=sb)
                prompts = [rng0.integers(10, 1000, 64) for _ in range(8)]
                budgets = [32] * 7 + [128]

                def run(pol):
                    return eng.serve(prompts, max_new_tokens=budgets,
                                     eos_token_id=-1,
                                     rounds_per_dispatch=256,
                                     queue_order=pol)
                run("fifo")                     # warmup + compile
                for pol in ("fifo", "sjf", "lpt"):
                    t0 = time.perf_counter()
                    outs, stats = run(pol)
                    dt = time.perf_counter() - t0
                    emit({"mode": f"serve_sched_{pol}",
                          "tok_s": round(stats["new_tokens"] / dt, 2),
                          "rounds": stats["rounds"],
                          "slot_utilization": round(
                              stats["slot_utilization"], 3),
                          "budgets": "32x7+128",
                          "draft": "trained" if trained else "random"})
            elif mode == "serve_tree_ab":
                # batch-adaptive tree A/B with the TRAINED draft: the
                # 96->32-node shrink table came from the random-draft
                # profile (verify goes MXU-bound at T=B*nodes); a trained
                # draft earns more acceptance from the bigger tree, so the
                # optimum may differ — measure both.
                d = trained or rnd_draft
                prompts = [rng0.integers(10, 1000, 64) for _ in range(8)]
                for adapt in (True, False):
                    eng = BatchedSpecEngine(
                        params, d,
                        cfg_of(mseq=384, tuned=trained is not None),
                        batch_size=sb, adapt_tree=adapt)
                    gen = lambda p_, **kw: eng.serve(
                        prompts, rounds_per_dispatch=256, **kw)
                    tps, stats = timed(gen, prompt, 128)
                    emit({"mode": ("serve4_adaptive" if adapt
                                   else "serve4_fulltree"),
                          "tok_s": round(tps, 2),
                          "tree_nodes": eng.cfg.tree.node_cap,
                          "rounds": stats["rounds"],
                          "slot_utilization": round(
                              stats["slot_utilization"], 3),
                          "draft": "trained" if trained else "random"})
            elif mode == "serve_prefix":
                # prefix-cache A/B: 8 requests sharing a 192-token system
                # prefix (16-token distinct suffixes), 64 new tokens each,
                # 4 slots. With shared_prefix the prefix's ~13 chain rounds
                # are paid once (template) instead of once per request.
                # Same scan program both ways (the template consts are
                # dynamic args) — one compile.
                d = trained or rnd_draft
                eng = BatchedSpecEngine(params, d,
                                        cfg_of(mseq=384,
                                               tuned=trained is not None),
                                        batch_size=sb)
                shared = rng0.integers(10, 1000, 192).tolist()
                prompts = [shared + rng0.integers(10, 1000, 16).tolist()
                           for _ in range(8)]

                def run(cache):
                    kw = {"shared_prefix": shared} if cache else {}
                    return eng.serve(prompts, max_new_tokens=64,
                                     eos_token_id=-1,
                                     rounds_per_dispatch=256, **kw)
                run(False)                      # warmup + compile
                # three rows: off / on with a COLD template (pays the
                # one-time prefix prefill + lane-builder compile) / on with
                # the template CACHED (every later workload on the same
                # system prompt — the steady state)
                for tag in ("off", "on_cold", "on_cached"):
                    t0 = time.perf_counter()
                    outs, stats = run(tag != "off")
                    dt = time.perf_counter() - t0
                    lr = sorted(stats["latency_rounds"])
                    emit({"mode": f"serve_prefix_{tag}",
                          "tok_s": round(stats["new_tokens"] / dt, 2),
                          "rounds": stats["rounds"],
                          "latency_rounds_p50": int(lr[len(lr) // 2]),
                          "prefix": 192, "suffix": 16,
                          "draft": "trained" if trained else "random"})
            elif mode == "stream_prefix":
                # streaming-arrival prefix A/B: the TTFT story in seconds.
                # Requests share a 192-token system prefix and arrive
                # Poisson(4/s); with shared_prefix an admission consumes
                # only the 16-token suffix (1-2 chain rounds) instead of
                # the full 208-token prompt (~14 rounds), so
                # arrival->admission and arrival->completion both drop.
                d = trained or rnd_draft
                eng = BatchedSpecEngine(params, d,
                                        cfg_of(mseq=384,
                                               tuned=trained is not None),
                                        batch_size=sb)
                shared = rng0.integers(10, 1000, 192).tolist()
                prompts = [shared + rng0.integers(10, 1000, 16).tolist()
                           for _ in range(12)]
                gaps = np.random.default_rng(3).exponential(0.25,
                                                            len(prompts))
                gaps[0] = 0
                arr = np.cumsum(gaps).tolist()
                # warmup compiles the K=8 dispatch program
                eng.serve_stream(prompts[:2], [0, 0], max_new_tokens=8,
                                 eos_token_id=-1, rounds_per_dispatch=8)
                # on_cold pays the one-time template prefill + lane-builder
                # compile inside its wall clock; on_cached (the steady
                # state — the engine caches templates across calls) does not
                for tag in ("off", "on_cold", "on_cached"):
                    kw = ({"shared_prefix": shared} if tag != "off"
                          else {})
                    t0 = time.perf_counter()
                    outs, stats = eng.serve_stream(
                        prompts, arr, max_new_tokens=64, eos_token_id=-1,
                        rounds_per_dispatch=8, **kw)
                    dt = time.perf_counter() - t0
                    emit({"mode": f"stream_prefix_{tag}",
                          "tok_s": round(stats["new_tokens"] / dt, 2),
                          "admission_p50_s": round(
                              stats["admission_p50_s"], 3),
                          "admission_p95_s": round(
                              stats["admission_p95_s"], 3),
                          "completion_p50_s": round(
                              stats["completion_p50_s"], 3),
                          "completion_p95_s": round(
                              stats["completion_p95_s"], 3),
                          "prefix": 192, "suffix": 16,
                          "draft": "trained" if trained else "random"})
            elif mode == "stream_preempt":
                # preemption A/B: 4 long requests occupy all 4 slots, then
                # 4 short ones arrive. Without preemption each short waits
                # for a long to drain; with it, one long pauses (state
                # lifted off the lane), the shorts flow through, the long
                # resumes exactly. Report per-class completion p50s.
                d = trained or rnd_draft
                eng = BatchedSpecEngine(params, d,
                                        cfg_of(mseq=384,
                                               tuned=trained is not None),
                                        batch_size=sb)
                # shorts land at 0.3s, early in the longs' ~1.2s residency
                # (with the trained draft a 256-token long takes ~32 rounds;
                # arrivals later than that never see a full batch)
                prompts = [rng0.integers(10, 1000, 64) for _ in range(8)]
                budgets = [256] * 4 + [16] * 4
                # SUITE_PREEMPT_AT moves the shorts' arrival: late
                # arrivals (longs nearly done) exercise the cost gate's
                # SKIP branch — pausing would cost more than waiting
                arr = [0.0] * 4 + [float(os.environ.get(
                    "SUITE_PREEMPT_AT", "0.3"))] * 4
                eng.serve_stream(prompts[:2], [0, 0], max_new_tokens=8,
                                 eos_token_id=-1, rounds_per_dispatch=4)
                for pf in (None, 4.0):
                    t0 = time.perf_counter()
                    outs, stats = eng.serve_stream(
                        prompts, arr, max_new_tokens=budgets,
                        eos_token_id=-1, rounds_per_dispatch=4,
                        preempt_factor=pf)
                    dt = time.perf_counter() - t0
                    cs = stats["completion_s"]
                    p50 = lambda xs: float(np.percentile(xs, 50))
                    emit({"mode": ("stream_preempt_on" if pf
                                   else "stream_preempt_off"),
                          "tok_s": round(stats["new_tokens"] / dt, 2),
                          "preemptions": stats["preemptions"],
                          "preempt_cost_skips":
                              stats.get("preempt_cost_skips", 0),
                          "short_completion_p50_s": round(p50(cs[4:]), 3),
                          "long_completion_p50_s": round(p50(cs[:4]), 3),
                          "budgets": "256x4+16x4@0.3s",
                          "draft": "trained" if trained else "random"})
            elif mode == "stream_dyntree":
                # dynamic-tree A/B under streaming arrivals at utilization
                # < 0.85 (r3 verdict #4): with idle lanes, the per-dispatch
                # variant picks the bigger per-lane trees the B=1/2
                # measurements prefer. Sparse arrivals keep lanes half-idle.
                d = trained or rnd_draft
                prompts = [rng0.integers(10, 1000, 64) for _ in range(8)]
                gaps = np.random.default_rng(5).exponential(0.6,
                                                            len(prompts))
                gaps[0] = 0
                arr = np.cumsum(gaps).tolist()
                for dyn, dynb in ((False, False), (True, False),
                                  (True, True)):
                    eng = BatchedSpecEngine(
                        params, d,
                        cfg_of(mseq=int(os.environ.get("SUITE_MSEQ",
                                                       "384")),
                               tuned=trained is not None),
                        batch_size=sb, dynamic_tree=dyn,
                        dynamic_batch=dynb)
                    # warm EVERY variant program DETERMINISTICALLY
                    # (warmup compiles one scan per reachable active-lane
                    # count) — which variants an exact-workload warm run
                    # visits depends on wall-clock arrival timing, so a
                    # compile could still land inside the timed run (r5:
                    # two dyntree ON rows measured 30.7 and 74.7 tok/s
                    # purely from that); then one workload pass for the
                    # stream bookkeeping programs
                    eng.warmup(ks=(8,))
                    eng.serve_stream(prompts, arr, max_new_tokens=128,
                                     eos_token_id=-1,
                                     rounds_per_dispatch=8)
                    t0 = time.perf_counter()
                    outs, stats = eng.serve_stream(
                        prompts, arr, max_new_tokens=128, eos_token_id=-1,
                        rounds_per_dispatch=8)
                    dt = time.perf_counter() - t0
                    emit({"mode": ("stream_dyn_tree_batch" if dynb
                                   else "stream_dyntree_on" if dyn
                                   else "stream_dyntree_off"),
                          "tok_s": round(stats["new_tokens"] / dt, 2),
                          "accept_per_round": round(
                              stats["accept_per_round"], 3),
                          "completion_p50_s": round(
                              stats["completion_p50_s"], 3),
                          "min_width": stats.get("min_width"),
                          "slot_utilization": round(
                              stats["slot_utilization"], 3),
                          "draft": "trained" if trained else "random"})
            elif mode == "stream_dynbatch_tail":
                # dynamic batch width on its DESIGN workload: a drain
                # tail. All requests arrive at t=0; after the 7 shorts
                # drain, one long runs alone for ~96 tokens — the narrow
                # dispatch pays 1/4 the verify compute per round. (Under
                # CONTINUOUS arrivals dynamic_batch LOSES — narrow
                # dispatches can't admit waiting arrivals until the next
                # boundary: 146 vs 343 tok/s, suite r5 stream_dyntree
                # rows — which is why it's opt-in.)
                d = trained or rnd_draft
                prompts = [rng0.integers(10, 1000, 64) for _ in range(8)]
                budgets = [32] * 7 + [128]
                arr = [0.0] * 8
                for dynb in (False, True):
                    eng = BatchedSpecEngine(
                        params, d,
                        cfg_of(mseq=int(os.environ.get("SUITE_MSEQ",
                                                       "384")),
                               tuned=trained is not None),
                        batch_size=sb, dynamic_batch=dynb)
                    eng.serve_stream(prompts, arr, max_new_tokens=budgets,
                                     eos_token_id=-1,
                                     rounds_per_dispatch=8)   # warm all
                    t0 = time.perf_counter()
                    outs, stats = eng.serve_stream(
                        prompts, arr, max_new_tokens=budgets,
                        eos_token_id=-1, rounds_per_dispatch=8)
                    dt = time.perf_counter() - t0
                    emit({"mode": ("stream_dynbatch_tail_on" if dynb
                                   else "stream_dynbatch_tail_off"),
                          "tok_s": round(stats["new_tokens"] / dt, 2),
                          "wall_s": round(dt, 3),
                          "min_width": stats.get("min_width"),
                          "completion_p95_s": round(
                              stats["completion_p95_s"], 3),
                          "budgets": "32x7+128@t0",
                          "draft": "trained" if trained else "random"})
            elif mode == "serve_multiturn":
                # multi-turn conversation serving (r3 verdict #6): turn 2
                # resumes every conversation's KV from its stored lane
                # snapshot and chain-prefills only the new turn; the A/B
                # is against re-serving the full turn-2 prompts cold.
                from flowspec_tpu.runtime.batched import ConversationStore
                d = trained or rnd_draft
                eng = BatchedSpecEngine(params, d,
                                        cfg_of(mseq=int(os.environ.get(
                                            "SUITE_MSEQ", "512")),
                                               tuned=trained is not None),
                                        batch_size=sb)
                # SUITE_MT_CONVS right-sizes the store: each entry pins a
                # full per-lane KV snapshot (~420MB at 13B/512 rows — 8
                # of them beside 9GB of weights OOMed the 16GB chip)
                n_c = int(os.environ.get("SUITE_MT_CONVS", "8"))
                t1 = [rng0.integers(10, 1000, 64).tolist()
                      for _ in range(n_c)]
                store = ConversationStore(max_items=n_c)
                ids = list(range(n_c))
                eng.serve(t1[:2], max_new_tokens=8, eos_token_id=-1,
                          rounds_per_dispatch=16,
                          conversations=ConversationStore(max_items=2),
                          conversation_ids=[-1, -2])   # warm the compiles
                t0 = time.perf_counter()
                mt_tok = int(os.environ.get("SUITE_MT_TOKENS", "64"))
                outs1, st1 = eng.serve(t1, max_new_tokens=mt_tok,
                                       eos_token_id=-1,
                                       rounds_per_dispatch=16,
                                       conversations=store,
                                       conversation_ids=ids)
                dt1 = time.perf_counter() - t0
                t2 = [[int(x) for x in o]
                      + rng0.integers(10, 1000, 16).tolist()
                      for o in outs1]
                # warm the resumed-fill programs (stacked snapshot build)
                # on a THROWAWAY store clone so the timed resumed arm
                # measures serving, not its one-time compile
                eng.serve(t2, max_new_tokens=4, eos_token_id=-1,
                          rounds_per_dispatch=16,
                          conversations=store.clone(),
                          conversation_ids=ids)
                for tag, kw in (("resumed", dict(conversations=store,
                                                 conversation_ids=ids)),
                                ("cold", {})):
                    t0 = time.perf_counter()
                    outs2, st2 = eng.serve(t2, max_new_tokens=mt_tok,
                                           eos_token_id=-1,
                                           rounds_per_dispatch=16, **kw)
                    dt2 = time.perf_counter() - t0
                    lr = sorted(st2["latency_rounds"])
                    emit({"mode": f"serve_turn2_{tag}",
                          "tok_s": round(st2["new_tokens"] / dt2, 2),
                          "rounds": st2["rounds"],
                          "latency_rounds_p50": int(lr[len(lr) // 2]),
                          "resumed_turns": st2.get("resumed_turns", 0),
                          "turn1_tok_s": round(st1["new_tokens"] / dt1, 2),
                          "draft": "trained" if trained else "random"})
            elif mode == "longgen":
                # SUITE_LONG_TOKENS/SUITE_LONG_MSEQ right-size for memory:
                # 13B mixed OOMed the r3 defaults (2048 tok / 2560-row KV
                # beside 9GB of weights — BENCH_SUITE_r03 rows 18-19);
                # 1024/1408 fits and still exercises bucket growth +
                # blocked attention
                lt = int(os.environ.get("SUITE_LONG_TOKENS", "2048"))
                lm = int(os.environ.get("SUITE_LONG_MSEQ", "2560"))
                d = trained or rnd_draft
                eng = SpecEngine(params, d, cfg_of(
                    max_new=lt, mseq=lm,
                    buckets=(640, 1280) if lm > 1280 else (640,),
                    tuned=trained is not None))
                tps, stats = timed(eng.generate_fused, prompt, lt)
                emit({"mode": mode, "tok_s": round(tps, 2),
                      "tokens": lt,
                      "accept_per_round": round(
                          stats.get("accept_per_round") or 0, 3),
                      "dyn_attn": "width-gated default",
                      "draft": "trained" if trained else "random"})
        except Exception as e:
            emit({"mode": mode, "error": f"{type(e).__name__}: {e}"[:300]})
        print(f"[{mode}] {time.time()-t_mode:.0f}s", flush=True)


if __name__ == "__main__":
    main()
