"""Batched + continuous-batching engine: per-request losslessness.

Every request decoded in a batch must emit exactly the token stream it would
get alone (which equals its AR stream under greedy) — the batched round is a
vmap of the single-request round, so any cross-request leakage would break
this.
"""

import numpy as np
import jax
import jax.numpy as jnp

from flowspec_tpu.config import (
    EngineConfig, ModelConfig, SamplingConfig, TreeConfig,
)
from flowspec_tpu.draft.eagle import init_eagle_params
from flowspec_tpu.models.llama import init_llama_params
from flowspec_tpu.runtime.batched import BatchedSpecEngine


def _setup(batch_size=3):
    mc = ModelConfig.tiny(vocab_size=16, n_layers=2)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    tc = TreeConfig(top_k=6, depth=3, total_tokens=16, expand_tokens=12,
                    expand_depth=2, node_cap=32, leaf_cap=32, depth_cap=10,
                    chunk_len=8)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_seq_len=128, prefill_chunk=16)
    p = init_llama_params(jax.random.key(0), mc, dtype=jnp.float32)
    d = init_eagle_params(jax.random.key(9), mc, embed=p.embed,
                          dtype=jnp.float32)
    return BatchedSpecEngine(p, d, cfg, batch_size=batch_size)


def test_batch_matches_individual_ar():
    eng = _setup()
    rng = np.random.default_rng(0)
    prompts = [rng.integers(3, 14, 8 + 2 * i).tolist() for i in range(3)]
    refs = [eng.generate_ar(p, max_new_tokens=15, eos_token_id=-1)[0]
            for p in prompts]
    outs, stats = eng.generate_batch(prompts, max_new_tokens=15,
                                     eos_token_id=-1)
    for i in range(3):
        assert outs[i] == refs[i], i
    assert stats["per_request"] == [15, 15, 15]


def test_serve_continuous_batching():
    """6 requests over 2 slots: every output still equals its solo AR run,
    and slots stay busy (utilization == 1.0 when requests outnumber slots
    until the tail)."""
    eng = _setup(batch_size=2)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(3, 14, 6 + i).tolist() for i in range(6)]
    refs = [eng.generate_ar(p, max_new_tokens=8, eos_token_id=-1)[0]
            for p in prompts]
    outs, stats = eng.serve(prompts, max_new_tokens=8, eos_token_id=-1)
    for i in range(6):
        assert outs[i] == refs[i], (i, outs[i], refs[i])
    assert stats["per_request"] == [8] * 6
    assert stats["slot_utilization"] > 0.8


def test_serve_eos_and_refill():
    """A request hitting eos frees its slot for the queue immediately."""
    eng = _setup(batch_size=1)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(3, 14, 7).tolist() for _ in range(2)]
    ar0 = eng.generate_ar(prompts[0], max_new_tokens=20, eos_token_id=-1)[0]
    eos = ar0[len(prompts[0]) + 3]
    outs, _ = eng.serve(prompts, max_new_tokens=20, eos_token_id=eos)
    gen0 = outs[0][len(prompts[0]):]
    assert eos in gen0 and gen0.index(eos) == len(gen0) - 1
    # the second request ran after refill and produced tokens
    assert len(outs[1]) > len(prompts[1])


def test_serve_long_prompt_refill_token_level():
    """Token-level continuous batching: a refilled request whose prompt
    needs MULTIPLE chain rounds (prompt_len >> depth_cap) prefills inside
    the shared rounds while the other slot keeps decoding — and every
    output still equals its solo AR stream."""
    eng = _setup(batch_size=2)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(3, 14, 8).tolist(),
               rng.integers(3, 14, 9).tolist(),
               rng.integers(3, 14, 45).tolist(),   # ~5 chain rounds at cap 10
               rng.integers(3, 14, 7).tolist()]
    refs = [eng.generate_ar(p, max_new_tokens=10, eos_token_id=-1)[0]
            for p in prompts]
    outs, stats = eng.serve(prompts, max_new_tokens=10, eos_token_id=-1)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert o == r, (i, o, r)
    assert stats["per_request"] == [10] * 4


def test_serve_per_request_budgets_and_latency():
    """Heterogeneous budgets: each request stops at ITS max_new, outputs
    still equal the solo AR streams, and latency_rounds is consistent
    (a request's rounds >= its own budget at worst-case acceptance 1)."""
    eng = _setup(batch_size=2)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(3, 14, 6 + i).tolist() for i in range(4)]
    budgets = [4, 9, 6, 3]
    refs = [eng.generate_ar(p, max_new_tokens=m, eos_token_id=-1)[0]
            for p, m in zip(prompts, budgets)]
    outs, stats = eng.serve(prompts, max_new_tokens=budgets,
                            eos_token_id=-1)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert o == r, (i, o, r)
    assert stats["per_request"] == budgets
    assert all(lr >= 1 for lr in stats["latency_rounds"]), stats
    assert sum(stats["latency_rounds"]) <= stats["rounds"] * 2  # 2 slots


def test_serve_multi_dispatch_carries_lane_state():
    """rounds_per_dispatch smaller than the workload forces several scan
    calls; lane_req/emitted/budget/qhead must carry across the dispatch
    boundary exactly (a request's budget window can straddle dispatches)."""
    eng = _setup(batch_size=2)
    rng = np.random.default_rng(17)
    prompts = [rng.integers(3, 14, 6 + i).tolist() for i in range(5)]
    refs = [eng.generate_ar(p, max_new_tokens=7, eos_token_id=-1)[0]
            for p in prompts]
    outs, stats = eng.serve(prompts, max_new_tokens=7, eos_token_id=-1,
                            rounds_per_dispatch=3)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert o == r, (i, o, r)
    assert stats["per_request"] == [7] * 5


def test_serve_stochastic_runs():
    """Temperature=1 under the fused serve scan: per-lane PRNG keys thread
    through the while_loop; outputs must be in-vocab and complete."""
    import dataclasses as dc
    mc = ModelConfig.tiny(vocab_size=16, n_layers=2)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    tc = TreeConfig(top_k=6, depth=3, total_tokens=16, expand_tokens=12,
                    expand_depth=2, node_cap=32, leaf_cap=32, depth_cap=10,
                    chunk_len=8)
    cfg = EngineConfig(model=mc, tree=tc,
                       sampling=SamplingConfig(temperature=1.0),
                       max_seq_len=128, prefill_chunk=16)
    p = init_llama_params(jax.random.key(0), mc, dtype=jnp.float32)
    d = init_eagle_params(jax.random.key(9), mc, embed=p.embed,
                          dtype=jnp.float32)
    eng = BatchedSpecEngine(p, d, cfg, batch_size=2)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(3, 14, 6 + i).tolist() for i in range(3)]
    outs, stats = eng.serve(prompts, max_new_tokens=7, eos_token_id=-1)
    assert stats["per_request"] == [7, 7, 7]
    for i, (o, pr) in enumerate(zip(outs, prompts)):
        gen = o[len(pr):]
        assert len(gen) == 7 and all(0 <= t < 16 for t in gen), (i, gen)


def test_batch_fused_kv_bucket_growth_lossless():
    """Bucketed batch decoding: all lanes' caches migrate together between
    buckets; every lane's stream still equals its solo AR run and multiple
    buckets engage."""
    import dataclasses as dc
    eng = _setup(batch_size=3)
    rng = np.random.default_rng(11)
    prompts = [rng.integers(3, 14, 6 + 2 * i).tolist() for i in range(3)]
    refs = [eng.generate_ar(p, max_new_tokens=20, eos_token_id=-1)[0]
            for p in prompts]

    engb = BatchedSpecEngine(eng.params, eng.draft,
                             dc.replace(eng.cfg, kv_buckets=(16, 32)),
                             batch_size=3)
    outs, stats = engb.generate_batch_fused(prompts, max_new_tokens=20,
                                            eos_token_id=-1)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert o == r, (i, o, r)
    assert stats["per_request"] == [20, 20, 20]
    assert stats["kv_buckets_used"] >= 2, stats


def test_serve_force_accept_multi_token_commits():
    """Synthetic acceptance under serve: multi-token commits flow through
    the slot bookkeeping (budget trims mid-round, refills still exact)."""
    import dataclasses as dc
    eng = _setup(batch_size=2)
    engf = BatchedSpecEngine(eng.params, eng.draft,
                             dc.replace(eng.cfg, force_accept=2),
                             batch_size=2)
    rng = np.random.default_rng(13)
    prompts = [rng.integers(3, 14, 6 + i).tolist() for i in range(4)]
    outs, stats = engf.serve(prompts, max_new_tokens=7, eos_token_id=-1)
    assert stats["per_request"] == [7] * 4
    for o, pr in zip(outs, prompts):
        assert len(o) == len(pr) + 7
    # 3 commits/round: ~3 decode rounds + 1-2 prompt-chain rounds per
    # request, 2 slots, 4 requests — far fewer than the 14 rounds the
    # acceptance-1 path needs
    assert stats["rounds"] <= 12, stats


def test_serve_queue_order_policies_lossless():
    """sjf/lpt admission reorder the queue but never change any request's
    token stream (each still equals its solo AR run), and admission order
    follows the policy: sjf admits ascending budgets, lpt descending."""
    eng = _setup(batch_size=1)
    rng = np.random.default_rng(23)
    prompts = [rng.integers(3, 14, 6 + i).tolist() for i in range(4)]
    budgets = [5, 2, 8, 3]
    refs = [eng.generate_ar(p, max_new_tokens=m, eos_token_id=-1)[0]
            for p, m in zip(prompts, budgets)]
    for policy, expect in (("sjf", [1, 3, 0, 2]), ("lpt", [2, 0, 3, 1])):
        outs, stats = eng.serve(prompts, max_new_tokens=budgets,
                                eos_token_id=-1, queue_order=policy)
        for i, (o, r) in enumerate(zip(outs, refs)):
            assert o == r, (policy, i, o, r)
        assert stats["per_request"] == budgets
        admitted = sorted(range(4), key=lambda r: stats["admit_rounds"][r])
        assert admitted == expect, (policy, admitted, stats["admit_rounds"])


def test_serve_lpt_beats_fifo_on_tail_wave():
    """A long request submitted last makes the FIFO tail drain on one busy
    slot; lpt admits it first so the short requests pack around it —
    strictly fewer total rounds for the same (lossless) outputs."""
    eng = _setup(batch_size=2)
    rng = np.random.default_rng(29)
    prompts = [rng.integers(3, 14, 6).tolist() for _ in range(6)]
    budgets = [2, 2, 2, 2, 2, 14]
    refs = [eng.generate_ar(p, max_new_tokens=m, eos_token_id=-1)[0]
            for p, m in zip(prompts, budgets)]
    rounds = {}
    for policy in ("fifo", "lpt"):
        outs, stats = eng.serve(prompts, max_new_tokens=budgets,
                                eos_token_id=-1, queue_order=policy)
        for i, (o, r) in enumerate(zip(outs, refs)):
            assert o == r, (policy, i, o, r)
        rounds[policy] = stats["rounds"]
    assert rounds["lpt"] < rounds["fifo"], rounds


def test_serve_stream_sjf_admits_short_pending_first():
    """Streaming + sjf: while the single lane is busy, a short request
    that arrived AFTER a long one jumps the pending queue; outputs stay
    equal to the solo AR runs and fifo preserves arrival order."""
    eng = _setup(batch_size=1)
    rng = np.random.default_rng(31)
    prompts = [rng.integers(3, 14, 6).tolist() for _ in range(3)]
    budgets = [6, 7, 2]      # r1 long, r2 short, both pending behind r0
    refs = [eng.generate_ar(p, max_new_tokens=m, eos_token_id=-1)[0]
            for p, m in zip(prompts, budgets)]

    def make_clock():
        state = {"t": 0.0}

        def clock():
            state["t"] += 0.05
            return state["t"]
        return clock

    arrivals = [0.0, 0.1, 0.2]   # r1 arrives before r2
    for policy, r2_first in (("fifo", False), ("sjf", True)):
        outs, stats = eng.serve_stream(
            prompts, arrivals, max_new_tokens=budgets, eos_token_id=-1,
            rounds_per_dispatch=2, clock=make_clock(), queue_order=policy)
        for i, (o, r) in enumerate(zip(outs, refs)):
            assert o == r, (policy, i, o, r)
        a = stats["admit_rounds"]
        assert (a[2] < a[1]) == r2_first, (policy, a)


def test_serve_shared_prefix_lossless_and_fewer_rounds():
    """Prefix-cache serving: with shared_prefix the outputs are exactly the
    no-prefix (and solo AR) streams — including requests admitted by the
    in-program device refill (5 requests over 2 slots) — while the prefix's
    chain rounds are paid once instead of once per request."""
    eng = _setup(batch_size=2)
    rng = np.random.default_rng(41)
    prefix = rng.integers(3, 14, 17).tolist()   # spans 2 prefill chunks
    prompts = [prefix + rng.integers(3, 14, 3 + i).tolist()
               for i in range(5)]
    refs = [eng.generate_ar(p, max_new_tokens=6, eos_token_id=-1)[0]
            for p in prompts]
    outs0, st0 = eng.serve(prompts, max_new_tokens=6, eos_token_id=-1)
    outs1, st1 = eng.serve(prompts, max_new_tokens=6, eos_token_id=-1,
                           shared_prefix=prefix)
    for i in range(5):
        assert outs0[i] == refs[i], ("no-prefix", i)
        assert outs1[i] == refs[i], ("prefix", i)
    # prefix is 17 tokens = 5 chain rounds (depth_cap 4) saved per request
    assert st1["rounds"] < st0["rounds"], (st1["rounds"], st0["rounds"])
    assert st1["per_request"] == st0["per_request"] == [6] * 5

    # "auto" detects the same prefix (the suffixes' first tokens differ for
    # this rng draw) and stays lossless
    det = eng._detect_shared_prefix(prompts)
    assert det == prefix, (len(det), len(prefix))
    outs2, st2 = eng.serve(prompts, max_new_tokens=6, eos_token_id=-1,
                           shared_prefix="auto")
    assert outs2 == refs
    assert st2["rounds"] == st1["rounds"]

    import pytest
    with pytest.raises(ValueError):
        eng.serve([prefix], max_new_tokens=4, eos_token_id=-1,
                  shared_prefix=prefix)          # no suffix
    with pytest.raises(ValueError):
        eng.serve([[1] + prompts[0][1:]], max_new_tokens=4, eos_token_id=-1,
                  shared_prefix=prefix)          # wrong prefix


def test_serve_stream_shared_prefix_lossless():
    """Streaming arrivals + shared prefix: host fills and mid-dispatch
    refills both resume from the template; outputs equal solo AR runs."""
    eng = _setup(batch_size=2)
    rng = np.random.default_rng(43)
    prefix = rng.integers(3, 14, 9).tolist()
    prompts = [prefix + rng.integers(3, 14, 2 + i).tolist()
               for i in range(4)]
    refs = [eng.generate_ar(p, max_new_tokens=5, eos_token_id=-1)[0]
            for p in prompts]

    class FakeClock:
        t = 0.0

        def __call__(self):
            FakeClock.t += 0.05
            return FakeClock.t

    arrivals = [0.0, 0.0, 0.3, 0.5]
    outs, stats = eng.serve_stream(prompts, arrivals, max_new_tokens=5,
                                   eos_token_id=-1, rounds_per_dispatch=3,
                                   clock=FakeClock(), shared_prefix=prefix)
    for i in range(4):
        assert outs[i] == refs[i], (i, outs[i], refs[i])
    assert stats["per_request"] == [5] * 4


def test_serve_stream_sjf_starvation_cap_promotes_long_request():
    """Aging under sjf: a long request pending behind a wave of later
    short arrivals is bypassed at every reorder under pure sjf (admitted
    dead last) but promoted to the queue front once its bypass count hits
    `starvation_cap` — and the token streams stay equal to the solo AR
    runs either way."""
    eng = _setup(batch_size=1)
    rng = np.random.default_rng(37)
    prompts = [rng.integers(3, 14, 6).tolist() for _ in range(5)]
    # r0 is mid-flight when r1 (long) and then the shorts r2-r4 arrive
    # (the fake clock advances 0.05/call, ~0.1-0.15 per dispatch, so r0's
    # ~9 single-round dispatches span all the arrivals)
    budgets = [6, 9, 2, 2, 2]
    arrivals = [0.0, 0.3, 0.35, 0.4, 0.45]
    refs = [eng.generate_ar(p, max_new_tokens=m, eos_token_id=-1)[0]
            for p, m in zip(prompts, budgets)]

    def make_clock():
        state = {"t": 0.0}

        def clock():
            state["t"] += 0.05
            return state["t"]
        return clock

    admits = {}
    for cap in (None, 1):
        outs, stats = eng.serve_stream(
            prompts, arrivals, max_new_tokens=budgets, eos_token_id=-1,
            rounds_per_dispatch=1, clock=make_clock(), queue_order="sjf",
            starvation_cap=cap)
        for i, (o, r) in enumerate(zip(outs, refs)):
            assert o == r, (cap, i, o, r)
        admits[cap] = stats["admit_rounds"]
    # pure sjf: every later short jumps r1 -> r1 admitted last
    a = admits[None]
    assert a[1] == max(a), a
    # cap=1: after one bypass r1 pins to the pending front. The short that
    # earned it that bypass (r2) may already be at the queue front when
    # promotion lands, but the later wave (r3, r4) can no longer starve it.
    a = admits[1]
    assert a[1] < a[3] and a[1] < a[4], a


def test_serve_on_token_streams_in_order():
    """on_token delivers every generated token, in emission order per
    request, and the concatenation equals the returned outputs."""
    eng = _setup(batch_size=2)
    rng = np.random.default_rng(61)
    prompts = [rng.integers(3, 14, 6 + i).tolist() for i in range(4)]
    streamed = {i: [] for i in range(4)}
    outs, _ = eng.serve(prompts, max_new_tokens=5, eos_token_id=-1,
                        on_token=lambda r, t: streamed[r].append(t))
    for i in range(4):
        assert streamed[i] == outs[i][len(prompts[i]):], i


def test_warmup_compiles_serve_paths():
    """warmup() pre-pays the dispatch programs, the prefix template, and
    the snapshot gather/scatter; serving afterwards is still lossless."""
    eng = _setup(batch_size=2)
    rng = np.random.default_rng(53)
    prefix = rng.integers(3, 14, 9).tolist()
    eng.warmup(shared_prefix=prefix, ks=(8,))
    assert 8 in eng._serve_scans
    assert np.asarray(prefix, np.int32).tobytes() in eng._prefix_templates
    prompts = [prefix + rng.integers(3, 14, 3).tolist() for _ in range(3)]
    refs = [eng.generate_ar(p, max_new_tokens=5, eos_token_id=-1)[0]
            for p in prompts]
    outs, _ = eng.serve(prompts, max_new_tokens=5, eos_token_id=-1,
                        rounds_per_dispatch=8, shared_prefix=prefix)
    assert outs == refs


def test_serve_stream_preemption_pauses_long_request_losslessly():
    """Preemptive lane migration: a short arrival pauses the long request
    occupying the only lane (its exact state lifts off the lane), runs to
    completion, then the long request resumes with zero recompute — BOTH
    streams still equal their solo AR runs, and the short one finishes
    first (it finishes last without preemption)."""
    eng = _setup(batch_size=1)
    rng = np.random.default_rng(47)
    prompts = [rng.integers(3, 14, 6).tolist() for _ in range(2)]
    budgets = [20, 2]
    arrivals = [0.0, 0.3]
    refs = [eng.generate_ar(p, max_new_tokens=m, eos_token_id=-1)[0]
            for p, m in zip(prompts, budgets)]

    def make_clock():
        state = {"t": 0.0}

        def clock():
            state["t"] += 0.05
            return state["t"]
        return clock

    fin = {}
    for pf in (None, 2.0):
        outs, stats = eng.serve_stream(
            prompts, arrivals, max_new_tokens=budgets, eos_token_id=-1,
            rounds_per_dispatch=1, clock=make_clock(), preempt_factor=pf)
        for i, (o, r) in enumerate(zip(outs, refs)):
            assert o == r, (pf, i, o, r)
        assert stats["preemptions"] == (0 if pf is None else 1), (pf, stats)
        fin[pf] = stats["completion_s"]
    assert fin[None][1] > fin[None][0], fin       # fifo: short waits
    assert fin[2.0][1] < fin[2.0][0], fin         # preempted: short first


def test_serve_stream_preemption_with_shared_prefix():
    """Preemption composed with prefix-cache serving: the paused lane's
    snapshot carries the prefix KV, the preempting short request resumes
    from the template, and after the resume both streams still equal
    their solo AR runs."""
    eng = _setup(batch_size=1)
    rng = np.random.default_rng(59)
    prefix = rng.integers(3, 14, 9).tolist()
    prompts = [prefix + rng.integers(3, 14, 3).tolist() for _ in range(2)]
    budgets = [18, 2]
    arrivals = [0.0, 0.3]
    refs = [eng.generate_ar(p, max_new_tokens=m, eos_token_id=-1)[0]
            for p, m in zip(prompts, budgets)]

    state = {"t": 0.0}

    def clock():
        state["t"] += 0.05
        return state["t"]

    outs, stats = eng.serve_stream(
        prompts, arrivals, max_new_tokens=budgets, eos_token_id=-1,
        rounds_per_dispatch=1, clock=clock, shared_prefix=prefix,
        preempt_factor=2.0)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert o == r, (i, o, r)
    assert stats["preemptions"] == 1, stats
    assert stats["completion_s"][1] < stats["completion_s"][0], stats


def test_serve_stream_arrivals():
    """Streaming-arrival serving (r2 verdict #9): requests become
    admittable over time; outputs still equal the solo AR runs, arrivals
    that land while lanes are busy are picked up by the device-side
    refill, and the latency accounting comes back populated."""
    eng = _setup(batch_size=2)
    rng = np.random.default_rng(21)
    prompts = [rng.integers(3, 14, 6 + i).tolist() for i in range(5)]
    refs = [eng.generate_ar(p, max_new_tokens=6, eos_token_id=-1)[0]
            for p in prompts]

    class FakeClock:
        t = 0.0

        def __call__(self):
            FakeClock.t += 0.05
            return FakeClock.t

    # 0,1 arrive immediately; 2,3 while lanes are busy; 4 much later
    # (exercises the all-idle wait + host-fill path)
    arrivals = [0.0, 0.0, 0.3, 0.5, 30.0]
    outs, stats = eng.serve_stream(prompts, arrivals, max_new_tokens=6,
                                   eos_token_id=-1, rounds_per_dispatch=3,
                                   clock=FakeClock())
    for i in range(5):
        assert outs[i] == refs[i], (i, outs[i], refs[i])
    assert stats["per_request"] == [6] * 5
    assert len(stats["admission_s"]) == 5
    assert all(a >= 0 for a in stats["admission_s"])
    assert stats["completion_p95_s"] >= stats["completion_p50_s"] > 0
    assert all(lr > 0 for lr in stats["latency_rounds"])


def test_serve_dynamic_tree_lossless_across_variant_switches():
    """dynamic_tree keys each dispatch's tree size on the live active-lane
    count. Greedy outputs are tree-size-invariant, so a workload that
    drains from 3 active lanes down to 1 (switching variants mid-stream)
    must still emit exactly the solo AR streams."""
    mc = ModelConfig.tiny(vocab_size=16, n_layers=2)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    tc = TreeConfig(top_k=6, depth=3, total_tokens=60, expand_tokens=12,
                    expand_depth=2, node_cap=64, leaf_cap=64, depth_cap=10,
                    chunk_len=8)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_seq_len=160, prefill_chunk=16)
    p = init_llama_params(jax.random.key(0), mc, dtype=jnp.float32)
    d = init_eagle_params(jax.random.key(9), mc, embed=p.embed,
                          dtype=jnp.float32)
    eng = BatchedSpecEngine(p, d, cfg, batch_size=3, dynamic_tree=True)
    # full tree retained for allocation + the B=1 variant
    assert eng.cfg.tree.total_tokens == 60
    assert eng._tree_variants[3].total_tokens == 47
    rng = np.random.default_rng(7)
    prompts = [rng.integers(3, 14, 5).tolist() for _ in range(3)]
    budgets = [24, 6, 4]    # staggered finishes force variant switches
    refs = [eng.generate_ar(pr, max_new_tokens=m, eos_token_id=-1)[0]
            for pr, m in zip(prompts, budgets)]
    outs, stats = eng.serve(prompts, max_new_tokens=budgets,
                            eos_token_id=-1, rounds_per_dispatch=2)
    assert outs == refs
    # more than one variant program actually ran
    keys = {k_ for k_ in eng._serve_scans}
    assert len(keys) >= 2, keys


def test_serve_multiturn_conversation_resume_matches_solo():
    """Multi-turn serving: turn 2 resumes each conversation from its
    stored lane snapshot (KV rolled back to the common token prefix) and
    must emit exactly what the solo resume path emits."""
    from flowspec_tpu.runtime.batched import ConversationStore
    eng = _setup(batch_size=2)
    rng = np.random.default_rng(11)
    t1 = [rng.integers(3, 14, 6).tolist() for _ in range(3)]
    store = ConversationStore()
    outs1, stats1 = eng.serve(t1, max_new_tokens=5, eos_token_id=-1,
                              rounds_per_dispatch=4,
                              conversations=store,
                              conversation_ids=["a", "b", "c"])
    assert len(store) == 3
    # turn 2: conversation so far + a new user turn
    extras = [rng.integers(3, 14, 4).tolist() for _ in range(3)]
    t2 = [[int(x) for x in outs1[i]] + extras[i] for i in range(3)]
    outs2, stats2 = eng.serve(t2, max_new_tokens=5, eos_token_id=-1,
                              rounds_per_dispatch=4,
                              conversations=store,
                              conversation_ids=["a", "b", "c"])
    assert stats2["resumed_turns"] == 3, stats2
    # solo reference: fresh generate over the full turn-2 prompt
    for i in range(3):
        ref, _ = eng.generate(t2[i], max_new_tokens=5, eos_token_id=-1)
        assert outs2[i] == ref, (i, outs2[i], ref)
    # TTFT cut: resumed turn-2 admission->finish spans fewer rounds than
    # a full re-prefill would need (chain is ~len(prompt)/depth_cap
    # rounds; resumed lanes chain only the new turn)
    d_cap = eng.cfg.tree.depth_cap
    full_chain = -(-min(len(t) for t in t2) // d_cap)
    assert min(stats2["latency_rounds"]) < full_chain + 5, stats2


def test_serve_stream_prefix_overlap_cold_lossless():
    """Cold shared-prefix streaming with prefix_overlap: the template
    builds in a background thread while early arrivals are served
    un-prefixed; outputs must equal the solo AR runs and the template
    must land in the cross-call cache."""
    eng = _setup(batch_size=2)
    rng = np.random.default_rng(13)
    prefix = rng.integers(3, 14, 12).tolist()
    prompts = [prefix + rng.integers(3, 14, 3).tolist() for _ in range(4)]
    refs = [eng.generate_ar(pr, max_new_tokens=4, eos_token_id=-1)[0]
            for pr in prompts]
    state = {"t": 0.0}

    def clock():
        state["t"] += 0.02
        return state["t"]
    assert np.asarray(prefix, np.int32).tobytes() \
        not in eng._prefix_templates
    outs, stats = eng.serve_stream(
        prompts, [0.0, 0.05, 0.3, 0.5], max_new_tokens=4, eos_token_id=-1,
        rounds_per_dispatch=1, clock=clock, shared_prefix=prefix,
        prefix_overlap=True)
    assert outs == refs
    assert np.asarray(prefix, np.int32).tobytes() in eng._prefix_templates


def test_serve_stream_preemption_cost_gate_skips_futile_pause():
    """The preemption cost model: when the busy lane will free about as
    soon as the pending short could finish anyway, the trigger fires but
    the gate refuses — no preemption, a cost-skip is counted, and both
    streams stay correct."""
    eng = _setup(batch_size=1)
    rng = np.random.default_rng(47)
    prompts = [rng.integers(3, 14, 6).tolist() for _ in range(2)]
    budgets = [4, 2]     # long is nearly done when the short arrives
    refs = [eng.generate_ar(p, max_new_tokens=m, eos_token_id=-1)[0]
            for p, m in zip(prompts, budgets)]
    state = {"t": 0.0}

    def clock():
        state["t"] += 0.05
        return state["t"]
    outs, stats = eng.serve_stream(
        prompts, [0.0, 0.1], max_new_tokens=budgets, eos_token_id=-1,
        rounds_per_dispatch=1, clock=clock, preempt_factor=2.0)
    assert outs == refs
    assert stats["preemptions"] == 0, stats
    assert stats["preempt_cost_skips"] >= 1, stats


def test_serve_stochastic_first_token_distribution():
    """Stochastic LAW through the serve path: at T=1 the first token each
    request emits is a categorical sample from the base model's true
    next-token distribution (rejection sampling is lossless in law). 600
    identical prompts stream through 2 lanes — host admissions and
    in-program device refills both — and the empirical first-token
    distribution must match softmax(base logits) in total variation.
    Also pins the advisor-r3 seeding fix: every queue position gets its
    own PRNG key, so identical prompts must NOT produce identical
    streams."""
    mc = ModelConfig.tiny(vocab_size=16, n_layers=2)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    tc = TreeConfig(top_k=4, depth=3, total_tokens=12, expand_tokens=8,
                    expand_depth=2, node_cap=16, leaf_cap=16, depth_cap=8,
                    chunk_len=8)
    cfg = EngineConfig(model=mc, tree=tc,
                       sampling=SamplingConfig(temperature=1.0),
                       max_seq_len=64, prefill_chunk=16)
    p = init_llama_params(jax.random.key(0), mc, dtype=jnp.float32)
    d = init_eagle_params(jax.random.key(9), mc, embed=p.embed,
                          dtype=jnp.float32)
    eng = BatchedSpecEngine(p, d, cfg, batch_size=2, adapt_tree=False)
    prompt = [5, 9, 3, 7, 4, 11]
    n = 600
    outs, _ = eng.serve([prompt] * n, max_new_tokens=1, eos_token_id=-1,
                        rounds_per_dispatch=64, seed=123)
    firsts = np.array([o[len(prompt)] for o in outs])
    # exact reference distribution from the base model's logits
    st = eng.init_state(0)
    _, last_logits = eng._prefill_chunks(st, prompt)
    p_ref = np.asarray(jax.nn.softmax(
        jnp.asarray(last_logits, jnp.float32)))
    emp = np.bincount(firsts, minlength=mc.vocab_size) / n
    tv = 0.5 * np.abs(emp - p_ref).sum()
    assert tv < 0.15, (tv, emp.round(3).tolist(), p_ref.round(3).tolist())
    # distinct queue positions -> distinct keys -> not all streams equal
    assert len(set(firsts.tolist())) > 1


def test_serve_stream_preemption_round_robin_lossless():
    """Multiple shorts preempt a pool of longs in sequence: the freed lane
    is RESERVED for the parked long (the device queue is capped while one
    is parked), so each pause defers only one short's service instead of
    serializing every pending short ahead of the long. All four streams
    must equal their solo AR runs and at least two pauses must fire; a
    lane resumed at a boundary must never be the same boundary's victim
    (stale-snapshot guard)."""
    eng = _setup(batch_size=2)
    rng = np.random.default_rng(23)
    prompts = [rng.integers(3, 14, 6).tolist() for _ in range(4)]
    budgets = [40, 40, 2, 2]
    arrivals = [0.0, 0.0, 0.3, 0.35]
    refs = [eng.generate_ar(p, max_new_tokens=m, eos_token_id=-1)[0]
            for p, m in zip(prompts, budgets)]
    state = {"t": 0.0}

    def clock():
        state["t"] += 0.05
        return state["t"]
    outs, stats = eng.serve_stream(
        prompts, arrivals, max_new_tokens=budgets, eos_token_id=-1,
        rounds_per_dispatch=1, clock=clock, preempt_factor=2.0)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert o == r, (i, o, r)
    assert stats["preemptions"] >= 2, stats
    cs = stats["completion_s"]
    assert max(cs[2:]) < min(cs[:2]), cs   # shorts finish before longs


def test_conversation_store_lru_eviction():
    """The store holds full lane KV snapshots, so it is LRU-capped; a get
    refreshes recency and puts evict the oldest entry."""
    from flowspec_tpu.runtime.batched import ConversationStore
    st = ConversationStore(max_items=2)
    st.put("a", "SA", [1, 2])
    st.put("b", "SB", [3])
    assert st.get("a")["history"] == [1, 2]   # refresh "a"
    st.put("c", "SC", [4])                     # evicts "b" (oldest)
    assert "b" not in st and "a" in st and "c" in st
    assert len(st) == 2 and st.get("b") is None


def test_serve_stream_dynamic_batch_width_lossless():
    """dynamic_batch re-widths the dispatch to the active-lane bucket: a
    4-slot engine serving a sparse trickle (1-2 concurrent) and a drain
    tail must shrink its dispatch width, grow back for a burst, and still
    emit exactly the solo AR streams."""
    mc = ModelConfig.tiny(vocab_size=16, n_layers=2)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    tc = TreeConfig(top_k=6, depth=3, total_tokens=16, expand_tokens=12,
                    expand_depth=2, node_cap=32, leaf_cap=32, depth_cap=10,
                    chunk_len=8)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_seq_len=128, prefill_chunk=16)
    p = init_llama_params(jax.random.key(0), mc, dtype=jnp.float32)
    d = init_eagle_params(jax.random.key(9), mc, embed=p.embed,
                          dtype=jnp.float32)
    eng = BatchedSpecEngine(p, d, cfg, batch_size=4, adapt_tree=False,
                            dynamic_batch=True, dynamic_tree=True)
    rng = np.random.default_rng(29)
    prompts = [rng.integers(3, 14, 6).tolist() for _ in range(6)]
    budgets = [10, 4, 4, 4, 4, 8]
    # one early request (shrinks to width 1-2), then a 4-request burst
    # (grows back), then a late straggler (drain tail)
    arrivals = [0.0, 1.0, 1.05, 1.1, 1.15, 2.5]
    refs = [eng.generate_ar(pr, max_new_tokens=m, eos_token_id=-1)[0]
            for pr, m in zip(prompts, budgets)]
    state = {"t": 0.0}

    def clock():
        state["t"] += 0.05
        return state["t"]
    outs, stats = eng.serve_stream(
        prompts, arrivals, max_new_tokens=budgets, eos_token_id=-1,
        rounds_per_dispatch=2, clock=clock)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert o == r, (i, o, r)
    assert stats["min_width"] < 4, stats
    assert stats["width_switches"] >= 2, stats
