"""Headline benchmark: single-request tree-speculative decoding throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference FlowSpec reports 8.70 output tokens/s for
LLaMA2-Chat-7B (greedy, mean over 6 datasets) on its 5-Jetson / 150 Mbps
cluster (BASELINE.md; reference README.md:136-144). We measure the same
quantity — end-to-end output tokens/s of the speculative engine on a 7B-class
model — on one TPU chip. Weights are random (no checkpoints in this
environment), which makes draft acceptance worst-case (~1 token/round);
real EAGLE weights only raise tokens/s from here.

Env knobs: BENCH_MODEL=7b|1b|tiny (default 7b), BENCH_TOKENS (default 256 —
long enough that the ~70ms-per-dispatch tunnel RTT of prefill/setup is <2%
of the measurement; the reference evaluates at max length 128/256 too),
BENCH_MODE=spec|ar (default spec), BENCH_QUANT=none|int8|nf4|int4|mixed
(default int8
for 7b — the reference's headline distributed config is int8 weight-only),
BENCH_BATCH=N (default 1; N>1 measures aggregate tokens/s of N concurrent
requests through the vmapped fused decode loop).
"""

import glob
import json
import os
import subprocess
import sys
import time
import traceback

import numpy as np


def _last_good_row():
    """Headline row from the newest committed BENCH_r*.json whose run
    succeeded — quoted in outage rows so a tunnel failure still leaves the
    driver a number with provenance instead of a stack trace."""
    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for p in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(rec, dict) and rec.get("parsed"):
            best = {"source": os.path.basename(p), **rec["parsed"]}
    return best


def _tunnel_probe(timeout_s: float):
    """(ok, seconds): run a trivial computation on the default backend in a
    SUBPROCESS with a hard timeout — the axon tunnel's failure mode is a
    hang (~9 min before UNAVAILABLE, CLAUDE.md round-2), which an in-process
    check cannot bound."""
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float(jnp.ones((4, 4)).sum()))"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0, time.time() - t0
    except subprocess.TimeoutExpired:
        return False, time.time() - t0


def _emit_outage(kind: str, probe_s: float, detail: str = ""):
    row = {"metric": "bench_unavailable", "value": None, "unit": None,
           "vs_baseline": None, "error": kind,
           "probe_s": round(probe_s, 1)}
    if detail:
        row["detail"] = detail[-600:]
    lg = _last_good_row()
    if lg:
        row["last_good"] = lg
    print(json.dumps(row))


def build_into_formats(mc, cfg):
    """bf16 (params, draft, formats) for the spec path: negotiate XLA's
    preferred decode-round weight layouts from shape avals, then generate
    every leaf directly INTO its format (at 7B bf16 XLA wants wq/wk/wv
    stored transposed; fed default layouts it materializes ~3GB of
    in-program transposed copies and OOMs — see tools/layout_probe.py)."""
    import functools
    import time as _t
    import jax
    import jax.numpy as jnp
    from flowspec_tpu.draft.eagle import init_eagle_params
    from flowspec_tpu.models.llama import init_llama_params
    from flowspec_tpu.runtime.engine import negotiate_round_formats
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    p_fmt, d_fmt = negotiate_round_formats(cfg)
    # minimal Formats: the tiling-populated ones from input_formats are
    # silently ignored by out_shardings
    sds = SingleDeviceSharding(jax.devices()[0])
    minimal = lambda t: jax.tree_util.tree_map(
        lambda f: Format(Layout(
            major_to_minor=tuple(f.layout.major_to_minor)), sds), t)
    p_fmt, d_fmt = minimal(p_fmt), minimal(d_fmt)

    p_aval = jax.eval_shape(functools.partial(init_llama_params, cfg=mc),
                            jax.random.key(0))
    d_aval = jax.eval_shape(lambda k: init_eagle_params(k, mc),
                            jax.random.key(1))
    # per-process HLO salt: persistent-cache hits drop out_shardings layouts
    salt = int(_t.time_ns()) % (2 ** 31 - 1)

    def gen_into(aval, fmt, seed):
        def g():
            k = jax.random.fold_in(jax.random.key(seed), salt)
            if jnp.issubdtype(aval.dtype, jnp.integer):
                return jnp.zeros(aval.shape, aval.dtype)
            return (jax.random.normal(k, aval.shape, jnp.float32) *
                    (aval.shape[-2] if len(aval.shape) >= 2 else
                     aval.shape[-1]) ** -0.5).astype(aval.dtype)
        y = jax.jit(g, out_shardings=fmt)()
        y.block_until_ready()
        assert (tuple(y.format.layout.major_to_minor) ==
                tuple(fmt.layout.major_to_minor)), aval.shape
        return y

    def build(aval_tree, fmt_tree, base_seed):
        leaves, treedef = jax.tree_util.tree_flatten(aval_tree)
        fmts = jax.tree_util.tree_leaves(fmt_tree)
        return jax.tree_util.tree_unflatten(treedef, [
            gen_into(a, f, base_seed + i)
            for i, (a, f) in enumerate(zip(leaves, fmts))])

    params = build(p_aval, p_fmt, 10)
    draft = build(d_aval, d_fmt, 100)
    return params, draft, (p_fmt, d_fmt)


def build_params(mc, quant: str, draft_kind: str = "random",
                 draft_ckpt: str = None):
    """(params, draft) for the bench: random weights, generated directly in
    quantized form when quant != none (avoids holding bf16 + quantized
    copies simultaneously, which OOMs at 7B).

    draft_kind "trained" loads the distilled thin-draft checkpoint
    (tools/train_bench_draft.py) instead of a random draft — the EARNED-
    acceptance configuration (VERDICT r2 #1): acceptance is then measured,
    not forced, and the spec numbers reflect a draft that actually
    predicts this base model."""
    import jax
    import jax.numpy as jnp
    from flowspec_tpu.draft.eagle import init_eagle_params
    from flowspec_tpu.models.llama import init_llama_params

    key = jax.random.key(0)
    if quant != "none":
        from flowspec_tpu.models.llama import LlamaParams, LlamaLayerParams
        from flowspec_tpu.ops.quant import (
            Int4Tensor, Int8Tensor, NF4Tensor, NF4_BLOCK)
        h, i, v = mc.hidden_size, mc.intermediate_size, mc.vocab_size
        L, d = mc.num_hidden_layers, mc.head_dim_
        nq, nkv = mc.num_attention_heads, mc.num_key_value_heads
        dt = jnp.dtype(mc.dtype)

        def q_of(k, shape, field_kind=None):
            # generate per-layer under lax.map: randint materializes a
            # uint32 bit buffer of the full shape, and a whole stacked
            # (L, In, Out) one is a multi-GB transient that lands on top of
            # the (async-queued) finished leaves and OOMs 13B; per-layer
            # the transient is ~50MB and the buffer is reused
            ks = jax.random.split(k, shape[0])
            kq = field_kind or quant
            if kq == "int8":
                q = jax.lax.map(
                    lambda kk: jax.random.randint(kk, shape[1:], -127, 128,
                                                  jnp.int8), ks)
                s = jnp.full(shape[:-2] + shape[-1:],
                             (shape[-2] ** -0.5) / 127.0, jnp.float32)
                return Int8Tensor(q=q, scale=s)
            q = jax.lax.map(
                lambda kk: jax.random.randint(
                    kk, (shape[-2] // 2,) + shape[-1:], 0, 256, jnp.uint8),
                ks)
            blocks = shape[:-2] + (shape[-2] // NF4_BLOCK,) + shape[-1:]
            if kq == "int4":
                # int4 codes decode to (nibble-8) in [-8,7]; scale down by 7
                # so weight magnitudes match the nf4 branch's [-1,1] codes
                s = jnp.full(blocks, shape[-2] ** -0.5 / 7.0, jnp.float32)
                return Int4Tensor(q=q, scale=s)
            s = jnp.full(blocks, shape[-2] ** -0.5, jnp.float32)
            return NF4Tensor(q=q, scale=s)

        ks = jax.random.split(jax.random.key(7), 10)
        # "mixed" = attention int4 + FFN int8 (models/llama.py
        # quantize_llama_params): 13B fits 16GB with 2/3 of the weight
        # read on the fast fused-int8 path
        ak = "int4" if quant == "mixed" else None
        fk = "int8" if quant == "mixed" else None
        layers = LlamaLayerParams(
            wq=q_of(ks[0], (L, h, nq * d), ak),
            wk=q_of(ks[1], (L, h, nkv * d), ak),
            wv=q_of(ks[2], (L, h, nkv * d), ak),
            wo=q_of(ks[3], (L, nq * d, h), ak),
            bq=jnp.zeros((L, nq * d), dt), bk=jnp.zeros((L, nkv * d), dt),
            bv=jnp.zeros((L, nkv * d), dt),
            w_gate=q_of(ks[4], (L, h, i), fk), w_up=q_of(ks[5], (L, h, i), fk),
            w_down=q_of(ks[6], (L, i, h), fk),
            input_ln=jnp.ones((L, h), dt), post_ln=jnp.ones((L, h), dt))
        params = LlamaParams(
            embed=jax.random.normal(ks[7], (v, h), dt) * 0.02,
            layers=layers,
            final_norm=jnp.ones((h,), dt),
            lm_head=jax.random.normal(ks[8], (h, v), dt) * h ** -0.5)
    else:
        params = init_llama_params(key, mc)
    if draft_kind == "trained":
        from flowspec_tpu.draft.eagle import load_thin_draft
        draft = load_thin_draft(draft_ckpt, params.embed,
                                jnp.dtype(mc.dtype))
    else:
        draft = init_eagle_params(jax.random.key(1), mc, embed=params.embed)
    if quant != "none":
        from flowspec_tpu.draft.eagle import quantize_eagle_params
        draft = quantize_eagle_params(
            draft, "int8" if quant == "mixed" else quant)
    # hard sync before decode starts: block_until_ready doesn't reliably
    # block through the tunneled backend; a scalar device->host transfer
    # does. Without it the generation transients above stay queued and can
    # stack on top of the decode working set (13B OOMed this way).
    float(jnp.sum(params.final_norm))
    return params, draft


def build_struct_params(dtype: str = "bfloat16"):
    """(mc, params, draft) for the TRAINED structured base — the realism
    anchor at bench scale (r4, VERDICT r3 #1): a ~0.5B LLaMA-architecture
    base trained from scratch on the TPU by tools/train_struct_base.py
    (STRUCT_SCALE=big) and a full-width EAGLE draft distilled on streaming
    teacher-forced data (alpha=1 — a real learned hidden map, unlike the
    random bench base's identity-selected thin drafts). Weights live
    outside git (~1GB fp16); STRUCT_BASE/STRUCT_DRAFT point at the npz
    files, and the training run is deterministic-by-seed/re-runnable."""
    import dataclasses
    import jax.numpy as jnp
    from tools.train_struct_base import (
        SCALES, load_base, load_draft, model_config)
    s = SCALES[os.environ.get("STRUCT_SCALE", "big")]
    mc = model_config(s)
    if dtype != mc.dtype:
        mc = dataclasses.replace(mc, dtype=dtype)
    params = load_base(os.environ.get("STRUCT_BASE",
                                      "/tmp/struct_base_big.npz"), mc)
    draft = load_draft(os.environ.get("STRUCT_DRAFT",
                                      "/tmp/struct_draft_big.npz"),
                       params.embed, jnp.dtype(mc.dtype))
    return mc, params, draft


def main():
    """Outage-proof wrapper (VERDICT r4 weak #1): probe the tunnel with a
    short timeout BEFORE any engine build, retry within a bounded window,
    and on failure — or on a mid-run tunnel death — emit ONE structured
    JSON row (error + last committed good number) and exit 0, so the
    driver always captures a parseable artifact. The reference's eval
    always writes its results file too (run_pipe_eval.py:340-360)."""
    if not os.environ.get("BENCH_CPU"):
        retries = int(os.environ.get("BENCH_PROBE_RETRIES", "3"))
        wait_s = float(os.environ.get("BENCH_PROBE_WAIT", "120"))
        spent = 0.0
        for attempt in range(retries):
            ok, dt = _tunnel_probe(
                float(os.environ.get("BENCH_PROBE_TIMEOUT", "150")))
            spent += dt
            if ok:
                break
            if attempt + 1 < retries:
                time.sleep(wait_s)
                spent += wait_s
        else:
            _emit_outage("tunnel_unavailable", spent)
            return
    try:
        run_bench()
    except Exception:
        _emit_outage("bench_failed", 0.0, traceback.format_exc())


def run_bench():
    model_kind = os.environ.get("BENCH_MODEL", "7b")
    n_tokens = int(os.environ.get("BENCH_TOKENS", "256"))
    mode = os.environ.get("BENCH_MODE", "spec")
    quant = os.environ.get("BENCH_QUANT",
                           "int8" if model_kind in ("7b", "13b") else "none")
    if model_kind == "struct":
        quant = os.environ.get("BENCH_QUANT", "none")   # bf16 trained base
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    if mode in ("serve", "stream"):
        batch = max(batch, 4)   # serve() needs the batched engine's slots
    # BENCH_TEMP > 0 exercises the stochastic acceptance path (the
    # reference reports T=0 and T=1 rows; its T=1 numbers are ~4% below
    # T=0, README.md:136-144)
    temp = float(os.environ.get("BENCH_TEMP", "0"))

    import jax
    if os.environ.get("BENCH_CPU"):
        # the container's sitecustomize overrides JAX_PLATFORMS via
        # jax.config, so CPU smoke runs need an explicit override
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: the fused decode loop takes minutes to
    # compile at 7B; cache hits make repeat runs start in seconds
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/flowspec_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from flowspec_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig, TreeConfig,
    )
    from flowspec_tpu.draft.eagle import init_eagle_params
    from flowspec_tpu.models.llama import init_llama_params
    from flowspec_tpu.runtime.engine import SpecEngine

    struct_parts = None
    if model_kind == "7b":
        mc = ModelConfig.llama_7b()
    elif model_kind == "13b":
        mc = ModelConfig.llama_13b()
    elif model_kind == "struct":
        struct_parts = build_struct_params()
        mc = struct_parts[0]
    elif model_kind == "1b":
        mc = ModelConfig(hidden_size=2048, intermediate_size=5504,
                         num_hidden_layers=16, num_attention_heads=16,
                         num_key_value_heads=16)
    else:
        mc = ModelConfig.tiny()
    # BENCH_PREFIX=N (serve mode): all requests share an N-token system
    # prefix (each with a distinct 16-token suffix); BENCH_PREFIX_CACHE=0
    # turns prefix-cache serving off for the same workload (the A/B).
    pfx_n = int(os.environ.get("BENCH_PREFIX", "0")) if mode == "serve" else 0
    pfx_cache = os.environ.get("BENCH_PREFIX_CACHE", "1") != "0"
    # Right-size the KV allocation to the request budget (prompt 64 +
    # BENCH_TOKENS + depth_cap margin): attention is static-shape over the
    # whole allocation, so every surplus row is pure HBM read on BOTH the
    # verify pass and the AR step (at 7B, 1152 vs 384 rows is ~0.7ms/pass).
    # This is what any serving engine does — allocate for the admitted
    # request, not the theoretical context cap. BENCH_SEQ overrides.
    prompt_len = (pfx_n + 16) if pfx_n else 64
    max_seq = int(os.environ.get("BENCH_SEQ", prompt_len + n_tokens + 24))

    if batch > 1:
        # B KV caches coexist; bound the context so they fit beside weights
        max_seq = min(max_seq, 384)
    # BENCH_BUCKETS="640,1280" enables KV bucket growth inside the fused
    # decode (early rounds run in a small allocation; caches migrate as
    # commit_len grows) — the long-context alternative to right-sizing
    buckets = tuple(int(x) for x in
                    os.environ.get("BENCH_BUCKETS", "").split(",") if x)
    # BENCH_FORCE_ACCEPT=n: synthetic-acceptance measurement mode — random
    # weights pin real acceptance at ~1 token/round; this measures the
    # engine's acceptance->throughput curve (metric is tagged _fa{n};
    # outputs are NOT the model's distribution — see EngineConfig)
    force_accept = int(os.environ.get("BENCH_FORCE_ACCEPT", "0"))
    # BENCH_DRAFT=auto|random|trained: "trained" loads the distilled
    # thin-draft checkpoint so acceptance is EARNED (measured, not forced);
    # "auto" (default) uses it whenever the checkpoint exists and the run
    # is a quantized spec-family mode (the bf16 path keeps the full-size
    # random draft for the negotiated-layout coverage). The untrained
    # worst-case row stays reachable via BENCH_DRAFT=random.
    draft_kind = os.environ.get("BENCH_DRAFT", "auto")
    draft_ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "checkpoints",
        f"draft_{model_kind}_thin_fp16.npz")
    if draft_kind == "auto":
        draft_kind = ("trained" if os.path.exists(draft_ckpt)
                      and quant != "none" and mode != "ar"
                      and not force_accept else "random")
    # Tree shape: reference defaults are 80 tokens / top-10 / depth-6 with
    # raw cumulative-log-prob ordering (score_temperature 1). With the
    # TRAINED draft the defaults switch to the swept optimum — depth 8,
    # score_temperature 0.2 (tools/stemp_probe.py + SWEEP_r03: the random
    # base's flat softmax otherwise packs the node budget into levels 0-1
    # and caps acceptance at ~3/round). BENCH_DEPTH/BENCH_SCORE_TEMP
    # override.
    if struct_parts is not None:
        draft_kind = ("random" if os.environ.get("BENCH_DRAFT") == "random"
                      else "trained")
    trained = draft_kind == "trained"
    # struct-base defaults come from the r5 T=0/T=1 sweep on the trained
    # base (SWEEP_r05_struct): real dynamics cap acceptance below the tree
    # budget, so the random-base swept optimum does not transfer — and the
    # stochastic optimum is SHALLOWER than greedy (d4/tau0.3/n80, accept
    # 2.37 vs 1.90 at the greedy shape; acceptance is bounded by
    # probability mass, not candidate count)
    struct_t1 = struct_parts is not None and temp > 0
    depth = int(os.environ.get(
        "BENCH_DEPTH", ("8" if struct_parts is None else
                        "4" if struct_t1 else "8")
        if trained else "6"))
    stemp = float(os.environ.get(
        "BENCH_SCORE_TEMP", ("0.2" if struct_parts is None else
                             "0.3" if struct_t1 else "0.6")
        if trained else "1"))
    tc = TreeConfig(node_cap=96, leaf_cap=96,
                    depth=depth, depth_cap=max(16, depth + 2),
                    score_temperature=stemp)
    cfg = EngineConfig(model=mc, tree=tc,
                       sampling=SamplingConfig(temperature=temp),
                       max_new_tokens=n_tokens, max_seq_len=max_seq,
                       kv_buckets=buckets, force_accept=force_accept)

    if struct_parts is not None:
        _, params, draft = struct_parts
        if draft_kind == "random":
            from flowspec_tpu.draft.eagle import init_eagle_params as _iep
            draft = _iep(jax.random.key(1), mc, embed=params.embed)
        if quant != "none":
            from flowspec_tpu.draft.eagle import quantize_eagle_params
            from flowspec_tpu.models.llama import quantize_llama_params
            params = quantize_llama_params(params, quant)
            draft = quantize_eagle_params(
                draft, "int8" if quant == "mixed" else quant)
        if batch > 1:
            from flowspec_tpu.runtime.batched import BatchedSpecEngine
            eng = BatchedSpecEngine(params, draft, cfg, batch_size=batch)
        else:
            eng = SpecEngine(params, draft, cfg)
    elif quant == "none" and mode == "spec" and batch <= 1:
        # bf16 spec needs XLA's negotiated (transposed) weight layouts to
        # avoid the 3GB of in-program copies that OOM the 16GB chip
        params, draft, formats = build_into_formats(mc, cfg)
        eng = SpecEngine(params, draft, cfg, formats=formats)
    elif batch > 1:
        params, draft = build_params(mc, quant, draft_kind, draft_ckpt)
        from flowspec_tpu.runtime.batched import BatchedSpecEngine
        eng = BatchedSpecEngine(params, draft, cfg, batch_size=batch)
    else:
        params, draft = build_params(mc, quant, draft_kind, draft_ckpt)
        eng = SpecEngine(params, draft, cfg)

    rng0 = np.random.default_rng(0)
    prompt = rng0.integers(10, 1000, 64)

    if mode == "stream":
        # STREAMING-ARRIVAL serving (r2 verdict #9): requests arrive over
        # time (Poisson, BENCH_ARRIVAL_RPS mean rate); measures
        # arrival->admission and arrival->completion latency percentiles
        # under the admission granularity BENCH_SERVE_K sets.
        n_req = int(os.environ.get("BENCH_STREAM_REQS", 3 * batch))
        rps = float(os.environ.get("BENCH_ARRIVAL_RPS", "4"))
        prompts = [rng0.integers(10, 1000, 64) for _ in range(n_req)]
        gaps = rng0.exponential(1.0 / rps, n_req)
        gaps[0] = 0.0
        arrivals = np.cumsum(gaps).tolist()
        serve_k = int(os.environ.get("BENCH_SERVE_K", "8"))
        n_tok = int(os.environ.get("BENCH_STREAM_TOKENS", "64"))
        # warmup: compile the dispatch program on a static 2-request run
        eng.serve_stream(prompts[:2], [0.0, 0.0], max_new_tokens=8,
                         eos_token_id=-1, rounds_per_dispatch=serve_k)
        t0 = time.perf_counter()
        outs, stats = eng.serve_stream(prompts, arrivals,
                                       max_new_tokens=n_tok,
                                       eos_token_id=-1,
                                       rounds_per_dispatch=serve_k)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"stream_{model_kind}_{quant}_b{batch}_rps{rps:g}",
            "value": round(stats["new_tokens"] / dt, 3),
            "unit": "tokens/s",
            "vs_baseline": None,   # the reference cannot serve (batch=1)
            "requests": n_req,
            "admission_p50_s": round(stats["admission_p50_s"], 3),
            "admission_p95_s": round(stats["admission_p95_s"], 3),
            "completion_p50_s": round(stats["completion_p50_s"], 3),
            "completion_p95_s": round(stats["completion_p95_s"], 3),
            "slot_utilization": round(stats["slot_utilization"], 3),
            "draft": draft_kind,
        }))
        return

    if mode == "serve":
        # token-level continuous batching: 2x batch_size requests through
        # `batch` slots; finished slots refill mid-flight (prompt chunks ride
        # the same rounds as the other slots' decode — no stall)
        if pfx_n:
            shared = rng0.integers(10, 1000, pfx_n).tolist()
            prompts = [shared + rng0.integers(10, 1000, 16).tolist()
                       for _ in range(2 * batch)]
        else:
            shared = None
            prompts = [rng0.integers(10, 1000, 64) for _ in range(2 * batch)]
        # with device-side refill the dispatch bound only sets admission
        # granularity; the loop's trip count is dynamic, so big K is free
        serve_k = int(os.environ.get("BENCH_SERVE_K", "256"))
        # BENCH_SERVE_ORDER=fifo|sjf|lpt picks the admission policy;
        # BENCH_SERVE_HETERO=1 mixes budgets (full/quarter alternating,
        # long job submitted last) so the policy has a tail wave to drain
        serve_order = os.environ.get("BENCH_SERVE_ORDER", "fifo")
        hetero = os.environ.get("BENCH_SERVE_HETERO")

        def gen(p_, max_new_tokens, **kw):
            if hetero:
                n = len(prompts)
                mx = [max_new_tokens // 4] * (n - 1) + [max_new_tokens]
            else:
                mx = max_new_tokens
            if shared is not None and pfx_cache:
                kw["shared_prefix"] = shared
            return eng.serve(prompts, max_new_tokens=mx,
                             rounds_per_dispatch=serve_k,
                             queue_order=serve_order, **kw)
    elif batch > 1:
        prompts = [rng0.integers(10, 1000, 64) for _ in range(batch)]
        gen = lambda p_, **kw: eng.generate_batch_fused(prompts, **kw)
    else:
        gen = eng.generate_fused if mode == "spec" else eng.generate_ar_fused
    if mode == "ttft":
        # p50 time-to-first-token (BASELINE.json metric): cold request ->
        # chunked prefill -> first spec round -> first committed token on
        # host. No reference TTFT is published, so vs_baseline is null.
        times = []
        for it in range(8):
            state = eng.init_state(seed=it)
            t0 = time.perf_counter()
            state = eng.prefill(state, prompt)
            state, res = eng._round(state, eng.params, eng.draft,
                                    eng.beam_head)
            np.asarray(res.accepted)        # force device->host
            if it > 0:                      # it 0 pays the compile
                times.append(time.perf_counter() - t0)
        p50 = sorted(times)[len(times) // 2]
        qtag = "" if quant == "none" else f"_{quant}"
        print(json.dumps({
            "metric": f"ttft_p50_{model_kind}{qtag}",
            "value": round(p50 * 1e3, 2),
            "unit": "ms",
            "vs_baseline": None,
        }))
        return

    # warmup with the SAME token budget: max_out is a static argument of the
    # fused decode loop, so a different budget would recompile in the timed
    # region below
    gen(prompt, max_new_tokens=n_tokens, eos_token_id=-1)

    t0 = time.perf_counter()
    out, stats = gen(prompt, max_new_tokens=n_tokens, eos_token_id=-1)
    dt = time.perf_counter() - t0
    toks = stats["new_tokens"]
    tps = toks / dt

    # FlowSpec means (BASELINE.md; reference README.md:136-144): 7B-class
    # 8.70 (T=0) / 8.38 (T=1) tok/s, 13B-class 2.21 / 2.14, on the
    # 5-Jetson cluster
    if model_kind == "13b":
        baseline = 2.21 if temp == 0 else 2.14
    elif model_kind == "struct":
        baseline = None     # ~0.5B trained base: no reference size class
    else:
        baseline = 8.70 if temp == 0 else 8.38
    qtag = "" if quant == "none" else f"_{quant}"
    btag = "" if batch <= 1 else f"_b{batch}"
    stag = "greedy" if temp == 0 else f"t{temp:g}"
    if force_accept:
        stag += f"_fa{force_accept}"   # synthetic-acceptance mode marker
    if mode == "serve":
        if os.environ.get("BENCH_SERVE_HETERO"):
            stag += "_hetero"
        so = os.environ.get("BENCH_SERVE_ORDER", "fifo")
        if so != "fifo":
            stag += f"_{so}"
        if pfx_n:
            stag += f"_pfx{pfx_n}" + ("c" if pfx_cache else "")
    row = {
        "metric": f"output_tokens_per_s_{model_kind}{qtag}_{mode}{btag}_{stag}",
        "value": round(tps, 3),
        "unit": "tokens/s",
        "vs_baseline": None if baseline is None else round(tps / baseline,
                                                           3),
    }
    if "slot_utilization" in stats:
        row["slot_utilization"] = round(stats["slot_utilization"], 3)
    if "latency_rounds" in stats:
        lr = sorted(stats["latency_rounds"])
        # per-request admission->finish rounds; the prefix-cache rows show
        # the chain-round savings here as well as in aggregate tok/s
        row["latency_rounds_p50"] = int(lr[len(lr) // 2])
    if "accept_per_round" in stats:
        row["accept_per_round"] = round(stats["accept_per_round"], 3)
    if mode != "ar":
        row["draft"] = draft_kind   # "trained" = earned acceptance
    print(json.dumps(row))


if __name__ == "__main__":
    main()
