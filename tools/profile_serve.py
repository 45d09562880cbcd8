"""Decompose the serve_stream dispatch budget on the TPU (r4 verdict #9).

jax.profiler traces still hang through the tunneled axon backend (ROADMAP
open item 5), so this attributes the serve-path round budget the same way
tools/profile_round.py attributes the solo round: each component is timed
as its own dispatch with a forced device->host transfer (block_until_ready
does not reliably block on axon — CLAUDE.md).

Components of one serve dispatch (runtime/batched.py serve/serve_stream):
  rtt          one eager scalar fetch — the ~70ms tunnel round-trip floor
  packed_fetch np.asarray of the (K+1, B, depth_cap+2) packed result —
               the ONE fetch a dispatch pays (fetch - rtt = transfer)
  scan_K       the K-round fused scan program, dispatch+execute+fetch
  scan_1       the same program at K=1 — isolates per-dispatch overhead
               from per-round compute: round_ms = (scan_K - scan_1)/(K-1)
  boundary     one fused host-boundary surgery dispatch (_run_boundary
               fresh-fill plan) — paid per admission under streaming
  serve_e2e    a whole serve() workload, wall-clock per executed round —
               the end-to-end number the parts must explain

Env: PROFILE_MODEL=struct|7b|tiny (default struct; struct needs the
trained npz files from tools/train_struct_base.py), PROFILE_BATCH (4),
PROFILE_K (8), PROFILE_ITERS (8). Writes PROFILE_serve.md.
"""

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import numpy as np


def main():
    model_kind = os.environ.get("PROFILE_MODEL", "struct")
    b = int(os.environ.get("PROFILE_BATCH", "4"))
    k = int(os.environ.get("PROFILE_K", "8"))
    iters = int(os.environ.get("PROFILE_ITERS", "8"))

    import jax
    if model_kind == "tiny":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/flowspec_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from flowspec_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig, TreeConfig)
    from flowspec_tpu.runtime.batched import BatchedSpecEngine

    if model_kind == "struct":
        from bench import build_struct_params
        mc, params, draft = build_struct_params()
        tc = TreeConfig(node_cap=96, leaf_cap=96, depth=6, depth_cap=16)
    elif model_kind == "7b":
        from bench import build_params
        mc = ModelConfig.llama_7b()
        ckpt = os.path.join(_ROOT, "checkpoints", "draft_7b_thin_fp16.npz")
        params, draft = build_params(mc, "int8", "trained", ckpt)
        tc = TreeConfig(node_cap=96, leaf_cap=96, depth=8, depth_cap=16,
                        score_temperature=0.2)
    else:
        mc = ModelConfig.tiny()
        from flowspec_tpu.draft.eagle import init_eagle_params
        from flowspec_tpu.models.llama import init_llama_params
        params = init_llama_params(jax.random.key(0), mc)
        draft = init_eagle_params(jax.random.key(1), mc, embed=params.embed)
        tc = TreeConfig(total_tokens=32, node_cap=48, leaf_cap=48, depth=4,
                        depth_cap=8)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_new_tokens=128, max_seq_len=384)
    eng = BatchedSpecEngine(params, draft, cfg, batch_size=b)

    rng = np.random.default_rng(0)
    prompts = [rng.integers(10, 1000, 64) % mc.vocab_size
               for _ in range(2 * b)]

    rows = []

    def rec(name, ms, note=""):
        rows.append((name, ms, note))
        print(f"{name:14s} {ms:9.2f} ms  {note}", flush=True)

    # ---- rtt: one eager scalar fetch ---------------------------------
    f = jax.jit(lambda x: x + 1)
    x = f(jnp.zeros((), jnp.int32))
    float(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(x))
    rec("rtt", (time.perf_counter() - t0) / iters * 1e3,
        "eager scalar dispatch+fetch floor")

    # ---- serve end-to-end (also warms every program) ------------------
    eng.serve(prompts[:2], max_new_tokens=8, eos_token_id=-1,
              rounds_per_dispatch=k)
    t0 = time.perf_counter()
    outs, stats = eng.serve(prompts, max_new_tokens=64, eos_token_id=-1,
                            rounds_per_dispatch=k)
    e2e = time.perf_counter() - t0
    e2e_round = e2e / max(stats["rounds"], 1) * 1e3
    rec("serve_e2e", e2e_round,
        f"per executed round ({stats['rounds']} rounds, "
        f"{stats['new_tokens']} tokens, util "
        f"{stats['slot_utilization']:.2f})")

    # ---- the scan program in isolation -------------------------------
    # lanes: fresh fill of the first b requests, exactly like serve()
    n_pad = len(prompts)
    p_cap = eng.cfg.max_seq_len          # serve() pads prompts to max_seq
    q_np = np.zeros((n_pad, p_cap), np.int32)
    for i, p in enumerate(prompts):
        q_np[i, :len(p)] = p
    q_prompts = jnp.asarray(q_np)
    q_lens = jnp.asarray([len(p) for p in prompts], jnp.int32)
    q_budgets = jnp.asarray([10 ** 6] * n_pad, jnp.int32)

    def fresh_state():
        batched = eng._lanes_from_template(
            eng._zero_template(), [-1] * b, list(range(b)))
        bctx = eng._stack_states(
            [eng._serve_ctx(np.asarray(prompts[s], np.int32))
             for s in range(b)])
        return (batched, bctx, jnp.arange(b, dtype=jnp.int32),
                jnp.zeros((b,), jnp.int32),
                jnp.asarray([10 ** 6] * b, jnp.int32))

    tmpl = eng._template_consts(None)

    # scan signature: (batched, params, draft, beam_head, bctx, lane_req,
    # emitted, lane_budget, qhead, q_*, n_q, eos, seed, hold, *template)
    def run_scan2(kk, n_dispatch):
        scan = eng._get_serve_scan(kk)

        def call(c, qh):
            return scan(c[0], eng.params, eng.draft, eng.beam_head, c[1],
                        c[2], c[3], c[4], qh,
                        q_prompts, q_lens, q_budgets,
                        jnp.asarray(n_pad, jnp.int32),
                        jnp.asarray(-1, jnp.int32),
                        jnp.asarray(0, jnp.int32),
                        jnp.asarray(False), *tmpl)
        c = fresh_state()
        qh = jnp.asarray(b, jnp.int32)
        out = call(c, qh)                    # compile + warm
        np.asarray(out[-1])
        c = fresh_state()
        qh = jnp.asarray(b, jnp.int32)
        t0 = time.perf_counter()
        pk = None
        for _ in range(n_dispatch):
            bt, bc, req, em, bud, qh, packed = call(c, qh)
            c = (bt, bc, req, em, bud)
            pk = np.asarray(packed)
        dt = (time.perf_counter() - t0) / n_dispatch * 1e3
        return dt, pk

    dt_k, pk = run_scan2(k, iters)
    rec(f"scan_K={k}", dt_k, "dispatch + K rounds + packed fetch")
    dt_1, _ = run_scan2(1, iters)
    rec("scan_K=1", dt_1, "dispatch + 1 round + packed fetch")
    if k > 1:
        rec("round_compute", (dt_k - dt_1) / (k - 1),
            "marginal per-round compute inside the scan")
    rec("dispatch+fetch", dt_1 - (dt_k - dt_1) / max(k - 1, 1),
        "per-dispatch overhead (scan_1 minus one round)")

    # ---- packed fetch alone ------------------------------------------
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(pk)
    rec("packed_refetch", (time.perf_counter() - t0) / iters * 1e3,
        "np.asarray of the host copy (lower bound on transfer)")

    # ---- boundary surgery --------------------------------------------
    st = fresh_state()
    plan = dict(src_sel=[2] + [0] * (b - 1), fresh_qpos=[b] + [-1] * (b - 1),
                fresh_sfx=[-1] * b, fresh_seed=[0] * b, fresh_pos=[0] * b,
                parked=None, tstate=None)
    out = eng._run_boundary(st[0], st[1], st[3], st[4], plan,
                            q_prompts, q_lens, q_budgets)   # compile
    float(jnp.sum(out[2]))
    st = fresh_state()
    t0 = time.perf_counter()
    for _ in range(iters):
        o = eng._run_boundary(st[0], st[1], st[3], st[4], plan,
                              q_prompts, q_lens, q_budgets)
        st = (o[0], o[1], st[2], o[2], o[3])
        float(jnp.sum(o[2]))
    rec("boundary", (time.perf_counter() - t0) / iters * 1e3,
        "fused lane surgery dispatch (per admission)")

    name = os.path.join(_ROOT, "PROFILE_serve.md")
    with open(name, "w") as f:
        f.write(f"# Serve dispatch budget — {model_kind} "
                f"(B={b}, K={k}, iters={iters})\n\n")
        f.write("| component | ms | note |\n|---|---|---|\n")
        for n_, t, note in rows:
            f.write(f"| {n_} | {t:.2f} | {note} |\n")
    print(json.dumps({"profile": name,
                      "parts_ms": {n_: round(t, 2) for n_, t, _ in rows}}))


if __name__ == "__main__":
    main()
