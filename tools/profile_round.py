"""Per-component wall-clock breakdown of one speculative round on the TPU.

`jax.profiler.start_trace` hangs through the tunneled axon backend
(ROADMAP r1 #1), so this measures each round component as its own jitted
program, repeated N times inside a `lax.fori_loop` whose carry threads a
data dependency XLA cannot hoist, and timed by forcing a device->host
transfer of the final scalar (per CLAUDE.md: `block_until_ready` does not
reliably block on axon). Per-call dispatch (~70ms tunnel RTT) is amortized
across the N in-loop iterations.

Usage:  BENCH_MODEL=7b BENCH_QUANT=int8 python tools/profile_round.py
Writes a markdown table to stdout and PROFILE_<model>_<quant>.md.

Components (mirroring runtime/engine._spec_round):
  drain        draft-context forward over the pending-pair block
  beam         topk_generate (root init + depth levels + build_tree)
  verify       base-model forward over the tree chunk (the big matmuls)
  head+post    final norm + lm_head on tree rows + greedy posterior
  commit       KV compaction + pair packing (rest of the round)
  round        the full _spec_round (sum check)
  ar_step      one autoregressive step (baseline)
"""

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main():
    model_kind = os.environ.get("BENCH_MODEL", "7b")
    quant = os.environ.get("BENCH_QUANT", "int8")
    iters = int(os.environ.get("PROFILE_ITERS", "16"))

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/flowspec_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    import bench as benchmod  # reuse the bench's model construction
    from flowspec_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig, TreeConfig,
    )
    from flowspec_tpu.runtime import engine as E
    from flowspec_tpu.draft.beam import topk_generate
    from flowspec_tpu.draft.eagle import draft_context_forward
    from flowspec_tpu.models import model_forward
    from flowspec_tpu.models.bias import tree_bias
    from flowspec_tpu.models.llama import (
        embed_tokens, final_hidden, lm_head_logits,
    )
    from flowspec_tpu.tree.posterior import evaluate_posterior_greedy
    from flowspec_tpu.tree.types import tree_attention_bias

    # ---- build the bench engine (same env knobs) -------------------------
    os.environ.setdefault("BENCH_MODE", "spec")
    # reuse bench.main's construction path by inlining its config choices
    if model_kind == "7b":
        mc = ModelConfig.llama_7b()
        max_seq = int(os.environ.get("PROFILE_MAX_SEQ", "1152"))
    elif model_kind == "13b":
        mc = ModelConfig.llama_13b(); max_seq = 512
    elif model_kind == "1b":
        mc = ModelConfig(hidden_size=2048, intermediate_size=5504,
                         num_hidden_layers=16, num_attention_heads=16,
                         num_key_value_heads=16); max_seq = 1152
    else:
        mc = ModelConfig.tiny(); max_seq = 512
    tc = TreeConfig(node_cap=96, leaf_cap=96, depth_cap=16)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_new_tokens=64, max_seq_len=max_seq)
    params, draft = benchmod.build_params(mc, quant)
    eng = E.SpecEngine(params, draft, cfg)
    tcE = eng.cfg.tree              # clamped caps
    mcE = eng.cfg.model
    n_cap = tcE.node_cap

    state = eng.init_state(0)
    state = eng.prefill(state, np.random.default_rng(0).integers(10, 1000, 64))

    # one real round to get representative tree/state tensors
    state1, _ = eng._round(state, params, draft)

    def timed(name, fn, carry, n=iters):
        """fn: (carry, (params, draft)) -> carry with a live data dependency.
        Weights are explicit jit arguments — closing over them would embed
        multi-GB literals in the HLO and blow the remote-compile body limit
        (HTTP 413 through the tunnel)."""
        loop = jax.jit(lambda c, pd: jax.lax.fori_loop(
            0, n, lambda i, c_: fn(c_, pd), c))
        out = loop(carry, (params, draft))    # compile + warmup
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf).astype(jnp.float32))
        t0 = time.perf_counter()
        out = loop(carry, (params, draft))
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / n * 1e3
        rows.append((name, dt))
        print(f"{name:12s} {dt:8.3f} ms")
        return dt

    rows = []
    dt_model = jnp.dtype(mcE.dtype)
    H = mcE.hidden_size
    commit = state1.commit_len

    # ---- drain: draft context over the pending block ---------------------
    def drain_fn(c, pd):
        toks, hid, dc = c
        out, dc2 = draft_context_forward(pd[1], dc, toks, hid,
                                         dc.length, jnp.asarray(8), mcE)
        # feed output back so the loop cannot be collapsed
        return (toks, out * 1e-4 + hid * (1 - 1e-4), dc2)
    ctx = state1.pending_tokens.shape[0]
    timed("drain", drain_fn,
          (state1.pending_tokens,
           state1.pending_hidden.astype(dt_model),
           state1.draft_cache))

    # ---- beam: draft tree generation ------------------------------------
    root_h = jnp.zeros((H,), dt_model)

    def beam_fn(c, pd):
        rh, dc = c
        tree, _, dc2 = topk_generate(pd[1], pd[0].lm_head, dc,
                                     jnp.asarray(7, jnp.int32), rh, tcE, mcE)
        dep = jnp.sum(tree.scores, where=jnp.isfinite(tree.scores)) * 1e-6
        return (rh + dep.astype(dt_model), dc2)
    timed("beam", beam_fn, (root_h, state1.draft_cache))

    # ---- beam sub-components --------------------------------------------
    from flowspec_tpu.draft.beam import _init_beam, _beam_step, head_logits
    from flowspec_tpu.runtime.engine import make_beam_head
    bh = make_beam_head(params, draft, eng.cfg)
    max_lv = tcE.depth + tcE.expand_depth
    bs0 = _init_beam(draft, bh, root_h, state1.draft_cache.length,
                     state1.draft_cache.length, tcE, max_lv)

    def beam_level_fn(c, pd):
        st, ck, cv = c
        st2, ck, cv = _beam_step(pd[1], bh, ck, cv, st, mcE, tcE.top_k,
                                 max_lv)
        # reset level so shapes/write offsets stay fixed across iterations
        import dataclasses as _dc
        st2 = _dc.replace(st2, level=st.level)
        return (st2, ck, cv)
    timed("beam_level", beam_level_fn,
          (bs0, state1.draft_cache.k[0], state1.draft_cache.v[0]))

    def beam_headtopk_fn(c, pd):
        hid, acc = c
        logits = head_logits(hid, bh)
        logp = jax.nn.log_softmax(logits, axis=-1)
        sc, tok = jax.lax.approx_max_k(logp, tcE.top_k, recall_target=1.0)
        return (hid + (jnp.sum(sc) * 1e-6).astype(hid.dtype), acc)
    timed("beam_head+topk", beam_headtopk_fn,
          (jnp.zeros((tcE.top_k, H), dt_model), jnp.zeros((), dt_model)))

    # ---- head+post sub-components ---------------------------------------
    def head_mm_fn(c, pd):
        hid, acc = c
        normed = final_hidden(pd[0], hid, mcE)
        logits = lm_head_logits(pd[0], normed[0])
        return (hid + (jnp.max(logits) * 1e-9).astype(hid.dtype), acc)
    timed("head_mm", head_mm_fn,
          (jnp.zeros((1, n_cap, H), dt_model), jnp.zeros((), dt_model)))

    # ---- verify: base forward over n_cap tree rows ----------------------
    parents = jnp.concatenate([jnp.asarray([-1], jnp.int32),
                               jnp.arange(n_cap - 1, dtype=jnp.int32)])
    anc_bias = tree_attention_bias(parents, tcE.depth_cap,
                                   jnp.ones((n_cap,), bool))
    bias = tree_bias(anc_bias, commit, jnp.zeros((), jnp.int32),
                     state1.base_cache.max_len)
    positions = commit + jnp.arange(n_cap, dtype=jnp.int32)

    def verify_fn(c, pd):
        hidden, cache = c
        out, cache2 = model_forward(pd[0], cache, hidden, positions, bias,
                                    commit, mcE)
        return (out * 1e-4 + hidden * (1 - 1e-4), cache2)
    hidden0 = jnp.zeros((1, n_cap, H), dt_model)
    timed("verify", verify_fn, (hidden0, state1.base_cache))

    # ---- head + posterior -----------------------------------------------
    from flowspec_tpu.tree.build import finalize_tree
    scores = jnp.zeros((n_cap,), jnp.float32)
    tree = finalize_tree(jnp.ones((n_cap,), jnp.int32), parents, scores,
                         jnp.asarray(n_cap, jnp.int32), tcE.leaf_cap,
                         tcE.depth_cap)

    def head_fn(c, pd):
        hidden, acc = c
        normed = final_hidden(pd[0], hidden, mcE)
        logits = lm_head_logits(pd[0], normed[0])
        res = evaluate_posterior_greedy(logits, tree)
        return (hidden + (res.accept_len.astype(dt_model) * 1e-6), acc)
    timed("head+post", head_fn, (hidden0, jnp.zeros((), dt_model)))

    # ---- commit: KV compaction + pair packing (round steps 4-6) ----------
    d_cap = tcE.depth_cap
    def commit_fn(c, pd):
        cache, normed, acc = c
        best_leaf = (acc.astype(jnp.int32) % 2)   # data-dep, XLA can't hoist
        accept_len = jnp.ones((), jnp.int32)
        path = tree.retrieve[best_leaf]
        n_acc = accept_len + 1
        d_idx = jnp.arange(d_cap, dtype=jnp.int32)
        path_valid = d_idx < n_acc
        safe_path = jnp.clip(path, 0, n_cap - 1)
        src = jnp.where(path_valid, commit + safe_path, 0)
        cache2 = cache.compact(src, n_acc, commit)
        pair_hidden = normed[:, safe_path]
        pair_hidden = jnp.where(path_valid[None, :, None], pair_hidden, 0.0)
        return (cache2.with_length(cache.length),
                normed + jnp.sum(pair_hidden) * 1e-9,
                acc + 1)
    timed("commit", commit_fn,
          (state1.base_cache, jnp.zeros((1, n_cap, H), dt_model),
           jnp.zeros((), jnp.float32)))

    # ---- full round + ar step -------------------------------------------
    def round_fn(st, pd):
        st2, _ = E._spec_round(st, pd[0], pd[1], cfg=mcE, tree_cfg=tcE,
                               sampling=eng.cfg.sampling)
        return st2
    timed("round", round_fn, state1, n=max(4, iters // 2))

    def ar_fn(st, pd):
        st2, _ = E._ar_step(st, pd[0], cfg=mcE, sampling=eng.cfg.sampling)
        return st2
    timed("ar_step", ar_fn, state1, n=iters)

    # ---- report ----------------------------------------------------------
    total_parts = sum(t for n, t in rows if n in
                      ("drain", "beam", "verify", "head+post", "commit"))
    name = f"PROFILE_{model_kind}_{quant}.md"
    with open(name, "w") as f:
        f.write(f"# Round breakdown — {model_kind} {quant} "
                f"(node_cap={n_cap}, iters={iters})\n\n")
        f.write("| component | ms |\n|---|---|\n")
        for n_, t in rows:
            f.write(f"| {n_} | {t:.3f} |\n")
        f.write(f"| sum(parts) | {total_parts:.3f} |\n")
    print(json.dumps({"profile": name,
                      "parts_ms": {n_: round(t, 3) for n_, t in rows},
                      "sum_parts_ms": round(total_parts, 3)}))


if __name__ == "__main__":
    main()
