"""Per-component breakdown of one BATCHED (vmapped) speculative round.

The fixed-batch fused loop measures 62.6 aggregate tok/s at B=4 worst-case
acceptance — a ~64ms round against the single-lane engine's 18.4ms, when
weight reads (the single-lane round's dominant cost) should amortize across
lanes. This tool times the vmapped round and its components the same way
tools/profile_round.py does (fori_loop with a live data dependency, one
device->host transfer to stop the clock) to locate the non-amortizing cost.

Usage: BENCH_MODEL=7b BENCH_QUANT=int8 PROFILE_BATCH=4 \
           python tools/profile_batched.py
"""

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
    b = int(os.environ.get("PROFILE_BATCH", "4"))

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/flowspec_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import functools
    import jax.numpy as jnp
    import numpy as np

    import bench as benchmod
    from flowspec_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig, TreeConfig,
    )
    from flowspec_tpu.runtime import engine as E
    from flowspec_tpu.runtime.batched import BatchedSpecEngine
    from flowspec_tpu.draft.beam import topk_generate
    from flowspec_tpu.draft.eagle import draft_context_forward
    from flowspec_tpu.models import model_forward
    from flowspec_tpu.models.bias import tree_bias
    from flowspec_tpu.models.llama import final_hidden, lm_head_logits
    from flowspec_tpu.tree.types import tree_attention_bias

    if model_kind == "7b":
        mc = ModelConfig.llama_7b()
    elif model_kind == "13b":
        mc = ModelConfig.llama_13b()
    else:
        mc = ModelConfig.tiny()
    max_seq = int(os.environ.get("PROFILE_MAX_SEQ", "384"))
    tc = TreeConfig(node_cap=96, leaf_cap=96, depth_cap=16)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_new_tokens=64, max_seq_len=max_seq)
    params, draft = benchmod.build_params(mc, quant)
    eng = BatchedSpecEngine(params, draft, cfg, batch_size=b)
    tcE, mcE = eng.cfg.tree, eng.cfg.model
    n_cap = tcE.node_cap

    rng = np.random.default_rng(0)
    states = [eng._prefill_one(rng.integers(10, 1000, 64), i)
              for i in range(b)]
    batched = eng._stack_states(states)
    # one real vmapped round for representative tensors
    batched1, _ = eng._vround(batched, params, draft, eng.beam_head)

    rows = []

    def timed(name, fn, carry, n=iters):
        loop = jax.jit(lambda c, pd: jax.lax.fori_loop(
            0, n, lambda i, c_: fn(c_, pd), c))
        out = loop(carry, (params, draft))
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf).astype(jnp.float32))
        t0 = time.perf_counter()
        out = loop(carry, (params, draft))
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / n * 1e3
        rows.append((name, dt))
        print(f"{name:16s} {dt:8.3f} ms", flush=True)
        return dt

    dt_model = jnp.dtype(mcE.dtype)
    H = mcE.hidden_size

    # ---- full vmapped round ---------------------------------------------
    vround = jax.vmap(
        functools.partial(E._spec_round, cfg=mcE, tree_cfg=tcE,
                          sampling=eng.cfg.sampling),
        in_axes=(0, None, None, None))

    def round_fn(c, pd):
        st, acc = c
        st2, res = vround(st, pd[0], pd[1], eng.beam_head)
        return (st2, acc + jnp.sum(res.n_accepted))
    timed("vround", round_fn, (batched1, jnp.zeros((), jnp.int32)))

    # ---- batched verify forward -----------------------------------------
    commit = batched1.commit_len                       # (B,)
    parents = jnp.concatenate([jnp.asarray([-1], jnp.int32),
                               jnp.arange(n_cap - 1, dtype=jnp.int32)])
    anc = tree_attention_bias(parents, tcE.depth_cap,
                              jnp.ones((n_cap,), bool))

    def mk_bias(cm, cache):
        return tree_bias(anc, cm, jnp.zeros((), jnp.int32), cache.max_len)

    def vverify_fn(c, pd):
        hidden, caches = c
        def one(h, cache, cm):
            bias = mk_bias(cm, cache)
            pos = cm + jnp.arange(n_cap, dtype=jnp.int32)
            out, cache2 = model_forward(pd[0], cache, h, pos, bias, cm, mcE)
            return out, cache2
        out, caches2 = jax.vmap(one, in_axes=(0, 0, 0))(hidden, caches,
                                                        commit)
        return (out * 1e-4 + hidden * (1 - 1e-4), caches2)
    hidden0 = jnp.zeros((b, 1, n_cap, H), dt_model)
    timed("vverify", vverify_fn, (hidden0, batched1.base_cache))

    # ---- batched head matmul + posterior is small; time the head alone ---
    def vhead_fn(c, pd):
        hid, acc = c
        def one(h):
            normed = final_hidden(pd[0], h, mcE)
            return lm_head_logits(pd[0], normed[0])
        lg = jax.vmap(one)(hid)
        return (hid + (jnp.max(lg) * 1e-9).astype(hid.dtype), acc)
    timed("vhead", vhead_fn, (hidden0, jnp.zeros((), dt_model)))

    # ---- batched beam ----------------------------------------------------
    root_h = jnp.zeros((b, H), dt_model)

    def vbeam_fn(c, pd):
        rh, dc = c
        def one(r, cache):
            tree, _, dc2 = topk_generate(pd[1], eng.beam_head, cache,
                                         jnp.asarray(7, jnp.int32), r,
                                         tcE, mcE)
            dep = jnp.sum(tree.scores, where=jnp.isfinite(tree.scores))
            return (r + (dep * 1e-6).astype(r.dtype), dc2)
        rh2, dc2 = jax.vmap(one)(rh, dc)
        return (rh2, dc2)
    timed("vbeam", vbeam_fn, (root_h, batched1.draft_cache))

    # ---- batched drain ---------------------------------------------------
    def vdrain_fn(c, pd):
        toks, hid, dc = c
        def one(t, h, cache):
            out, dc2 = draft_context_forward(pd[1], cache, t, h,
                                             cache.length, jnp.asarray(8),
                                             mcE)
            return out * 1e-4 + h * (1 - 1e-4), dc2
        out, dc2 = jax.vmap(one)(toks, hid, dc)
        return (toks, out, dc2)
    timed("vdrain", vdrain_fn,
          (batched1.pending_tokens,
           batched1.pending_hidden.astype(dt_model),
           batched1.draft_cache))

    # ---- the while_loop gate select (tree_map where over EngineState) ----
    # fresh state stacks: `batched` was donated into _vround above
    states2 = [eng._prefill_one(rng.integers(10, 1000, 64), 100 + i)
               for i in range(b)]
    ga = eng._stack_states(states2)
    gb = jax.tree_util.tree_map(jnp.copy, ga)

    def gate_fn(c, pd):
        st_new, st_old, i = c
        ok = (jnp.arange(b) + i) % 2 == 0
        sel = lambda a, b_: jnp.where(
            jnp.reshape(ok, ok.shape + (1,) * (a.ndim - 1)), a, b_)
        st3 = jax.tree_util.tree_map(sel, st_new, st_old)
        return (st3, st_old, i + 1)
    timed("gate_select", gate_fn, (ga, gb, jnp.zeros((), jnp.int32)))

    total = sum(dt for name, dt in rows if name != "vround")
    print(f"\nsum(parts) = {total:.3f} ms vs vround = "
          f"{dict(rows)['vround']:.3f} ms")

    out_path = os.path.join(_ROOT, f"PROFILE_batched_{model_kind}_{quant}.md")
    with open(out_path, "w") as f:
        f.write(f"# Batched round breakdown — {model_kind} {quant} "
                f"(B={b}, max_seq={max_seq}, iters={iters})\n\n")
        f.write("| component | ms |\n|---|---|\n")
        for name, dt in rows:
            f.write(f"| {name} | {dt:.3f} |\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
