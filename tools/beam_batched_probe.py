"""Locate the non-amortizing cost inside the BATCHED beam (vbeam=14ms at
B=4 vs 5.1ms single — tools/profile_batched.py).

Times, at B in {1,4}: the full vmapped topk_generate, the vmapped
level-scan alone (no build_tree), one vmapped _beam_step, the vmapped
build_tree alone, and the vmapped head+topk.
"""

import os
import sys
import time
import dataclasses
import functools

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/flowspec_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    import bench as benchmod
    from flowspec_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig, TreeConfig)
    from flowspec_tpu.draft.beam import (
        _beam_step, _init_beam, head_logits, topk_generate)
    from flowspec_tpu.draft.eagle import EagleParams
    from flowspec_tpu.models.kv_cache import KVCache
    from flowspec_tpu.runtime.engine import make_beam_head
    from flowspec_tpu.tree.build import build_tree, select_topn

    iters = int(os.environ.get("PROFILE_ITERS", "24"))
    mc = ModelConfig.llama_7b()
    tc = TreeConfig(node_cap=96, leaf_cap=96, depth_cap=16)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_new_tokens=64, max_seq_len=384)
    params, draft = benchmod.build_params(mc, "int8")
    bh = make_beam_head(params, draft, cfg)
    tcE = cfg.tree
    H = mc.hidden_size
    max_lv = tcE.depth + tcE.expand_depth

    S = 512
    nl, nkv, d = 1, mc.num_key_value_heads, mc.head_dim_

    def mk_cache(b):
        z = jnp.zeros((b, nl, 1, nkv, S, d), jnp.bfloat16)
        return KVCache(k=z, v=z, length=jnp.full((b,), 64, jnp.int32))

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
        print(f"{name:28s} {dt:8.3f} ms", flush=True)
        return dt

    for B in (1, 4):
        print(f"--- B={B}")
        cache = mk_cache(B)
        rh = jnp.zeros((B, H), jnp.bfloat16)

        # full topk_generate (vmapped over lanes)
        def full_fn(c, pd):
            r, ca = c
            def one(r1, c1):
                tree, _, c2 = topk_generate(pd[1], bh, c1,
                                            jnp.asarray(7, jnp.int32), r1,
                                            tcE, mc)
                dep = jnp.sum(tree.scores, where=jnp.isfinite(tree.scores))
                return r1 + (dep * 1e-6).astype(r1.dtype), c2
            r2, ca2 = jax.vmap(one)(r, ca)
            return (r2, ca2)
        timed("topk_generate", full_fn, (rh, cache))

        # level scan only (6 beam steps, no build_tree)
        def scan_fn(c, pd):
            r, ca = c
            def one(r1, c1):
                st = _init_beam(pd[1], bh, r1, c1.length, c1.length,
                                tcE, max_lv)
                def body(carry, _):
                    s, ck, cv = carry
                    s, ck, cv = _beam_step(pd[1], bh, ck, cv, s, mc,
                                           tcE.top_k, max_lv)
                    return (s, ck, cv), None
                (st, ck, cv), _ = jax.lax.scan(
                    body, (st, c1.k[0], c1.v[0]), None, length=tcE.depth)
                return (r1 + (jnp.sum(st.scores) * 1e-6).astype(r1.dtype),
                        KVCache(k=ck[None], v=cv[None], length=c1.length))
            r2, ca2 = jax.vmap(one)(r, ca)
            return (r2, ca2)
        timed("level_scan(6)", scan_fn, (rh, cache))

        # build_tree alone (vmapped)
        m = tcE.top_k + max_lv * tcE.top_k ** 2
        ct = jnp.tile(jnp.arange(m, dtype=jnp.int32)[None] % 31, (B, 1))
        cs = -jnp.tile(jnp.arange(m, dtype=jnp.float32)[None], (B, 1))
        cp = jnp.tile(
            jnp.maximum((jnp.arange(m, dtype=jnp.int32)[None] - tcE.top_k)
                        // tcE.top_k, -1), (B, 1))

        def build_fn(c, pd):
            cs_, acc = c
            def one(cs1):
                sel = select_topn(cs1, jnp.ones((m,), bool),
                                  tcE.total_tokens)
                tree = build_tree(ct[0], cs1, cp[0], sel,
                                  jnp.asarray(7, jnp.int32), tcE.node_cap,
                                  tcE.leaf_cap, tcE.depth_cap,
                                  sort_score=True)
                return jnp.sum(tree.depth).astype(jnp.float32)
            r = jax.vmap(one)(cs_)
            return (cs_ + (jnp.sum(r) * 1e-9), acc)
        timed("build_tree", build_fn, (cs, jnp.zeros(())))

        # head+topk per level (vmapped): (B, K, H) @ head
        hid = jnp.zeros((B, tcE.top_k, H), jnp.bfloat16)

        def head_fn(c, pd):
            h, acc = c
            lg = head_logits(h, bh)
            v_, t_ = jax.lax.approx_max_k(lg, tcE.top_k, recall_target=1.0)
            lse = jax.nn.logsumexp(lg, axis=-1)
            return (h + (jnp.sum(v_) * 1e-9 + jnp.sum(lse) * 1e-9
                         ).astype(h.dtype), acc)
        timed("head+topk", head_fn, (hid, jnp.zeros(())))


if __name__ == "__main__":
    main()
