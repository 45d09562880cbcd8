"""Ablate the real _beam_step to find the component that stops amortizing
under vmap (B=1: ~1.0 ms/level, B=4: ~2.2 — tools/beam_batched_probe.py).

Variants (real int8 7B draft weights, real BeamState):
  full        unmodified _beam_step
  no_head     head+topk+lse replaced by a cheap projection of `out`
  no_attn     eagle_layer's attention output replaced by x (matmuls stay)
  no_gather   frontier re-selection gathers replaced by identity indices
"""

import os
import sys
import time
import dataclasses

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/flowspec_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import bench as benchmod
    from flowspec_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig, TreeConfig)
    from flowspec_tpu.draft import beam as BM
    from flowspec_tpu.draft.eagle import eagle_layer, fuse
    from flowspec_tpu.models.kv_cache import KVCache
    from flowspec_tpu.runtime.engine import make_beam_head

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
    K = tcE.top_k
    S, nkv, d = 512, mc.num_key_value_heads, mc.head_dim_

    def step_variant(p, head, ck, cv, st, no_head=False, no_attn=False,
                     no_gather=False):
        """_beam_step body with ablation switches (mirrors beam.py)."""
        k_beam = K
        s_max = ck.shape[-2]
        l = st.level
        write_start = st.ctx_end + l * k_beam
        x = fuse(p, st.tokens[None], st.hidden[None])
        positions = jnp.full((k_beam,), st.pos0 + l, jnp.int32)
        eye_l = (jnp.arange(max_lv * k_beam, dtype=jnp.int32)[None, :] ==
                 (l * k_beam + jnp.arange(k_beam, dtype=jnp.int32))[:, None])
        fwd_mask = st.mask | eye_l
        j = jnp.arange(s_max, dtype=jnp.int32)[None, :]
        beam_col = jnp.clip(j - st.ctx_end, 0, max_lv * k_beam - 1)
        beam_part = jnp.take_along_axis(
            fwd_mask, jnp.broadcast_to(beam_col, (k_beam, s_max)), axis=1)
        ok = jnp.where(j < st.ctx_end, True, beam_part)
        ok = ok & (j < st.ctx_end + max_lv * k_beam)
        bias = jnp.where(ok, 0.0, -1e9).astype(jnp.float32)

        if no_attn:
            from flowspec_tpu.models.llama import rms_norm
            from flowspec_tpu.ops.quant import qmatmul
            out = x + qmatmul(qmatmul(x, p.wq), p.wo)  # matmuls, no attn/KV
            res = out
            out = rms_norm(out, p.post_ln, mc.rms_norm_eps)
            out = res + qmatmul(
                jax.nn.silu(qmatmul(out, p.w_gate)) * qmatmul(out, p.w_up),
                p.w_down)
        else:
            out, ck, cv = eagle_layer(x, p, ck, cv, positions, bias,
                                      write_start, mc)
        out = out[0]

        if no_head:
            row_val = jnp.cumsum(out[:, :k_beam].astype(jnp.float32), axis=1)
            row_tok = jnp.broadcast_to(
                jnp.arange(k_beam, dtype=jnp.int32)[None], (k_beam, k_beam))
            cu = row_val + st.scores[:, None]
        else:
            logits = BM.head_logits(out, head)
            row_val, row_tok = jax.lax.approx_max_k(logits, k_beam,
                                                    recall_target=1.0)
            lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
            cu = (row_val - lse) + st.scores[:, None]

        flat_base = k_beam + l * k_beam * k_beam
        cand_tok = row_tok.reshape(-1).astype(jnp.int32)
        cand_sc = cu.reshape(-1)
        cand_par = jnp.repeat(st.flat_ids, k_beam)
        m = st.cand_tokens.shape[0]
        ct = jax.lax.dynamic_update_slice(st.cand_tokens, cand_tok,
                                          (flat_base,))
        cs = jax.lax.dynamic_update_slice(st.cand_scores, cand_sc,
                                          (flat_base,))
        cp = jax.lax.dynamic_update_slice(st.cand_parents, cand_par,
                                          (flat_base,))
        cv_ = st.cand_valid | (
            (jnp.arange(m) >= flat_base) &
            (jnp.arange(m) < flat_base + k_beam ** 2))

        top_sc, sel = jax.lax.top_k(cand_sc, k_beam)
        if no_gather:
            b = jnp.arange(k_beam, dtype=jnp.int32)
            new_tokens = cand_tok[:k_beam]
            new_hidden = out
            new_mask = fwd_mask
        else:
            b = sel // k_beam
            new_tokens = cand_tok[sel]
            new_hidden = out[b]
            new_mask = fwd_mask[b]
        st2 = BM.BeamState(
            tokens=new_tokens, hidden=new_hidden, scores=top_sc,
            flat_ids=flat_base + sel, mask=new_mask, level=l + 1,
            ctx_end=st.ctx_end, pos0=st.pos0,
            cand_tokens=ct, cand_scores=cs, cand_parents=cp, cand_valid=cv_,
            selected=st.selected)
        return st2, ck, cv

    def timed(name, B, **abl):
        z = jnp.zeros((B, 1, nkv, S, d), jnp.bfloat16)
        rh = jnp.zeros((B, H), jnp.bfloat16)
        length = jnp.full((B,), 64, jnp.int32)

        def run(carry, pd):
            rh_, ck, cv = carry
            p = pd[1]

            def one(r1, ck1, cv1, ln):
                st = BM._init_beam(p, bh, r1, ln, ln, tcE, max_lv)
                def body(c, _):
                    s, k_, v_ = c
                    s, k_, v_ = step_variant(p, bh, k_, v_, s, **abl)
                    return (s, k_, v_), None
                (st, k_, v_), _ = jax.lax.scan(body, (st, ck1, cv1), None,
                                               length=tcE.depth)
                return (r1 + (jnp.sum(st.scores) * 1e-6).astype(r1.dtype),
                        k_, v_)
            rh2, ck2, cv2 = jax.vmap(one)(rh_, ck, cv, length)
            return (rh2, ck2, cv2)

        loop = jax.jit(lambda c, pd: jax.lax.fori_loop(
            0, iters, lambda i, c_: run(c_, pd), c))
        out = loop((rh, z, z), (params, draft))
        float(jnp.sum(out[0]).astype(jnp.float32))
        t0 = time.perf_counter()
        out = loop((rh, z, z), (params, draft))
        float(jnp.sum(out[0]).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:22s} B={B} {dt:8.3f} ms/scan6", flush=True)
        return dt

    for B in (1, 4):
        timed("full", B)
        timed("no_head", B, no_head=True)
        timed("no_attn", B, no_attn=True)
        timed("no_gather", B, no_gather=True)


if __name__ == "__main__":
    main()
