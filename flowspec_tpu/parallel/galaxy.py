"""Galaxy mode: sequence-sharded tensor parallelism with ring-overlap
collectives.

Reference: the "galaxy" TP verification path (tp/tp_modeling_llama.py:611-962)
— the reference's flagship TP. Activations between layers are sharded over the
*sequence* axis; before each column-parallel matmul block a ring all-gather
reassembles the full sequence with each hop's arriving shard feeding its
matmul slice (`ring_all_gather_comp_overlap`, :686-758), and after each
row-parallel matmul a ring reduce-scatter returns to sequence shards while
summing the rank-partial products (`ring_reduce_scatter_comp_overlap`,
:611-683). Norms and residual adds then run on S/tp rows per device.

TPU-native formulation: one `shard_map` over the `tp` mesh axis; the rings
are unrolled `ppermute` chains whose per-hop matmuls are data-independent of
the in-flight transfer, so XLA's latency-hiding scheduler overlaps them on
ICI exactly where the reference hand-schedules isend/irecv. This is the
explicit-collective realization of what `parallel/tp.py`'s GSPMD layout
delegates to the compiler; both paths share the megatron weight sharding
(`shard_params_tp`), so an engine can switch per-forward.

Scope: the base-model verify/prefill forward (the reference's galaxy is also
verify-only, tp/tp_ea_model.py:240-270). Rows must divide tp (the reference
pads prefill the same way, tp/tp_ea_model.py:419-426); single-row (AR) and
quantized/mixtral forwards fall back to the GSPMD path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from flowspec_tpu.config import ModelConfig
from flowspec_tpu.models import model_forward
from flowspec_tpu.models.kv_cache import KVCache
from flowspec_tpu.models.llama import (
    LlamaParams, LlamaLayerParams, attention, rms_norm, rope,
)


def ring_ag_matmuls(x_loc: jax.Array, ws, axis: str, tp: int):
    """all_gather(x_loc) @ w for each w, as an unrolled ppermute ring.

    x_loc (t_loc, H) is this rank's sequence shard; each hop contributes the
    currently-held shard's output rows, then forwards the shard to the next
    rank — the matmul of hop i and the transfer of hop i+1's operand are
    independent, which is the overlap the reference builds by hand
    (tp/tp_modeling_llama.py:686-758). Returns [(tp*t_loc, O_i), ...].
    """
    t_loc = x_loc.shape[0]
    idx = jax.lax.axis_index(axis)
    outs = [jnp.zeros((tp * t_loc, w.shape[-1]), x_loc.dtype) for w in ws]
    blk = x_loc
    fwd = [(i, (i + 1) % tp) for i in range(tp)]
    for step in range(tp):
        src = (idx - step) % tp            # origin rank of the held shard
        for j, w in enumerate(ws):
            outs[j] = jax.lax.dynamic_update_slice(
                outs[j], (blk @ w).astype(x_loc.dtype), (src * t_loc, 0))
        if step < tp - 1:
            blk = jax.lax.ppermute(blk, axis, fwd)
    return outs


def ring_matmul_rs(y: jax.Array, w: jax.Array, axis: str, tp: int):
    """reduce_scatter(y @ w) over sequence blocks, as a ppermute ring.

    y (T, I_loc) holds full rows of this rank's inner shard; the full product
    is sum over ranks of y_r @ w_r. Each hop computes the partial for the
    accumulator's destination block while the accumulator itself rides the
    ring (ref ring_reduce_scatter_comp_overlap, tp/tp_modeling_llama.py:
    611-683). Returns (T/tp, H): this rank's sequence block, fully summed.
    """
    t = y.shape[0]
    t_loc = t // tp
    idx = jax.lax.axis_index(axis)
    bwd = [(i, (i - 1) % tp) for i in range(tp)]

    def blk(b):
        rows = jax.lax.dynamic_slice(y, (b * t_loc, 0), (t_loc, y.shape[1]))
        return (rows @ w).astype(jnp.float32)

    acc = blk((idx + 1) % tp)
    for s in range(1, tp):
        acc = jax.lax.ppermute(acc, axis, bwd)
        acc = acc + blk((idx + 1 + s) % tp)
    return acc.astype(y.dtype)


def _galaxy_body(params: LlamaParams, ck, cv, x_loc, positions, bias,
                 write_start, cfg: ModelConfig, axis: str, tp: int):
    """Per-device layer stack. x_loc (1, t_loc, H) sequence shard; ck/cv
    (L, 1, nkv/tp, S, D) head shards; positions (T,), bias (T, S) replicated.
    """
    d = cfg.head_dim_
    nq_loc = cfg.num_attention_heads // tp
    nkv_loc = cfg.num_key_value_heads // tp
    n_rep = cfg.num_attention_heads // cfg.num_key_value_heads
    t = positions.shape[0]

    def layer(carry, xs):
        x, kc, vc = carry                       # x (1, t_loc, H)
        lp, l = xs
        res = x
        h = rms_norm(x, lp.input_ln, cfg.rms_norm_eps)[0]       # (t_loc, H)

        q, k, v = ring_ag_matmuls(h, [lp.wq, lp.wk, lp.wv], axis, tp)
        # local-head bias slices (bq is (nq*d,) sharded -> (nq_loc*d,))
        q, k, v = q + lp.bq, k + lp.bk, v + lp.bv
        q = rope(q.reshape(1, t, nq_loc, d).transpose(0, 2, 1, 3),
                 positions, cfg.rope_theta)
        k = rope(k.reshape(1, t, nkv_loc, d).transpose(0, 2, 1, 3),
                 positions, cfg.rope_theta)
        v = v.reshape(1, t, nkv_loc, d).transpose(0, 2, 1, 3)

        kc = jax.lax.dynamic_update_slice(
            kc, k.astype(kc.dtype)[None], (l, 0, 0, write_start, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, v.astype(vc.dtype)[None], (l, 0, 0, write_start, 0))
        lshape = (1,) + kc.shape[1:]
        zero = jnp.zeros((), jnp.int32)
        k_all = jax.lax.dynamic_slice(
            kc, (l, zero, zero, zero, zero), lshape)[0]
        v_all = jax.lax.dynamic_slice(
            vc, (l, zero, zero, zero, zero), lshape)[0]

        attn = attention(q, k_all, v_all, bias, n_rep)   # (1, nq_loc, T, D)
        attn = attn.transpose(0, 2, 1, 3).reshape(t, nq_loc * d)
        o_loc = ring_matmul_rs(attn, lp.wo, axis, tp)    # (t_loc, H) summed
        x = res + o_loc[None]

        res = x
        h = rms_norm(x, lp.post_ln, cfg.rms_norm_eps)[0]
        g, u = ring_ag_matmuls(h, [lp.w_gate, lp.w_up], axis, tp)
        act = jax.nn.silu(g.astype(jnp.float32)).astype(g.dtype) * u
        d_loc = ring_matmul_rs(act, lp.w_down, axis, tp)
        x = res + d_loc[None]
        return (x, kc, vc), None

    n_layers = ck.shape[0]
    (x, ck, cv), _ = jax.lax.scan(
        layer, (x_loc, ck, cv),
        (params.layers, jnp.arange(n_layers, dtype=jnp.int32)))
    return x, ck, cv


def make_galaxy_forward(mesh: Mesh, axis: str = "tp"):
    """A `model_forward`-signature forward running the galaxy layer stack.

    Falls back to the GSPMD path (model_forward) when the row count does not
    divide tp (e.g. the single-row AR step), or for quantized / non-llama
    parameter families — mirroring the reference, whose galaxy covers only
    the fp16 llama verify path (tp/tp_modeling_llama.py:835-962).
    """
    tp = mesh.shape[axis]
    col = P(None, None, axis)
    row = P(None, axis, None)
    vcol = P(None, axis)
    rep = P()
    lp_spec = LlamaLayerParams(
        wq=col, wk=col, wv=col, wo=row, bq=vcol, bk=vcol, bv=vcol,
        w_gate=col, w_up=col, w_down=row, input_ln=rep, post_ln=rep)
    p_spec = LlamaParams(embed=rep, layers=lp_spec, final_norm=rep,
                         lm_head=P(None, axis))
    cache_spec = P(None, None, axis, None, None)

    def galaxy_forward(params, cache: KVCache, hidden, positions, bias,
                       write_start, cfg: ModelConfig):
        from flowspec_tpu.ops.quant import Int4Tensor, Int8Tensor, NF4Tensor
        t = hidden.shape[1]
        quantized = any(isinstance(w, (Int8Tensor, NF4Tensor, Int4Tensor))
                        for w in jax.tree_util.tree_leaves(
                            params, is_leaf=lambda x: isinstance(
                                x, (Int8Tensor, NF4Tensor, Int4Tensor))))
        if (not isinstance(params, LlamaParams) or quantized or t % tp
                or t < tp):
            return model_forward(params, cache, hidden, positions, bias,
                                 write_start, cfg)

        body = functools.partial(_galaxy_body, cfg=cfg, axis=axis, tp=tp)
        sharded = jax.shard_map(
            lambda p, ck, cv, x, pos, b, ws: body(p, ck, cv, x, pos, b, ws),
            mesh=mesh,
            in_specs=(p_spec, cache_spec, cache_spec, P(None, axis, None),
                      rep, rep, rep),
            out_specs=(P(None, axis, None), cache_spec, cache_spec),
            check_vma=False,
        )
        x, k_new, v_new = sharded(params, cache.k, cache.v, hidden,
                                  positions, bias, write_start)
        return x, KVCache(k=k_new, v=v_new, length=cache.length)

    return galaxy_forward
