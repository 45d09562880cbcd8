"""Fused draft-head scoring: int8 lm_head matmul + exact top-k + logsumexp
in ONE weight pass (Pallas), with an XLA fallback computing identical math.

The beam reads the lm_head once per tree level (7x per round counting root
init) at tiny T. The unfused chain (dequant einsum -> approx_max_k ->
logsumexp) measures 0.47 ms/level fused at B=1 and 1.35 ms/level at B=4
against a 0.24 ms weight-read floor (tools/head_probe.py,
tools/beam_ablate_probe.py): the XLA int8-dequant einsum collapses to
~130 GB/s at T<=40, and the top-k/lse epilogue re-reads the logits.

The kernel K-splits the weight into contiguous full-output-width row blocks
(the kfull layout of quant_matmul._int4_kfull_kernel — maximal DMA bursts,
measured 429 GB/s for the int8 twin at T=1) and accumulates f32 logits in a
VMEM scratch; the final K step applies the per-column scale and runs the
top-k + logsumexp epilogue on the VMEM accumulator, so the (T, V) logits
never touch HBM. Wide vocabularies are split into `v_steps` independent
column groups (an outer grid dim) whose partial top-k/lse merge outside in
XLA over tiny (T, v_steps*k) tensors.

A jax.custom_batching.custom_vmap rule flattens lane batches into rows:
under the batched engine's vmap the kernel still runs ONCE, reading the
weight once for all lanes (a plain vmapped pallas_call would re-read the
full weight per lane).

Routing (env FLOWSPEC_HEAD_KERNEL): unset/1 -> kernel on TPU backends,
XLA fallback elsewhere; 0 -> always fallback; "interpret" -> kernel in
pallas interpret mode (CPU-testable exactness).

Reference parity: this computes exactly the reference's
`log_softmax(lm_head(h)).topk(k)` (eagle/cnets.py:764-819) — values are
top-k log-probs, indices the token ids, ties broken by first index.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_VMEM_BUDGET = 14 * 1024 * 1024


def _mode() -> str:
    env = os.environ.get("FLOWSPEC_HEAD_KERNEL", "")
    if env == "0":
        return "off"
    if env == "interpret":
        return "interpret"
    try:
        return "on" if jax.default_backend() not in ("cpu",) else "off"
    except Exception:
        return "off"


def _pick_cfg(v: int, h: int, bt: int):
    """(bn, kb) minimizing the grid-step count (per-step sequencing overhead
    is the kernel's main slack — measured 0.67ms at 64 steps vs a 0.16ms
    DMA floor) subject to scoped VMEM: double-buffered (kb, bn) u8 tile +
    f32 accumulator + epilogue temporaries. Calibrated against Mosaic's
    allocator: (bt=16, bn=32000, kb=128) compiled to a 16.55M scoped
    allocation = dbuf (8.19M) + scale + ~3.1x the accumulator size (acc,
    iota, extraction mask/exp temps); budget 3.4x for headroom."""
    best = None
    for bn in range(128, v + 1, 128):
        if v % bn:
            continue
        for kb in (512, 256, 128):
            if h % kb:
                continue
            need = 2 * kb * bn + int(3.4 * bt * bn * 4) + 4 * bn
            if need > _VMEM_BUDGET:
                continue
            steps = (v // bn) * (h // kb)
            if best is None or steps < best[0]:
                best = (steps, bn, kb)
            break                      # larger kb always fewer steps
    return (best[1], best[2]) if best else None


def _pick_bn(v: int, bt: int) -> int | None:
    cfg = _pick_cfg(v, 4096, bt)
    return cfg[0] if cfg else None


def _kernel(x_ref, q_ref, s_ref, vals_ref, idx_ref, lse_ref, acc_ref, *,
            k_steps: int, topk: int):
    ki = pl.program_id(1)
    w = q_ref[:].astype(x_ref.dtype)                   # (KB, bn)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = acc

    @pl.when(ki > 0)
    def _accum():
        acc_ref[:] += acc

    @pl.when(ki == k_steps - 1)
    def _fin():
        logits = acc_ref[:] * s_ref[:].astype(jnp.float32)   # (bt, bn)
        m = jnp.max(logits, axis=1, keepdims=True)
        se = jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True)
        lse_ref[:] = (m + jnp.log(se))[None]
        iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        big = jnp.int32(2 ** 30)
        left = logits
        vs, js = [], []
        for _ in range(topk):                         # unrolled: topk small
            mi = jnp.max(left, axis=1, keepdims=True)
            ji = jnp.min(jnp.where(left >= mi, iota, big), axis=1,
                         keepdims=True)
            vs.append(mi)
            js.append(ji)
            left = jnp.where(iota == ji, -jnp.inf, left)
        vals_ref[:] = jnp.concatenate(vs, axis=1)[None]
        idx_ref[:] = jnp.concatenate(js, axis=1)[None]


def _head_topk_call(x2: jax.Array, q: jax.Array, s: jax.Array, k: int,
                    interpret: bool = False):
    """x2 (T, H) bf16 @ (q (H, V) int8 * s (V,)) -> top-k of log_softmax:
    (logp (T, k) f32, tok (T, k) i32)."""
    t0, h = x2.shape
    v = q.shape[1]
    bt = t0 + (-t0) % 16
    if bt != t0:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((bt - t0, h), x2.dtype)], axis=0)
    bn, kb = _pick_cfg(v, h, bt)
    k_steps = h // kb
    v_steps = v // bn

    vals, idx, lse = pl.pallas_call(
        functools.partial(_kernel, k_steps=k_steps, topk=k),
        grid=(v_steps, k_steps),
        in_specs=[
            pl.BlockSpec((bt, kb), lambda vi, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, bn), lambda vi, ki: (ki, vi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda vi, ki: (0, vi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, k), lambda vi, ki: (vi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, k), lambda vi, ki: (vi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, 1), lambda vi, ki: (vi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((v_steps, bt, k), jnp.float32),
            jax.ShapeDtypeStruct((v_steps, bt, k), jnp.int32),
            jax.ShapeDtypeStruct((v_steps, bt, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * bt * h * v,
            bytes_accessed=h * v + bt * h * 2,
            transcendentals=bt * v),
        interpret=interpret,
    )(x2, q, s.reshape(1, v))

    # merge the per-column-group partials (tiny tensors)
    idx_g = idx + (jnp.arange(v_steps, dtype=jnp.int32) * bn)[:, None, None]
    vcat = jnp.moveaxis(vals, 0, 1).reshape(bt, v_steps * k)
    icat = jnp.moveaxis(idx_g, 0, 1).reshape(bt, v_steps * k)
    top_v, pos = jax.lax.top_k(vcat, k)
    tok = jnp.take_along_axis(icat, pos, axis=1)
    lse_all = jax.nn.logsumexp(lse[:, :, 0], axis=0)          # (bt,)
    return (top_v - lse_all[:, None])[:t0], tok[:t0]


def _head_topk_xla(x2: jax.Array, head, k: int):
    """Fallback with identical semantics (top-k of log_softmax)."""
    from flowspec_tpu.draft.beam import head_logits
    logits = head_logits(x2, head)                    # (T, V) f32
    vals, tok = jax.lax.approx_max_k(logits, k, recall_target=1.0)
    lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    return vals - lse, tok.astype(jnp.int32)


# Below this many (flattened) rows the XLA chain beats the kernel: the
# kernel is DMA-pipeline-bound at ~0.66ms for the 7B head regardless of T
# (tools/head_probe*.py, /tmp/head_k_sweep), while the fused XLA chain
# costs ~0.47ms at T=10 but 1.35ms at T=40. Single-lane engines therefore
# keep XLA; batched engines (lanes flattened by the vmap rule) take the
# kernel. interpret mode (CPU tests) always takes the kernel.
_MIN_KERNEL_ROWS = 32


def _dispatch(x2, q, s, k: int, interpret: bool):
    from flowspec_tpu.ops.quant import Int8Tensor
    if interpret or x2.shape[0] >= _MIN_KERNEL_ROWS:
        return _head_topk_call(x2, q, s, k, interpret=interpret)
    return _head_topk_xla(x2, Int8Tensor(q=q, scale=s), k)


@functools.lru_cache(maxsize=None)
def _cv(k: int, interpret: bool):
    """custom_vmap-wrapped kernel entry for a given static k: lane batches
    flatten into rows so the weight is read once for every lane."""
    import jax.custom_batching

    @jax.custom_batching.custom_vmap
    def f(x2, q, s):
        return _dispatch(x2, q, s, k, interpret)

    @f.def_vmap
    def rule(axis_size, in_batched, x2, q, s):
        xb, qb, sb = in_batched
        if qb or sb:
            raise NotImplementedError("batched head weights")
        if not xb:
            return _dispatch(x2, q, s, k, interpret), (False, False)
        b, t, h = x2.shape
        lp, tok = _dispatch(x2.reshape(b * t, h), q, s, k, interpret)
        return (lp.reshape(b, t, k), tok.reshape(b, t, k)), (True, True)

    return f


def _kernel_ok(head, h: int) -> bool:
    from flowspec_tpu.ops.quant import Int8Tensor
    if not isinstance(head, Int8Tensor):
        return False
    v = head.q.shape[-1]
    return (head.q.ndim == 2 and head.scale.ndim == 1 and h % 128 == 0
            and v % 128 == 0 and v >= 2048
            and _pick_cfg(v, h, 64) is not None)


def head_topk(x: jax.Array, head, k: int):
    """x (..., H) -> (logp (..., k) f32, tokens (..., k) i32): the top-k of
    log_softmax(x @ head) per row — the beam's per-level scoring primitive
    (ref eagle/cnets.py:764-819)."""
    shape = x.shape
    h = shape[-1]
    x2 = x.reshape(-1, h)
    mode = _mode()
    if mode != "off" and _kernel_ok(head, h):
        lp, tok = _cv(k, mode == "interpret")(x2, head.q, head.scale)
    else:
        lp, tok = _head_topk_xla(x2, head, k)
    return lp.reshape(shape[:-1] + (k,)), tok.reshape(shape[:-1] + (k,))
