"""Fused dequant + matmul Pallas TPU kernels (the bitsandbytes replacement).

Decode-time matmuls are weight-bandwidth-bound: the win of weight-only
quantization is reading 1 byte (int8/nf4 container) instead of 2 (bf16) per
weight from HBM. These kernels stream quantized weight tiles into VMEM,
dequantize on the VPU, and feed the MXU — the bf16 weight copy never exists
in HBM.

Shape regime: x is (B, T, In) with small T (chunk/beam/tree sized, <= a few
hundred rows), so the whole activation fits VMEM and the kernel tiles only
the output dimension — each grid step is one (T, In) x (In, BN) dot with a
multi-MB weight tile, big enough that the weight DMA pipeline (double
buffering across grid steps) hides behind the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flowspec_tpu.ops.quant import NF4_CODE, NF4_BLOCK

BN = 512          # output tile (per grid step weight tile = In x BN bytes)
VMEM_BUDGET = 12 * 1024 * 1024   # leave headroom under the 16MB scoped limit


def _tile(n, pref):
    for d in (pref, 512, 256, 128, 64, 32, 16, 8):
        if d <= pref and n % d == 0:
            return d
    return n


def _pad_rows(x2, mult=16):
    bt = x2.shape[0]
    pad = (-bt) % mult
    if pad:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((pad, x2.shape[1]), x2.dtype)], axis=0)
    return x2, bt


def _int8_kernel(x_ref, q_ref, s_ref, o_ref):
    w = q_ref[:].astype(x_ref.dtype)                  # (In, BN)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@jax.jit
def int8_matmul(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """x (B, T, In) @ (q (In, Out) int8 * scale (Out,)) -> (B, T, Out)."""
    b, t, n_in = x.shape
    n_out = q.shape[-1]
    x2, bt0 = _pad_rows(x.reshape(b * t, n_in))
    bt = x2.shape[0]
    # VMEM: resident x (bt*In*2) + double-buffered q tile (2*In*bn) + out.
    x_bytes = bt * n_in * 2
    if x_bytes > VMEM_BUDGET - 2 * n_in * 64:
        # activation alone blows VMEM (large fused batches): XLA path
        y = jnp.einsum("bti,io->bto", x, q.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        return (y * scale).astype(x.dtype)
    budget_bn = max(64, (VMEM_BUDGET - x_bytes) // (2 * n_in + 2 * bt))
    bn = _tile(n_out, min(BN, budget_bn))

    out = pl.pallas_call(
        _int8_kernel,
        grid=(n_out // bn,),
        in_specs=[
            pl.BlockSpec((bt, n_in), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_in, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda n: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bt, n_out), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bt * n_in * n_out,
            bytes_accessed=n_in * n_out + bt * n_in * 2 + bt * n_out * 2,
            transcendentals=0),
    )(x2, q, scale.reshape(1, n_out))
    return out[:bt0].reshape(b, t, n_out)


def _nf4_decode(q, dtype):
    """uint8 codes 0..15 -> NF4 values via a 4-level select tree (no gather
    on the TPU vector unit)."""
    c = NF4_CODE
    qi = q.astype(jnp.int32)
    b0 = (qi & 1) != 0
    b1 = (qi & 2) != 0
    b2 = (qi & 4) != 0
    b3 = (qi & 8) != 0
    v01 = jnp.where(b0, c[1], c[0])
    v23 = jnp.where(b0, c[3], c[2])
    v45 = jnp.where(b0, c[5], c[4])
    v67 = jnp.where(b0, c[7], c[6])
    v89 = jnp.where(b0, c[9], c[8])
    vab = jnp.where(b0, c[11], c[10])
    vcd = jnp.where(b0, c[13], c[12])
    vef = jnp.where(b0, c[15], c[14])
    q0 = jnp.where(b1, v23, v01)
    q1 = jnp.where(b1, v67, v45)
    q2 = jnp.where(b1, vab, v89)
    q3 = jnp.where(b1, vef, vcd)
    h0 = jnp.where(b2, q1, q0)
    h1 = jnp.where(b2, q3, q2)
    return jnp.where(b3, h1, h0).astype(dtype)


def _nf4_kernel(xe_ref, xo_ref, q_ref, s_ref, o_ref, *, n_in):
    # q is PACKED (In//2, BN): byte i holds code(row 2i) << 4 | code(row
    # 2i+1). Rather than interleaving decoded rows back to (In, BN) — a
    # sublane shuffle whose Mosaic lowering burns >16MB of stack temps —
    # the contraction is split: even rows dot x's even lanes, odd rows dot
    # the odd lanes (x is deinterleaved OUTSIDE the kernel by XLA, it's
    # tiny). Decode in bf16: an f32 intermediate would double VMEM, and the
    # MXU consumes bf16 anyway. Mosaic has no i8-vector shrui: extract
    # nibbles in i32.
    packed = q_ref[:].astype(jnp.int32)               # (In//2, BN)
    hi = _nf4_decode(packed >> 4, jnp.bfloat16)
    lo = _nf4_decode(packed & 0xF, jnp.bfloat16)
    s = s_ref[:].astype(jnp.bfloat16)                 # (In // 64, BN)
    blocks, bn_ = s.shape
    half = n_in // 2
    # block b covers global rows [64b, 64b+64) = half-rows [32b, 32b+32)
    # for both the even and the odd stream
    s_half = jnp.broadcast_to(
        s[:, None, :], (blocks, NF4_BLOCK // 2, bn_)).reshape(half, bn_)
    acc = jnp.dot(xe_ref[:], (hi * s_half).astype(xe_ref.dtype),
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(xo_ref[:], (lo * s_half).astype(xo_ref.dtype),
                   preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _int4_kernel(xe_ref, xo_ref, q_ref, s_ref, o_ref, *, n_in):
    # Linear 4-bit: value = nibble - 8, no codebook select tree — ~5 VPU
    # ops/weight vs NF4's ~25, so the pass stays HBM-bound. Same split
    # even/odd contraction as _nf4_kernel.
    packed = q_ref[:].astype(jnp.int32)               # (In//2, BN)
    hi = ((packed >> 4) - 8).astype(jnp.bfloat16)
    lo = ((packed & 0xF) - 8).astype(jnp.bfloat16)
    s = s_ref[:].astype(jnp.bfloat16)                 # (In // 64, BN)
    blocks, bn_ = s.shape
    half = n_in // 2
    s_half = jnp.broadcast_to(
        s[:, None, :], (blocks, NF4_BLOCK // 2, bn_)).reshape(half, bn_)
    acc = jnp.dot(xe_ref[:], (hi * s_half).astype(xe_ref.dtype),
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(xo_ref[:], (lo * s_half).astype(xo_ref.dtype),
                   preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _packed4_matmul(x, q, scale, kernel, fallback):
    """Shared pallas_call wrapper for the packed-4-bit kernels (nf4/int4)."""
    b, t, n_in = x.shape
    n_out = q.shape[-1]
    assert q.shape[-2] * 2 == n_in, (q.shape, n_in)
    x2, bt0 = _pad_rows(x.reshape(b * t, n_in))
    bt = x2.shape[0]
    x_bytes = bt * n_in * 2
    budget_bn = (15 * 1024 * 1024 - x_bytes) // (6 * n_in + 2 * bt)
    if budget_bn < 128:     # 128 = TPU lane minimum for a block dim
        return fallback()
    bn = _tile(n_out, min(BN, budget_bn))
    assert n_in % NF4_BLOCK == 0, n_in
    x3 = x2.reshape(bt, n_in // 2, 2)
    xe, xo = x3[:, :, 0], x3[:, :, 1]

    out = pl.pallas_call(
        functools.partial(kernel, n_in=n_in),
        grid=(n_out // bn,),
        in_specs=[
            pl.BlockSpec((bt, n_in // 2), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, n_in // 2), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_in // 2, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_in // NF4_BLOCK, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda n: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bt, n_out), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bt * n_in * n_out,
            bytes_accessed=n_in * n_out // 2 + bt * n_in * 2 + bt * n_out * 2,
            transcendentals=0),
    )(xe, xo, q, scale)
    return out[:bt0].reshape(b, t, n_out)


def _int4_kfull_kernel(xe_ref, xo_ref, q_ref, s_ref, o_ref, acc_ref, *,
                       k_steps):
    # K-split grid with tiles spanning the FULL output width: a (kb, Out)
    # u8 tile is kb complete rows = one contiguous HBM block, so the weight
    # DMA bursts are maximal. Measured (tools/int4_kernel_probe.py, 7B
    # stack): 281-284 GB/s effective packed read at T=1/decode vs the
    # n-grid kernel's 147-166 — int4 reaches absolute-time parity with the
    # XLA int8 path (which reads 2x the bytes at 555 GB/s) while halving
    # HBM residency. The probe's staged ladder shows the nibble decode
    # itself costs ~5% (ceiling 310 vs nibbles 281); the residual gap to
    # DMA speed-of-light is per-pallas_call overhead (~20us x 224
    # calls/pass), not decode math.
    ki = pl.program_id(0)
    packed = q_ref[:].astype(jnp.int32)               # (kb, Out)
    kb, n_out = packed.shape
    s = s_ref[:].astype(jnp.bfloat16)                 # (kb//32, Out)
    s_half = jnp.broadcast_to(
        s[:, None, :], (kb // 32, 32, n_out)).reshape(kb, n_out)
    hi = ((packed >> 4) - 8).astype(jnp.bfloat16) * s_half
    lo = ((packed & 0xF) - 8).astype(jnp.bfloat16) * s_half
    acc = jnp.dot(xe_ref[:], hi, preferred_element_type=jnp.float32)
    acc += jnp.dot(xo_ref[:], lo, preferred_element_type=jnp.float32)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += acc

    @pl.when(ki == k_steps - 1)
    def _fin():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _kfull_kb(half: int, n_out: int, bt: int):
    """Largest kb (packed rows per grid step) that divides `half`, is a
    multiple of 256 (the x block needs kb%128, the (kb//32, Out) scale
    block needs kb//32 % 8), and fits the 16MB scoped-VMEM budget. None if
    impossible (e.g. 7B's down-proj half 5504 = 128*43, or a wide-Out
    matrix whose decode intermediates overflow even at kb=256).

    Budget model calibrated against Mosaic's allocator: a (512, 5120) u8
    tile at bt=64 compiled to a 17.87M scoped allocation — ~6.1 bytes per
    tile element beyond the fixed buffers (double-buffered q DMA + i32
    unpack + hi/lo bf16 + s_half, partially reused) — so use 6.5 B/elem
    against a 14.5M budget."""
    fixed = bt * n_out * 6 + bt * half * 4       # acc f32 + out + xe/xo
    cap = int((14.5 * 2**20 - fixed) // (6.5 * n_out))
    if cap < 256:
        return None
    return max((d for d in range(256, min(cap, half) + 1, 256)
                if half % d == 0), default=None)


def _int4_matmul_kfull(x, q, scale, kb_override=None):
    b, t, n_in = x.shape
    half, n_out = q.shape
    x2, bt0 = _pad_rows(x.reshape(b * t, n_in))
    bt = x2.shape[0]
    kb = kb_override or _kfull_kb(half, n_out, bt)
    if kb is None:
        return None
    k_steps = half // kb
    x3 = x2.reshape(bt, half, 2)
    xe, xo = x3[:, :, 0], x3[:, :, 1]
    out = pl.pallas_call(
        functools.partial(_int4_kfull_kernel, k_steps=k_steps),
        grid=(k_steps,),
        in_specs=[
            pl.BlockSpec((bt, kb), lambda k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, kb), lambda k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, n_out), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb // 32, n_out), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, n_out), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bt, n_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt, n_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bt * n_in * n_out,
            bytes_accessed=half * n_out + bt * n_in * 2 + bt * n_out * 2,
            transcendentals=0),
    )(xe, xo, q, scale)
    return out[:bt0].reshape(b, t, n_out)


@jax.jit
def int4_matmul(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """x (B, T, In) @ Int4(q (In//2, Out) packed u8, scale (In//64, Out))
    -> (B, T, Out). Small-T calls (AR steps, pair drains — T <= 32) route
    to the contiguous-tile kfull kernel, which reads ~280 GB/s packed
    there vs the n-grid kernel's ~165 (tools/int4_kernel_probe.py; the
    int8 twin measures kfull 429 vs n-grid 379 at T=1). At tree-verify
    width (T~96) kfull LOSES (int8: 318 vs 379) — the wide dots bind on
    the MXU/VMEM pipeline, not tile DMA — so wide calls keep the n-grid
    kernel, then the XLA dequant einsum as the final fallback."""
    if x.shape[0] * x.shape[1] <= 32:
        y = _int4_matmul_kfull(x, q, scale)
        if y is not None:
            return y

    def fallback():
        from flowspec_tpu.ops.quant import Int4Tensor, dequantize
        wd = dequantize(Int4Tensor(q=q, scale=scale)).astype(x.dtype)
        return jnp.einsum("bti,io->bto", x, wd,
                          preferred_element_type=jnp.float32).astype(x.dtype)
    return _packed4_matmul(x, q, scale, _int4_kernel, fallback)


@jax.jit
def nf4_matmul(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """x (B, T, In) @ NF4(q (In//2, Out) packed u8, scale (In//64, Out))
    -> (B, T, Out).

    VMEM note: per-output-column stack bytes surviving Mosaic's buffer
    reuse are ~6 * In (measured: In=10240 bn=256 allocated 16.04M —
    5.65*In/col — against the 16M scoped limit); _packed4_matmul budgets
    tiles accordingly and falls back to the XLA dequant path when even a
    128-lane tile can't fit."""
    def fallback():
        from flowspec_tpu.ops.quant import NF4Tensor, dequantize
        wd = dequantize(NF4Tensor(q=q, scale=scale)).astype(x.dtype)
        return jnp.einsum("bti,io->bto", x, wd,
                          preferred_element_type=jnp.float32).astype(x.dtype)
    return _packed4_matmul(x, q, scale, _nf4_kernel, fallback)
