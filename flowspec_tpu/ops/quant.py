"""Weight-only quantization containers + reference dequant paths.

Replaces the reference's bitsandbytes usage (`BitsAndBytesConfig` built in
config/run_config.py:69-75, threaded through HF from_pretrained in
stage_ea_model.py:170-172): int8 per-output-channel absmax, and NF4 blockwise
(block 64 along the contraction dim) with the bitsandbytes NF4 codebook.

`qmatmul` is the single entry point the model layer calls; it dispatches on
weight type and (on TPU) onto the fused Pallas dequant-matmul kernels in
ops/quant_matmul.py; elsewhere it uses an XLA dequant-then-matmul that is
bit-identical to the kernel's math.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# bitsandbytes NF4 code values (functional.py `create_normal_map` output),
# the 16 quantiles of a standard normal scaled to [-1, 1].
NF4_CODE = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0], dtype=np.float32)

NF4_BLOCK = 64


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Int8Tensor:
    """w ~= q * scale[..., None, :] — per-output-channel absmax.

    q (..., In, Out) int8; scale (..., Out) float32.
    """
    q: jax.Array
    scale: jax.Array

    @property
    def shape(self):
        return self.q.shape

    @property
    def in_features(self):
        return self.q.shape[-2]

    @property
    def out_features(self):
        return self.q.shape[-1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NF4Tensor:
    """w ~= code[q] * scale[block] — blockwise absmax over NF4_BLOCK rows of
    the contraction dim, stored PACKED: two 4-bit codes per byte along In
    (byte i of a column = code(row 2i) << 4 | code(row 2i+1)). Packing is
    what makes nf4 a real memory format on TPU — 13B fits a 16GB chip at
    ~6.3GB of packed weights where the unpacked layout OOMed.

    q (..., In // 2, Out) uint8; scale (..., In // 64, Out) float32.
    """
    q: jax.Array
    scale: jax.Array

    @property
    def shape(self):
        sh = self.q.shape
        return sh[:-2] + (sh[-2] * 2, sh[-1])

    @property
    def in_features(self):
        return self.q.shape[-2] * 2

    @property
    def out_features(self):
        return self.q.shape[-1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Int4Tensor:
    """w ~= (q - 8) * scale[block] — blockwise LINEAR 4-bit, packed two
    codes per byte along In like NF4Tensor.

    TPU-native companion to NF4 (which has no reference-side equivalent to
    cite beyond bnb's 4-bit family): NF4's 16-entry codebook needs a
    15-select decode tree per nibble on the VPU (~25 vector ops/weight —
    measured VPU-bound at 13B, ~3.5x slower than the HBM roofline), while a
    linear code decodes in ~5 ops (nibble - 8, cast, scale), keeping the
    matmul HBM-bound. Levels are -7..7 (absmax/7); -8 is unused so the
    grid is symmetric.

    q (..., In//2, Out) uint8; scale (..., In//64, Out) float32.
    """
    q: jax.Array
    scale: jax.Array

    @property
    def shape(self):
        sh = self.q.shape
        return sh[:-2] + (sh[-2] * 2, sh[-1])

    @property
    def in_features(self):
        return self.q.shape[-2] * 2

    @property
    def out_features(self):
        return self.q.shape[-1]


def quantize_int8(w: jax.Array) -> Int8Tensor:
    """(..., In, Out) -> per-out-channel symmetric int8."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)     # (..., 1, Out)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return Int8Tensor(q=q, scale=scale.squeeze(-2))


def quantize_nf4(w: jax.Array, block: int = NF4_BLOCK) -> NF4Tensor:
    """(..., In, Out) -> blockwise NF4 (nearest codebook entry), packed
    2 codes/byte along In."""
    *lead, n_in, n_out = w.shape
    assert n_in % block == 0, (n_in, block)
    wf = w.astype(jnp.float32).reshape(*lead, n_in // block, block, n_out)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12)                # (..., blocks, 1, Out)
    norm = wf / scale
    # nearest codebook entry WITHOUT broadcasting norm against all 16 codes
    # (that materializes a 16x f32 tensor — 3.2GB for a 13B draft matrix):
    # NF4_CODE is sorted, so nearest == searchsorted on the midpoints;
    # side='left' sends exact midpoints down, matching argmin's first-hit.
    code = jnp.asarray(NF4_CODE)
    mids = (code[1:] + code[:-1]) * 0.5
    idx = jnp.searchsorted(mids, norm, side="left").astype(jnp.uint8)
    idx = idx.reshape(*lead, n_in, n_out)
    return NF4Tensor(q=pack_nf4(idx), scale=scale.squeeze(-2))


def quantize_int4(w: jax.Array, block: int = NF4_BLOCK) -> Int4Tensor:
    """(..., In, Out) -> blockwise linear int4 (levels -7..7, absmax/7),
    packed 2 codes/byte along In."""
    *lead, n_in, n_out = w.shape
    assert n_in % block == 0, (n_in, block)
    wf = w.astype(jnp.float32).reshape(*lead, n_in // block, block, n_out)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int32) + 8
    idx = q.reshape(*lead, n_in, n_out).astype(jnp.uint8)
    return Int4Tensor(q=pack_nf4(idx), scale=scale.squeeze(-2))


def pack_nf4(idx: jax.Array) -> jax.Array:
    """(..., In, Out) uint8 codes 0..15 -> (..., In//2, Out) packed bytes."""
    *lead, n_in, n_out = idx.shape
    pairs = idx.reshape(*lead, n_in // 2, 2, n_out)
    return ((pairs[..., 0, :] << 4) | pairs[..., 1, :]).astype(jnp.uint8)


def unpack_nf4(q: jax.Array) -> jax.Array:
    """(..., In//2, Out) packed bytes -> (..., In, Out) uint8 codes."""
    *lead, half, n_out = q.shape
    hi = (q >> 4).astype(jnp.uint8)
    lo = (q & 0xF).astype(jnp.uint8)
    return jnp.stack([hi, lo], axis=-2).reshape(*lead, half * 2, n_out)


def dequantize(w) -> jax.Array:
    """Reference dequant (f32) — ground truth for the fused kernels."""
    if isinstance(w, Int8Tensor):
        return w.q.astype(jnp.float32) * w.scale[..., None, :]
    if isinstance(w, NF4Tensor):
        idx = unpack_nf4(w.q)
        *lead, n_in, n_out = idx.shape
        blocks = w.scale.shape[-2]
        code = jnp.asarray(NF4_CODE)
        vals = code[idx.astype(jnp.int32)]
        vals = vals.reshape(*lead, blocks, n_in // blocks, n_out)
        return (vals * w.scale[..., None, :]).reshape(*lead, n_in, n_out)
    if isinstance(w, Int4Tensor):
        idx = unpack_nf4(w.q)
        *lead, n_in, n_out = idx.shape
        blocks = w.scale.shape[-2]
        vals = idx.astype(jnp.float32) - 8.0
        vals = vals.reshape(*lead, blocks, n_in // blocks, n_out)
        return (vals * w.scale[..., None, :]).reshape(*lead, n_in, n_out)
    return jnp.asarray(w, jnp.float32)


_USE_PALLAS = {}


def _use_pallas(kind: str) -> bool:
    """Per-kind defaults from hardware A/B (7B spec bench, v5e):
    - int8: XLA's fused dequant-matmul wins (34.9 vs 26.5 tok/s) — the int8
      weights stay int8 in HBM and cast in-register, so the kernel adds
      nothing. Default OFF.
    - nf4: XLA must materialize a bf16 dequant copy per matmul (7.9 tok/s);
      the fused kernel decodes in VMEM (13.8 tok/s). Default ON (on TPU).
    - int4: same packed-4-bit memory layout as nf4 but a linear code that
      decodes in ~5 VPU ops instead of NF4's 15-select tree, so the fused
      kernel stays HBM-bound (13B spec: 16.5 tok/s vs nf4's 9.0). Default
      ON (on TPU).
    FLOWSPEC_PALLAS=1 forces all on, FLOWSPEC_NO_PALLAS=1 all off."""
    if kind not in _USE_PALLAS:
        import os
        if os.environ.get("FLOWSPEC_NO_PALLAS"):
            on = False
        elif os.environ.get("FLOWSPEC_PALLAS"):
            on = True
        else:
            on = kind in ("nf4", "int4")
        try:
            on = on and jax.default_backend() not in ("cpu",)
        except Exception:
            on = False
        _USE_PALLAS[kind] = on
    return _USE_PALLAS[kind]


def qmatmul(x: jax.Array, w) -> jax.Array:
    """x (..., In) @ w (In, Out) for plain or quantized weights.

    Used inside lax.scan over stacked layers, so `w` leaves may carry a
    leading layer axis already sliced away by the scan.
    """
    if isinstance(w, Int8Tensor):
        if _use_pallas("int8") and x.ndim == 3:
            from flowspec_tpu.ops.quant_matmul import int8_matmul
            return int8_matmul(x, w.q, w.scale)
        y = jnp.einsum("...i,io->...o", x, w.q.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        return (y * w.scale).astype(x.dtype)
    if isinstance(w, NF4Tensor):
        if _use_pallas("nf4") and x.ndim == 3:
            from flowspec_tpu.ops.quant_matmul import nf4_matmul
            return nf4_matmul(x, w.q, w.scale)
        wd = dequantize(w).astype(x.dtype)
        return jnp.einsum("...i,io->...o", x, wd,
                          preferred_element_type=jnp.float32).astype(x.dtype)
    if isinstance(w, Int4Tensor):
        if _use_pallas("int4") and x.ndim == 3:
            from flowspec_tpu.ops.quant_matmul import int4_matmul
            return int4_matmul(x, w.q, w.scale)
        wd = dequantize(w).astype(x.dtype)
        return jnp.einsum("...i,io->...o", x, wd,
                          preferred_element_type=jnp.float32).astype(x.dtype)
    return x @ w
