"""ops/head_topk: the fused beam-head scoring primitive.

The Pallas kernel must compute exactly top-k of log_softmax(x @ head) —
the beam's per-level scoring (ref eagle/cnets.py:764-819). CPU tests run
the kernel in pallas interpret mode (FLOWSPEC_HEAD_KERNEL=interpret) and
pin it against an independent numpy composition; the custom_vmap rule
(lane flattening) is exercised through jax.vmap.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowspec_tpu.ops.head_topk import (
    _cv, _head_topk_xla, _pick_bn, head_topk)
from flowspec_tpu.ops.quant import Int8Tensor, quantize_int8


def _np_reference(x, q, s, k):
    """Independent composition: f32 logits -> log_softmax -> top-k."""
    logits = (np.asarray(x, np.float32) @ (np.asarray(q, np.float32)
                                           * np.asarray(s, np.float32)))
    lse = np.log(np.exp(logits - logits.max(-1, keepdims=True))
                 .sum(-1, keepdims=True)) + logits.max(-1, keepdims=True)
    logp = logits - lse
    idx = np.argsort(-logp, axis=-1, kind="stable")[..., :k]
    return np.take_along_axis(logp, idx, axis=-1), idx


def _mk(t, h, v, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((t, h)), jnp.float32)
    q = jnp.asarray(rng.integers(-127, 128, (h, v)), jnp.int8)
    s = jnp.asarray(rng.uniform(0.5, 1.5, (v,)), jnp.float32) * 1e-2
    return x, q, s


def test_kernel_interpret_matches_reference():
    t, h, v, k = 5, 128, 2048, 4
    x, q, s = _mk(t, h, v)
    lp, tok = _cv(k, True)(x, q, s)
    ref_lp, ref_idx = _np_reference(x, q, s, k)
    np.testing.assert_allclose(np.asarray(lp), ref_lp, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(tok), ref_idx)


def test_kernel_multi_column_group_and_row_padding():
    # 7B vocab geometry: one column group at small T, two at batched T
    # (T=40 -> bt=48, the B=4 beam width); T=40 also exercises row padding
    t, h, v, k = 40, 128, 32000, 10
    assert _pick_bn(v, 16) == 16000
    assert _pick_bn(v, 48) == 6400
    x, q, s = _mk(t, h, v, seed=1)
    lp, tok = _cv(k, True)(x, q, s)
    ref_lp, ref_idx = _np_reference(x, q, s, k)
    np.testing.assert_allclose(np.asarray(lp), ref_lp, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(tok), ref_idx)


def test_custom_vmap_flattens_lanes():
    t, h, v, k = 3, 128, 2048, 5
    b = 4
    rng = np.random.default_rng(2)
    xb = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
    _, q, s = _mk(t, h, v, seed=2)
    f = _cv(k, True)
    lp_v, tok_v = jax.vmap(lambda x: f(x, q, s))(xb)
    for i in range(b):
        lp_i, tok_i = f(xb[i], q, s)
        np.testing.assert_allclose(np.asarray(lp_v[i]), np.asarray(lp_i),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(tok_v[i]),
                                      np.asarray(tok_i))


def test_fallback_matches_reference():
    t, h, v, k = 6, 64, 512, 4
    x, q, s = _mk(t, h, v, seed=3)
    head = Int8Tensor(q=q, scale=s)
    lp, tok = _head_topk_xla(x, head, k)
    ref_lp, ref_idx = _np_reference(x, q, s, k)
    np.testing.assert_allclose(np.asarray(lp), ref_lp, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(tok), ref_idx)


def test_head_topk_bf16_head_path():
    # plain (unquantized) heads route through the fallback
    t, h, v, k = 4, 64, 256, 3
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((t, h)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((h, v)), jnp.float32) * 0.05
    lp, tok = head_topk(x, w, k)
    logits = np.asarray(x, np.float64) @ np.asarray(w, np.float64)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    idx = np.argsort(-logp, axis=-1, kind="stable")[..., :k]
    np.testing.assert_array_equal(np.asarray(tok), idx)
    np.testing.assert_allclose(np.asarray(lp),
                               np.take_along_axis(logp, idx, -1),
                               rtol=1e-4, atol=1e-4)


def test_head_topk_1d_input_shape():
    h, v, k = 64, 512, 4
    x, q, s = _mk(1, h, v, seed=5)
    head = Int8Tensor(q=q, scale=s)
    lp, tok = head_topk(x[0], head, k)
    assert lp.shape == (k,) and tok.shape == (k,)
    lp2, tok2 = head_topk(x, head, k)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(tok2[0]))


def test_int8_quantized_head_int_path_matches_quantized_math():
    # end-to-end: quantize a real bf16 head, kernel (interpret) vs fallback
    t, h, v, k = 5, 128, 2048, 6
    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.standard_normal((h, v)), jnp.float32) * 0.03
    head = quantize_int8(w)
    x = jnp.asarray(rng.standard_normal((t, h)), jnp.float32)
    lp_k, tok_k = _cv(k, True)(x, head.q, head.scale)
    lp_f, tok_f = _head_topk_xla(x, head, k)
    np.testing.assert_array_equal(np.asarray(tok_k), np.asarray(tok_f))
    np.testing.assert_allclose(np.asarray(lp_k), np.asarray(lp_f),
                               rtol=1e-4, atol=1e-4)
