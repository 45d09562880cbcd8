"""Micro-benchmark of 4-bit dequant strategies on the TPU.

The 7B int4 bench (16.5 tok/s at 13B but AR 51 vs int8's 80 at 7B) shows
the packed-nibble Pallas kernel is VPU-bound: ~3-5 vector ops per weight
over 6.8G weights is ~15ms/pass regardless of the halved HBM read. This
probes whether XLA's native int4 dtype (hardware-assisted unpack on TPU)
can decode at cast speed like its int8 path (555 GB/s):

  xla_int8     einsum(x, q.astype(bf16)) * per-out scale       (reference)
  xla_int4     jnp.int4 weights, astype(bf16) + blockwise scale
  xla_int4_pc  jnp.int4 weights, astype(bf16) + per-out-channel scale
               (isolates the cast cost from the blockwise reshape/mul)
  pallas_int4  ops/quant_matmul.int4_matmul on packed u8 nibbles

Usage: PROBE_T=1,81 python tools/int4_probe.py
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main():
    ts = [int(x) for x in os.environ.get("PROBE_T", "1,81").split(",")]
    iters = int(os.environ.get("PROBE_ITERS", "16"))

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/flowspec_jax_cache"))
    import jax.numpy as jnp
    from flowspec_tpu.config import ModelConfig
    from flowspec_tpu.ops.quant import Int8Tensor, Int4Tensor, NF4_BLOCK
    from flowspec_tpu.ops.quant_matmul import int4_matmul

    mc = ModelConfig.llama_7b()
    h, i = mc.hidden_size, mc.intermediate_size
    L = mc.num_hidden_layers
    d = mc.head_dim_
    nq, nkv = mc.num_attention_heads, mc.num_key_value_heads
    shapes = [(h, nq * d), (h, nkv * d), (h, nkv * d), (nq * d, h),
              (h, i), (h, i), (i, h)]
    gb4 = sum(a * b for a, b in shapes) * L / 2 / 2**30
    print(f"weights: {gb4:.2f} GB (packed int4) over {L} layers "
          f"x {len(shapes)} mats")

    ks = jax.random.split(jax.random.key(0), len(shapes))

    def make(kind):
        out = []
        for k, (a, b) in zip(ks, shapes):
            if kind == "int8":
                out.append(Int8Tensor(
                    q=jax.random.randint(k, (L, a, b), -127, 128, jnp.int8),
                    scale=jnp.full((L, b), 1e-4, jnp.float32)))
            elif kind == "pallas4":
                out.append(Int4Tensor(
                    q=jax.random.randint(k, (L, a // 2, b), 0, 256,
                                         jnp.uint8),
                    scale=jnp.full((L, a // NF4_BLOCK, b), 1e-4,
                                   jnp.float32)))
            elif kind == "bitcast4":
                # packed bytes stored int8; consumer bitcasts to int4
                # in-jit (int4 arrays can't cross a dispatch boundary on
                # this backend — relayout recursion bug)
                out.append(dict(
                    qb=jax.random.randint(k, (L, a // 2, b), -128, 128,
                                          jnp.int8),
                    scale=jnp.full((L, a // NF4_BLOCK, b), 1e-4,
                                   jnp.float32)))
            elif kind == "native4":
                out.append(dict(
                    q=jax.random.randint(k, (L, a, b), -7, 8,
                                         jnp.int8).astype(jnp.int4),
                    scale=jnp.full((L, a // NF4_BLOCK, b), 1e-4,
                                   jnp.float32)))
            elif kind == "native4_pc":
                out.append(dict(
                    q=jax.random.randint(k, (L, a, b), -7, 8,
                                         jnp.int8).astype(jnp.int4),
                    scale=jnp.full((L, b), 1e-4, jnp.float32)))
        return out

    def mm(acc, w):
        if isinstance(w, Int8Tensor):
            y = jnp.einsum("ti,io->to", acc[:, :w.q.shape[0]],
                           w.q.astype(acc.dtype),
                           preferred_element_type=jnp.float32)
            return (y * w.scale).astype(acc.dtype)
        if isinstance(w, Int4Tensor):
            return int4_matmul(acc[None, :, :w.q.shape[0] * 2],
                               w.q, w.scale)[0]
        if "qb" in w:
            qb, s = w["qb"], w["scale"]
            half, b = qb.shape
            a = half * 2
            w4 = jax.lax.bitcast_convert_type(qb, jnp.int4)  # (In/2, Out, 2)
            wd = w4.astype(acc.dtype)
            blocks = s.shape[0]
            wd = (wd.reshape(blocks, half // blocks, b, 2) *
                  s[:, None, :, None].astype(acc.dtype)
                  ).reshape(half, b, 2)
            x2 = acc[:, :a].reshape(acc.shape[0], half, 2)
            y = jax.lax.dot_general(
                x2, wd, (((1, 2), (0, 2)), ((), ())),
                preferred_element_type=jnp.float32)
            return y.astype(acc.dtype)
        q, s = w["q"], w["scale"]
        a, b = q.shape
        wd = q.astype(acc.dtype)
        if s.ndim == 2 and s.shape[0] != 1 and s.shape[0] != b:
            # blockwise: (In, Out) * scale (In/64, Out) broadcast over block
            wd = (wd.reshape(s.shape[0], -1, b) *
                  s[:, None, :].astype(acc.dtype)).reshape(a, b)
            y = jnp.einsum("ti,io->to", acc[:, :a], wd,
                           preferred_element_type=jnp.float32)
            return y.astype(acc.dtype)
        y = jnp.einsum("ti,io->to", acc[:, :a], wd,
                       preferred_element_type=jnp.float32)
        return (y * s).astype(acc.dtype)

    def stack_pass(x, Ws):
        def body(carry, ws):
            acc = carry
            outs = []
            for w in ws:
                y = mm(acc, w)
                outs.append(jnp.pad(
                    y, ((0, 0), (0, acc.shape[1] - y.shape[1]))))
            return acc * 0.999 + sum(outs) * 1e-6, None
        x2, _ = jax.lax.scan(body, x, Ws)
        return x2

    for kind in ("xla_int8", "pallas_int4", "xla_bitcast4", "xla_int4",
                 "xla_int4_pc"):
        src = {"xla_int8": "int8", "pallas_int4": "pallas4",
               "xla_bitcast4": "bitcast4",
               "xla_int4": "native4", "xla_int4_pc": "native4_pc"}[kind]
        try:
            Ws = make(src)
        except Exception as e:
            print(f"{kind}: construction failed: {e}")
            continue
        gb = gb4 * (2 if src == "int8" else 1)
        for t in ts:
            x0 = jnp.ones((t, i), jnp.bfloat16) * 0.01
            try:
                loop = jax.jit(lambda x, Ws: jax.lax.fori_loop(
                    0, iters, lambda k, xx: stack_pass(xx, Ws), x))
                y = loop(x0, Ws)
                float(jnp.sum(y).astype(jnp.float32))
                t0 = time.perf_counter()
                y = loop(x0, Ws)
                float(jnp.sum(y).astype(jnp.float32))
                dt = (time.perf_counter() - t0) / iters * 1e3
                bw = gb / (dt / 1e3)
                print(f"T={t:3d} {kind:12s} {dt:7.2f} ms/stack-pass "
                      f"({bw:5.0f} GB/s effective HBM weight read)")
            except Exception as e:
                print(f"T={t:3d} {kind:12s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}")
        del Ws


if __name__ == "__main__":
    main()
