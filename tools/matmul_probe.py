"""Micro-benchmark of decode-matmul dequant strategies on the TPU.

The round profile (PROFILE_7b_int8.md) shows verify and ar_step running at
~2x the int8 weight-read bound — the per-layer dequant matmuls are the
bottleneck. This times one full 7B layer-stack worth of weight matmuls
(scan over 32 layers, 7 weights each) for T-row activations under:

  xla_int8    einsum(x, q.astype(bf16)) * scale      (current default)
  pallas_int8 ops/quant_matmul.int8_matmul           (current alt)
  xla_bf16    plain bf16 einsum                       (run with PROBE_BF16=1;
               needs the int8 copy absent to fit HBM)

Usage: PROBE_T=1,81 python tools/matmul_probe.py
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
    bf16 = bool(os.environ.get("PROBE_BF16"))

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/flowspec_jax_cache"))
    import jax.numpy as jnp
    import numpy as np
    from flowspec_tpu.config import ModelConfig
    from flowspec_tpu.ops.quant import Int8Tensor
    from flowspec_tpu.ops.quant_matmul import int8_matmul

    mc = ModelConfig.llama_7b()
    h, i = mc.hidden_size, mc.intermediate_size
    L = mc.num_hidden_layers
    d = mc.head_dim_
    nq, nkv = mc.num_attention_heads, mc.num_key_value_heads
    shapes = [(h, nq * d), (h, nkv * d), (h, nkv * d), (nq * d, h),
              (h, i), (h, i), (i, h)]
    gb = sum(a * b for a, b in shapes) * L / 2**30
    print(f"weights: {gb:.2f} GB (int8) over {L} layers x {len(shapes)} mats")

    ks = jax.random.split(jax.random.key(0), len(shapes))
    if bf16:
        Ws = [jax.random.normal(k, (L, a, b), jnp.bfloat16) * 0.02
              for k, (a, b) in zip(ks, shapes)]
    else:
        Ws = [Int8Tensor(
            q=jax.random.randint(k, (L, a, b), -127, 128, jnp.int8),
            scale=jnp.full((L, b), 1e-4, jnp.float32))
            for k, (a, b) in zip(ks, shapes)]

    def stack_pass_xla(x, Ws):
        """One scan over layers doing all 7 matmuls, result folded into x."""
        def body(carry, ws):
            acc = carry
            outs = []
            for w in ws:
                if isinstance(w, Int8Tensor):
                    y = jnp.einsum("ti,io->to", acc[:, :w.q.shape[0]],
                                   w.q.astype(acc.dtype),
                                   preferred_element_type=jnp.float32)
                    y = (y * w.scale).astype(acc.dtype)
                else:
                    y = jnp.einsum("ti,io->to", acc[:, :w.shape[0]], w,
                                   preferred_element_type=jnp.float32
                                   ).astype(acc.dtype)
                outs.append(jnp.pad(
                    y, ((0, 0), (0, acc.shape[1] - y.shape[1]))))
            return acc * 0.999 + sum(outs) * 1e-6, None
        x2, _ = jax.lax.scan(body, x, Ws)
        return x2

    def stack_pass_pallas(x, Ws):
        def body(carry, ws):
            acc = carry
            outs = []
            for w in ws:
                y = int8_matmul(acc[None, :, :w.q.shape[0]], w.q, w.scale)[0]
                outs.append(jnp.pad(
                    y, ((0, 0), (0, acc.shape[1] - y.shape[1]))))
            return acc * 0.999 + sum(outs) * 1e-6, None
        x2, _ = jax.lax.scan(body, x, Ws)
        return x2

    # activations padded to the widest In (i) so slicing works layer-side
    for t in ts:
        x0 = jnp.ones((t, i), jnp.bfloat16) * 0.01
        variants = {}
        variants["xla"] = stack_pass_xla
        if not bf16:
            variants["pallas"] = stack_pass_pallas
        for name, fn in variants.items():
            loop = jax.jit(lambda x, Ws: jax.lax.fori_loop(
                0, iters, lambda k, xx: fn(xx, Ws), x))
            y = loop(x0, Ws)
            float(jnp.sum(y).astype(jnp.float32))
            t0 = time.perf_counter()
            y = loop(x0, Ws)
            float(jnp.sum(y).astype(jnp.float32))
            dt = (time.perf_counter() - t0) / iters * 1e3
            bw = gb * (2 if bf16 else 1) / (dt / 1e3)
            tag = "bf16" if bf16 else "int8"
            print(f"T={t:3d} {tag}-{name:7s} {dt:7.2f} ms/stack-pass "
                  f"({bw:5.0f} GB/s effective weight read)")


if __name__ == "__main__":
    main()
