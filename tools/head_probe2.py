"""Head-chain alternatives A/B (follow-up to tools/head_probe.py):
XLA int8 einsum (current, ~1.0ms at T=10) vs the Pallas int8 kernel vs a
plain bf16 head (= params.lm_head, no dequant, no extra copy)."""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/flowspec_jax_cache")
    import jax.numpy as jnp
    from flowspec_tpu.ops.quant_matmul import int8_matmul

    H, V, K = 4096, 32000, 10
    iters = 48
    key = jax.random.key(0)
    q8 = jax.random.randint(key, (H, V), -127, 128, jnp.int8)
    s8 = jnp.full((V,), 1e-2, jnp.float32)
    wb = jax.random.normal(key, (H, V), jnp.bfloat16) * 0.02

    def timed(name, fn, x, w):
        loop = jax.jit(lambda c, ws: jax.lax.fori_loop(
            0, iters, lambda i, c_: fn(c_, *ws), c))
        out = loop(x, w)
        float(jnp.sum(out).astype(jnp.float32))
        t0 = time.perf_counter()
        out = loop(x, w)
        float(jnp.sum(out).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:34s} {dt:8.3f} ms", flush=True)
        return dt

    def chain(y, c):
        v_, t_ = jax.lax.approx_max_k(y, K, recall_target=1.0)
        lse = jax.nn.logsumexp(y.astype(jnp.float32), axis=-1)
        return c + (jnp.sum(v_.astype(jnp.float32) - lse[:, None]) * 1e-9
                    ).astype(c.dtype) + t_[0, 0].astype(c.dtype) * 1e-9

    for T in (10, 40):
        print(f"--- T={T}")
        x = jax.random.normal(key, (T, H), jnp.bfloat16)

        def pallas_sum(c, q, s):
            y = int8_matmul(c[None], q, s)[0]
            return c + (jnp.sum(y) * 1e-9).astype(c.dtype)
        timed("pallas int8 + sum", pallas_sum, x, (q8, s8))

        def pallas_chain(c, q, s):
            y = int8_matmul(c[None], q, s)[0].astype(jnp.float32)
            return chain(y, c)
        timed("pallas int8 + amk + lse", pallas_chain, x, (q8, s8))

        def bf16_sum(c, w):
            y = jnp.einsum("th,hv->tv", c, w,
                           preferred_element_type=jnp.float32)
            return c + (jnp.sum(y) * 1e-9).astype(c.dtype)
        timed("bf16 einsum + sum", bf16_sum, x, (wb,))

        def bf16_chain(c, w):
            y = jnp.einsum("th,hv->tv", c, w,
                           preferred_element_type=jnp.float32)
            return chain(y, c)
        timed("bf16 einsum + amk + lse", bf16_chain, x, (wb,))

        def xla_chain(c, q, s):
            y = jnp.einsum("th,hv->tv", c, q.astype(c.dtype),
                           preferred_element_type=jnp.float32) * s
            return chain(y, c)
        timed("xla int8 + amk + lse (cur)", xla_chain, x, (q8, s8))


if __name__ == "__main__":
    main()
