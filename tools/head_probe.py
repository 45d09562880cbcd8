"""Micro-breakdown of the beam's head+topk chain (the dominant beam cost:
2.8ms/round at B=1, 8.1 at B=4 — tools/beam_ablate_probe.py).

Per level the chain is: int8 einsum (K,H)@(H,V)->f32, *scale,
approx_max_k(10), logsumexp. Floor is the 131MB weight read (~0.24ms).
Times each piece and some alternatives at T in {10, 40}.
"""

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

    H, V, K = 4096, 32000, 10
    iters = 48
    key = jax.random.key(0)
    q = jax.random.randint(key, (H, V), -127, 128, jnp.int8)
    s = jnp.full((V,), 1e-2, jnp.float32)

    def timed(name, fn, x, extra=()):
        loop = jax.jit(lambda c, w: jax.lax.fori_loop(
            0, iters, lambda i, c_: fn(c_, *w), c))
        out = loop(x, (q, s) + tuple(extra))
        float(jnp.sum(out).astype(jnp.float32))
        t0 = time.perf_counter()
        out = loop(x, (q, s) + tuple(extra))
        float(jnp.sum(out).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:34s} {dt:8.3f} ms", flush=True)
        return dt

    for T in (10, 40):
        print(f"--- T={T}")
        x = jax.random.normal(key, (T, H), jnp.bfloat16)
        lg = jax.random.normal(key, (T, V), jnp.float32)
        lgb = lg.astype(jnp.bfloat16)

        def mm_sum(c, q, s):
            y = jnp.einsum("th,hv->tv", c, q.astype(c.dtype),
                           preferred_element_type=jnp.float32) * s
            return c + (jnp.sum(y) * 1e-9).astype(c.dtype)
        timed("einsum+scale+sum", mm_sum, x)

        def mm_bf16_sum(c, q, s):
            y = jnp.einsum("th,hv->tv", c, q.astype(c.dtype),
                           preferred_element_type=jnp.bfloat16)
            return c + (jnp.sum(y) * 1e-9).astype(c.dtype)
        timed("einsum bf16out+sum", mm_bf16_sum, x)

        def amk_only(c, q, s):
            v_, t_ = jax.lax.approx_max_k(c, K, recall_target=1.0)
            return c + jnp.sum(v_) * 1e-9 + t_[0, 0] * 1e-9
        timed("approx_max_k f32 (T,V)", amk_only, lg)
        timed("approx_max_k bf16 (T,V)",
              lambda c, q, s: (c + (jnp.sum(jax.lax.approx_max_k(
                  c, K, recall_target=1.0)[0]) * 1e-9).astype(c.dtype)), lgb)

        def topk_only(c, q, s):
            v_, t_ = jax.lax.top_k(c, K)
            return c + jnp.sum(v_) * 1e-9 + t_[0, 0] * 1e-9
        timed("lax.top_k f32 (T,V)", topk_only, lg)

        def lse_only(c, q, s):
            return c + jnp.sum(jax.nn.logsumexp(c, axis=-1)) * 1e-9
        timed("logsumexp f32 (T,V)", lse_only, lg)

        def two_stage(c, q, s):
            ch = c.reshape(T, V // 128, 128)
            m1, i1 = jax.lax.top_k(ch, 2)                 # (T, 250, 2)
            v2, i2 = jax.lax.top_k(m1.reshape(T, -1), K)
            return c + jnp.sum(v2) * 1e-9 + i2[0, 0] * 1e-9
        timed("two_stage chunk-topk2 f32", two_stage, lg)

        def full_chain(c, q, s):
            y = jnp.einsum("th,hv->tv", c, q.astype(c.dtype),
                           preferred_element_type=jnp.float32) * s
            v_, t_ = jax.lax.approx_max_k(y, K, recall_target=1.0)
            lse = jax.nn.logsumexp(y, axis=-1)
            return c + (jnp.sum(v_ - lse[:, None]) * 1e-9
                        ).astype(c.dtype) + t_[0, 0].astype(c.dtype) * 1e-9
        timed("full chain (current)", full_chain, x)

        def full_chain_bf16(c, q, s):
            y = jnp.einsum("th,hv->tv", c, q.astype(c.dtype),
                           preferred_element_type=jnp.bfloat16)
            v_, t_ = jax.lax.approx_max_k(y, K, recall_target=1.0)
            m = jnp.max(y, axis=-1)
            lse = m.astype(jnp.float32) + jnp.log(jnp.sum(jnp.exp(
                (y - m[:, None]).astype(jnp.float32)), axis=-1))
            return c + (jnp.sum(v_.astype(jnp.float32) - lse[:, None])
                        * 1e-9).astype(c.dtype) + \
                t_[0, 0].astype(c.dtype) * 1e-9
        timed("full chain bf16 logits", full_chain_bf16, x)


if __name__ == "__main__":
    main()
