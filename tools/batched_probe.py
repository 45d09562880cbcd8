"""Micro A/B: does the XLA int8-dequant einsum amortize weight reads when
the lhs carries a lane (batch) dim?  And what does per-lane dense attention
cost at B=4?

Motivated by tools/profile_batched.py: vverify(B=4)=38ms vs 13ms single —
the batched round reads ~3x the bytes the single-lane round does.
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
    import numpy as np

    B, T, H, O = 4, 96, 4096, 11008
    iters = 32
    k = jax.random.key(0)
    q = jax.random.randint(k, (H, O), -127, 128, jnp.int8)
    s = jnp.full((O,), 1e-2, jnp.float32)
    xb = jax.random.normal(k, (B, 1, T, H), jnp.bfloat16)

    def timed(name, fn, *args):
        loop = jax.jit(lambda a: jax.lax.fori_loop(
            0, iters, lambda i, c: fn(*((c,) + a[1:])), a[0]))
        out = loop(args)
        float(jnp.sum(out).astype(jnp.float32))
        t0 = time.perf_counter()
        out = loop(args)
        float(jnp.sum(out).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters * 1e3
        gbps = (H * O) / dt / 1e6
        print(f"{name:28s} {dt:8.3f} ms   {gbps:6.1f} GB/s(int8 read)",
              flush=True)

    def ein_batched(x, q, s):
        y = jnp.einsum("...i,io->...o", x, q.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        y = (y * s).astype(x.dtype)
        return x + jnp.sum(y, axis=-1, keepdims=True) * 1e-6

    def ein_flat(x, q, s):
        xf = x.reshape(-1, H)
        y = jnp.einsum("ti,io->to", xf, q.astype(xf.dtype),
                       preferred_element_type=jnp.float32)
        y = (y * s).astype(x.dtype)
        return x + jnp.sum(y).astype(x.dtype) * 1e-6

    timed("int8 einsum (4,1,96,H)", ein_batched, xb, q, s)
    timed("int8 einsum flat (384,H)", ein_flat, xb, q, s)
    timed("int8 einsum (1,1,96,H)", ein_batched, xb[:1], q, s)

    # per-lane dense attention at 512-row alloc, 32 q-heads, d=128
    S, NH, D = 512, 32, 128
    kk = jax.random.normal(k, (B, NH, S, D), jnp.bfloat16)
    vv = jax.random.normal(k, (B, NH, S, D), jnp.bfloat16)
    qq = jax.random.normal(k, (B, NH, T, D), jnp.bfloat16)

    def att(qx, kx, vx):
        sc = jnp.einsum("bhtd,bhsd->bhts", qx, kx,
                        preferred_element_type=jnp.float32)
        p = jax.nn.softmax(sc, axis=-1).astype(qx.dtype)
        o = jnp.einsum("bhts,bhsd->bhtd", p, vx)
        return qx + o * 1e-6

    timed("attention B=4 S=512 T=96", att, qq, kk, vv)
    timed("attention B=1 S=512 T=96", att, qq[:1], kk[:1], vv[:1])

    # 32-layer scan version of the batched einsum (the real model shape):
    L = 8
    qL = jax.random.randint(k, (L, H, O), -127, 128, jnp.int8)
    sL = jnp.full((L, O), 1e-2, jnp.float32)

    def scan_batched(x, qs, ss):
        def body(c, w):
            qw, sw = w
            y = jnp.einsum("...i,io->...o", c, qw.astype(c.dtype),
                           preferred_element_type=jnp.float32)
            return c + (jnp.sum(y * sw, axis=-1, keepdims=True) * 1e-6
                        ).astype(c.dtype), None
        out, _ = jax.lax.scan(body, x, (qs, ss))
        return out

    def timed2(name, fn, x, *w):
        loop = jax.jit(lambda a: jax.lax.fori_loop(
            0, iters, lambda i, c: fn(c, *a[1:]), a[0]))
        out = loop((x,) + w)
        float(jnp.sum(out).astype(jnp.float32))
        t0 = time.perf_counter()
        out = loop((x,) + w)
        float(jnp.sum(out).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters * 1e3
        gbps = (L * H * O) / dt / 1e6
        print(f"{name:28s} {dt:8.3f} ms   {gbps:6.1f} GB/s(int8 read)",
              flush=True)

    timed2(f"scan{L} int8 (4,1,96,H)", scan_batched, xb, qL, sL)
    timed2(f"scan{L} int8 (1,1,96,H)", scan_batched, xb[:1], qL, sL)
    xf = xb.reshape(1, 1, B * T, H)
    timed2(f"scan{L} int8 (1,1,384,H)", scan_batched, xf, qL, sL)


if __name__ == "__main__":
    main()
