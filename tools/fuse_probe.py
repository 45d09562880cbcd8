"""A/B: separate q/k/v + gate/up int8 matmuls vs fused [qkv] and [gate|up]
matmuls, at beam shapes (T=10 per lane, B in {1,4}) and AR shapes (T=1),
over a 6-step sequential scan (the beam's level structure).

Hypothesis (tools/beam_batched_probe.py): the batched beam's +1.2ms/level
over single-lane is per-einsum-call overhead (9 calls/level); fusing cuts
calls to 6.
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

    H, I, V = 4096, 11008, 32000
    D, NQ, NKV = 128, 32, 32
    iters = 24
    LV = 6
    k = jax.random.key(0)

    def rint8(key, shape):
        return jax.random.randint(key, shape, -127, 128, jnp.int8)

    ks = jax.random.split(k, 12)
    wq, wk, wv = (rint8(ks[0], (H, NQ * D)), rint8(ks[1], (NKV * D, H)).T,
                  rint8(ks[2], (NKV * D, H)).T)
    wq, wk, wv = wq, jnp.asarray(wk), jnp.asarray(wv)
    wo = rint8(ks[3], (NQ * D, H))
    wg, wu = rint8(ks[4], (H, I)), rint8(ks[5], (H, I))
    wd = rint8(ks[6], (I, H))
    wfc = rint8(ks[7], (2 * H, H))
    whead = rint8(ks[8], (H, V))
    sq = jnp.full((NQ * D,), 1e-2, jnp.float32)
    si = jnp.full((I,), 1e-2, jnp.float32)
    sh = jnp.full((H,), 1e-2, jnp.float32)
    sv = jnp.full((V,), 1e-2, jnp.float32)

    wqkv = jnp.concatenate([wq, wk, wv], axis=1)          # (H, 3*NQ*D)
    sqkv = jnp.concatenate([sq, sq, sq])
    wgu = jnp.concatenate([wg, wu], axis=1)               # (H, 2I)
    sgu = jnp.concatenate([si, si])

    def mm(x, w, s):
        y = jnp.einsum("...i,io->...o", x, w.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        return (y * s).astype(x.dtype)

    def level_sep(x, w):
        (wq, wk, wv, wo, wg, wu, wd, wfc, whead, wqkv, wgu) = w
        x = mm(jnp.concatenate([x, x], axis=-1), wfc, sh)
        q = mm(x, wq, sq); kk = mm(x, wk, sq); vv = mm(x, wv, sq)
        a = q + kk + vv                      # stand-in for attention
        x = x + mm(a, wo, sh)
        g = mm(x, wg, si); u = mm(x, wu, si)
        x = x + mm(jax.nn.silu(g) * u, wd, sh)
        lg = mm(x, whead, sv)
        return x + jnp.sum(lg, axis=-1, keepdims=True) * 1e-6

    def level_fused(x, w):
        (wq, wk, wv, wo, wg, wu, wd, wfc, whead, wqkv, wgu) = w
        x = mm(jnp.concatenate([x, x], axis=-1), wfc, sh)
        qkv = mm(x, wqkv, sqkv)
        q, kk, vv = jnp.split(qkv, 3, axis=-1)
        a = q + kk + vv
        x = x + mm(a, wo, sh)
        gu = mm(x, wgu, sgu)
        g, u = jnp.split(gu, 2, axis=-1)
        x = x + mm(jax.nn.silu(g) * u, wd, sh)
        lg = mm(x, whead, sv)
        return x + jnp.sum(lg, axis=-1, keepdims=True) * 1e-6

    W = (wq, wk, wv, wo, wg, wu, wd, wfc, whead, wqkv, wgu)

    def timed(name, fn, x):
        # weights as explicit jit args: closed-over arrays embed as HLO
        # constants and stall the tunnel upload
        def scan6(c, w):
            def body(cc, _):
                return fn(cc, w), None
            out, _ = jax.lax.scan(body, c, None, length=LV)
            return out
        loop = jax.jit(lambda c, w: jax.lax.fori_loop(
            0, iters, lambda i, c_: scan6(c_, w) * 0.5 + c_ * 0.5, c))
        out = loop(x, W)
        float(jnp.sum(out).astype(jnp.float32))
        t0 = time.perf_counter()
        out = loop(x, W)
        float(jnp.sum(out).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters / LV * 1e3
        print(f"{name:30s} {dt:8.3f} ms/level", flush=True)
        return dt

    for B, T in ((1, 10), (4, 10), (1, 1), (4, 96)):
        x = jax.random.normal(k, (B, T, H), jnp.bfloat16)
        a = timed(f"sep   B={B} T={T}", level_sep, x)
        b = timed(f"fused B={B} T={T}", level_fused, x)
        print(f"  -> fused saves {a - b:+.3f} ms/level", flush=True)


if __name__ == "__main__":
    main()
