"""Is vmapped dynamic_update_slice with BATCHED start offsets (the beam's
per-lane KV append: write_start = per-lane ctx_end + level*K) the
non-amortizing cost in the batched beam?

Compares, on (B, 32, 512, 128) bf16 caches, writing 10 rows per step over a
6-step scan:
  dus_shared   vmapped DUS, all lanes share one (unbatched) offset
  dus_batched  vmapped DUS, per-lane offsets (batched -> scatter)
  masked       iota-mask where-rewrite of the full buffer (scatter-free)
Also times the attention gather read at per-lane offsets.
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

    NKV, S, D, K, LV = 32, 512, 128, 10, 6
    iters = 24
    key = jax.random.key(0)

    def timed(name, step, B, batched_offsets):
        cache = jnp.zeros((B, NKV, S, D), jnp.bfloat16)
        rows = jax.random.normal(key, (B, NKV, K, D), jnp.bfloat16)
        offs = (jnp.full((B,), 64, jnp.int32) +
                (jnp.arange(B, dtype=jnp.int32) if batched_offsets else 0))

        def scan6(c, r, o):
            def body(cc, l):
                return step(cc, r, o + l * K), None
            out, _ = jax.lax.scan(body, c, jnp.arange(LV, dtype=jnp.int32))
            return out

        def run(c, r, o):
            return jax.lax.fori_loop(
                0, iters,
                lambda i, c_: scan6(c_, r + c_[:, :, :K] * 1e-6, o), c)
        loop = jax.jit(run)
        out = loop(cache, rows, offs)
        float(jnp.sum(out[:, 0, :, 0]).astype(jnp.float32))
        t0 = time.perf_counter()
        out = loop(cache, rows, offs)
        float(jnp.sum(out[:, 0, :, 0]).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters / LV * 1e3
        print(f"{name:34s} {dt:8.3f} ms/level", flush=True)
        return dt

    def dus_step(c, r, o):
        # o: () if shared else (B,)
        if o.ndim == 0:
            return jax.vmap(
                lambda c1, r1: jax.lax.dynamic_update_slice(
                    c1, r1, (0, o, 0)))(c, r)
        return jax.vmap(
            lambda c1, r1, o1: jax.lax.dynamic_update_slice(
                c1, r1, (0, o1, 0)))(c, r, o)

    def masked_step(c, r, o):
        i = jnp.arange(S, dtype=jnp.int32)
        if o.ndim == 0:
            o = jnp.broadcast_to(o, (c.shape[0],))
        rel = i[None, :] - o[:, None]                       # (B, S)
        hit = (rel >= 0) & (rel < K)
        gath = jnp.take_along_axis(
            r, jnp.clip(rel, 0, K - 1)[:, None, :, None].astype(jnp.int32),
            axis=2)                                          # (B, NKV, S, D)
        return jnp.where(hit[:, None, :, None], gath, c)

    for B in (1, 4):
        timed(f"dus_shared   B={B}", dus_step, B, False)
        timed(f"dus_batched  B={B}", dus_step, B, True)
        timed(f"masked       B={B}", masked_step, B, True)


if __name__ == "__main__":
    main()
