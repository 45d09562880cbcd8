"""Staged diagnosis of the packed-4-bit Pallas matmul pipeline on the TPU.

The r2 probes (tools/int4_probe.py) measured every 4-bit decode formulation
at ~89-166 GB/s effective packed-weight read while XLA's fused int8 path
reads 537-555 GB/s and even the Pallas *int8* kernel reaches only 379 GB/s.
VPU arithmetic says the nibble decode (~5-8 vector ops/packed byte) should
cost ~2-4ms over a 7B weight stack (>= 700 GB/s effective) — so the
bottleneck must be the kernel pipeline, not the decode math. This probe
isolates the stages:

  ceiling   packed u8 tile -> ONE convert -> two dots (wrong numbers, just
            the DMA+convert+MXU pipeline at packed byte volume)
  nibbles   + shift/and hi/lo extraction (i32 detour, as the real kernel)
  sub8      + the two -8 subtractions
  blockwise + the (half, bn) bf16 scale multiply (== production int4 kernel)
  pc_out    per-output-channel scale applied to the OUTPUT accumulator with
            an -8*rowsum(x) correction — the leanest productizable decode
            (5 ops/packed byte, no weight-side multiplies)

each at grid shapes (n) [whole-In strips, production today] and (n, k)
[K-split with VMEM accumulation], plus an XLA fusion check:

  xla_pc    split-K packed u8 decoded with plain jnp ops, per-out-channel
            output scale — does XLA fuse shift/and/convert into the matmul
            the way it fuses the int8 convert?

Usage:  PROBE_T=81 PROBE_ITERS=24 python tools/int4_kernel_probe.py
        PROBE_VARIANTS=ceiling_n,blockwise_n,pc_out_nk ... to subset.
"""

import functools
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main():
    ts = [int(x) for x in os.environ.get("PROBE_T", "81").split(",")]
    iters = int(os.environ.get("PROBE_ITERS", "24"))
    only = [v for v in os.environ.get("PROBE_VARIANTS", "").split(",") if v]

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/flowspec_jax_cache"))
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from flowspec_tpu.config import ModelConfig

    mc = ModelConfig.llama_7b()
    h, i = mc.hidden_size, mc.intermediate_size
    L = mc.num_hidden_layers
    d = mc.head_dim_
    nq, nkv = mc.num_attention_heads, mc.num_key_value_heads
    shapes = [(h, nq * d), (h, nkv * d), (h, nkv * d), (nq * d, h),
              (h, i), (h, i), (i, h)]
    gb4 = sum(a * b for a, b in shapes) * L / 2 / 2**30
    print(f"packed int4 stack: {gb4:.2f} GB over {L} layers x "
          f"{len(shapes)} mats", flush=True)

    BLOCK = 64

    # ---- kernel bodies ----------------------------------------------------
    def body(xe_ref, xo_ref, q_ref, s_ref, o_ref, acc_ref, *, stage,
             n_in, k_steps):
        ki = pl.program_id(1) if k_steps > 1 else 0
        packed = q_ref[:].astype(jnp.int32)            # (kb, bn)
        if stage == "ceiling":
            hi = packed.astype(jnp.bfloat16)
            lo = hi
        else:
            hi = (packed >> 4)
            lo = (packed & 0xF)
            if stage in ("sub8", "blockwise"):
                hi = hi - 8
                lo = lo - 8
            hi = hi.astype(jnp.bfloat16)
            lo = lo.astype(jnp.bfloat16)
        if stage == "blockwise":
            s = s_ref[:].astype(jnp.bfloat16)          # (kb//32, bn)
            blocks, bn_ = s.shape
            kb = packed.shape[0]
            s_half = jnp.broadcast_to(
                s[:, None, :], (blocks, BLOCK // 2, bn_)).reshape(kb, bn_)
            hi = hi * s_half
            lo = lo * s_half
        acc = jnp.dot(xe_ref[:], hi, preferred_element_type=jnp.float32)
        acc += jnp.dot(xo_ref[:], lo, preferred_element_type=jnp.float32)
        if k_steps > 1:
            @pl.when(ki == 0)
            def _init():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            acc_ref[:] += acc
            @pl.when(ki == k_steps - 1)
            def _fin():
                fin = acc_ref[:]
                if stage == "pc_out":
                    fin = fin * s_ref[0:1, :].astype(jnp.float32)
                o_ref[:] = fin.astype(o_ref.dtype)
        else:
            if stage == "pc_out":
                acc = acc * s_ref[0:1, :].astype(jnp.float32)
            o_ref[:] = acc.astype(o_ref.dtype)

    def make_mm(stage, split_k):
        def mm(x2, q, s_blk, s_pc):
            bt, n_in = x2.shape
            half, n_out = q.shape
            x3 = x2.reshape(bt, half, 2)
            xe, xo = x3[:, :, 0], x3[:, :, 1]
            bn = 512
            while n_out % bn:
                bn //= 2
            if split_k:
                kb = 1024                              # packed rows / step
                while half % kb:
                    kb //= 2
                k_steps = half // kb
            else:
                kb, k_steps = half, 1
            if stage == "blockwise":
                s_in = s_blk                           # (In//64, n_out)
                s_spec = pl.BlockSpec((kb // (BLOCK // 2), bn),
                                      lambda n, k=0: (k, n),
                                      memory_space=pltpu.VMEM)
            else:
                s_in = s_pc.reshape(1, n_out)
                s_spec = pl.BlockSpec((1, bn), lambda n, k=0: (0, n),
                                      memory_space=pltpu.VMEM)
            grid = (n_out // bn, k_steps) if split_k else (n_out // bn,)
            if split_k:
                xspec = lambda: pl.BlockSpec((bt, kb), lambda n, k: (0, k),
                                             memory_space=pltpu.VMEM)
                qspec = pl.BlockSpec((kb, bn), lambda n, k: (k, n),
                                     memory_space=pltpu.VMEM)
                ospec = pl.BlockSpec((bt, bn), lambda n, k: (0, n),
                                     memory_space=pltpu.VMEM)
            else:
                xspec = lambda: pl.BlockSpec((bt, kb), lambda n: (0, 0),
                                             memory_space=pltpu.VMEM)
                qspec = pl.BlockSpec((kb, bn), lambda n: (0, n),
                                     memory_space=pltpu.VMEM)
                ospec = pl.BlockSpec((bt, bn), lambda n: (0, n),
                                     memory_space=pltpu.VMEM)
            out = pl.pallas_call(
                functools.partial(body, stage=stage, n_in=n_in,
                                  k_steps=k_steps),
                grid=grid,
                in_specs=[xspec(), xspec(), qspec, s_spec],
                out_specs=ospec,
                out_shape=jax.ShapeDtypeStruct((bt, n_out), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")[:len(grid)]
                    if split_k else ("arbitrary",),
                ),
                cost_estimate=pl.CostEstimate(
                    flops=2 * bt * n_in * n_out,
                    bytes_accessed=half * n_out + bt * n_in * 2
                    + bt * n_out * 2,
                    transcendentals=0),
            )(xe, xo, q, s_in)
            if stage == "pc_out":
                corr = 8.0 * jnp.sum(x2, axis=1, keepdims=True)
                out = out - (corr * s_pc[None, :]).astype(out.dtype)
            return out
        return mm

    def xla_pc(x2, q, s_blk, s_pc):
        bt, n_in = x2.shape
        half, n_out = q.shape
        x3 = x2.reshape(bt, half, 2)
        xe, xo = x3[:, :, 0], x3[:, :, 1]
        qi = q.astype(jnp.int32)
        hi = (qi >> 4).astype(jnp.bfloat16)
        lo = (qi & 0xF).astype(jnp.bfloat16)
        y = (jnp.dot(xe, hi, preferred_element_type=jnp.float32)
             + jnp.dot(xo, lo, preferred_element_type=jnp.float32))
        corr = 8.0 * jnp.sum(x2, axis=1, keepdims=True)
        return ((y - corr) * s_pc[None, :]).astype(jnp.bfloat16)

    # ---- kfull: K-split tiles spanning the FULL output width -------------
    # A (kb, n_out) u8 tile is one CONTIGUOUS memory block (kb complete
    # rows), so its DMA bursts are maximal; the (kb, bn<=512) tiles of the
    # n-grid family read 512-byte strided segments per row — the suspected
    # cause of the 204 GB/s pipeline ceiling (u8 512B bursts) vs the bf16
    # matmul's 624 (1KB bursts).
    def kfull_body(xe_ref, xo_ref, q_ref, s_ref, o_ref, acc_ref, *, stage,
                   k_steps):
        ki = pl.program_id(0)
        packed = q_ref[:].astype(jnp.int32)            # (kb, n_out)
        if stage == "ceiling":
            hi = packed.astype(jnp.bfloat16)
            lo = hi
        elif stage == "blockwise":
            # production Int4Tensor semantics: (nibble - 8) * scale[block]
            # — byte row r holds global rows 2r/2r+1, both in block r//32
            kb_, n_out_ = packed.shape
            s = s_ref[:].astype(jnp.bfloat16)          # (kb//32, n_out)
            s_half = jnp.broadcast_to(
                s[:, None, :], (kb_ // 32, 32, n_out_)).reshape(kb_, n_out_)
            hi = ((packed >> 4) - 8).astype(jnp.bfloat16) * s_half
            lo = ((packed & 0xF) - 8).astype(jnp.bfloat16) * s_half
        else:
            hi = (packed >> 4).astype(jnp.bfloat16)
            lo = (packed & 0xF).astype(jnp.bfloat16)
        acc = jnp.dot(xe_ref[:], hi, preferred_element_type=jnp.float32)
        acc += jnp.dot(xo_ref[:], lo, preferred_element_type=jnp.float32)

        @pl.when(ki == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        acc_ref[:] += acc

        @pl.when(ki == k_steps - 1)
        def _fin():
            fin = acc_ref[:]
            if stage == "pc_out":
                fin = fin * s_ref[0:1, :].astype(jnp.float32)
            o_ref[:] = fin.astype(o_ref.dtype)

    def make_kfull(stage):
        def mm(x2, q, s_blk, s_pc):
            bt, n_in = x2.shape
            half, n_out = q.shape
            x3 = x2.reshape(bt, half, 2)
            xe, xo = x3[:, :, 0], x3[:, :, 1]
            # kb sized so double-buffered tiles + f32 scratch + resident x
            # stay under ~13MB of VMEM
            budget = 13 * 2**20 - bt * n_out * 4 - bt * n_in * 2
            cap = max(128, budget // (2 * n_out) // 2)
            # largest divisor of half that is a multiple of 128 (the x
            # block's minor dim must be lane-aligned) and <= cap; half can
            # be 5504 = 128*43, so only 128-multiples that divide it work
            kb = max((d for d in range(128, min(cap, half) + 1, 128)
                      if half % d == 0), default=half)
            k_steps = half // kb
            if stage == "blockwise":
                s_arg = s_blk
                s_spec = pl.BlockSpec((kb // 32, n_out), lambda k: (k, 0),
                                      memory_space=pltpu.VMEM)
            else:
                s_arg = s_pc.reshape(1, n_out)
                s_spec = pl.BlockSpec((1, n_out), lambda k: (0, 0),
                                      memory_space=pltpu.VMEM)
            out = pl.pallas_call(
                functools.partial(kfull_body, stage=stage, k_steps=k_steps),
                grid=(k_steps,),
                in_specs=[
                    pl.BlockSpec((bt, kb), lambda k: (0, k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bt, kb), lambda k: (0, k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((kb, n_out), lambda k: (k, 0),
                                 memory_space=pltpu.VMEM),
                    s_spec,
                ],
                out_specs=pl.BlockSpec((bt, n_out), lambda k: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((bt, n_out), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((bt, n_out), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
                cost_estimate=pl.CostEstimate(
                    flops=2 * bt * n_in * n_out,
                    bytes_accessed=half * n_out + bt * n_in * 2
                    + bt * n_out * 2,
                    transcendentals=0),
            )(xe, xo, q, s_arg)
            if stage == "pc_out":
                corr = 8.0 * jnp.sum(x2, axis=1, keepdims=True)
                out = out - (corr * s_pc[None, :]).astype(out.dtype)
            return out
        return mm

    # ---- production int4 path (kfull kernel + fallbacks) ------------------
    def prod_int4(x2, q, s_blk, s_pc):
        from flowspec_tpu.ops.quant_matmul import int4_matmul
        return int4_matmul(x2[None], q, s_blk)[0]

    # ---- int8 kfull: does the contiguous-tile layout also beat XLA's 555
    # GB/s fused int8 path? (the n-grid int8 kernel measured 379)
    def int8_kfull_body(x_ref, q_ref, o_ref, acc_ref, *, k_steps):
        ki = pl.program_id(0)
        w = q_ref[:].astype(jnp.bfloat16)              # (kb, n_out)
        acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

        @pl.when(ki == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        acc_ref[:] += acc

        @pl.when(ki == k_steps - 1)
        def _fin():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    def int8_kfull(x2, q8, s_pc):
        bt, n_in = x2.shape
        _, n_out = q8.shape
        budget = 13 * 2**20 - bt * n_out * 6 - bt * n_in * 2
        cap = max(128, budget // (2 * n_out))
        kb = max((d for d in range(128, min(cap, n_in) + 1, 128)
                  if n_in % d == 0), default=n_in)
        k_steps = n_in // kb
        out = pl.pallas_call(
            functools.partial(int8_kfull_body, k_steps=k_steps),
            grid=(k_steps,),
            in_specs=[pl.BlockSpec((bt, kb), lambda k: (0, k),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((kb, n_out), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bt, n_out), lambda k: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bt, n_out), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bt, n_out), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=2 * bt * n_in * n_out,
                bytes_accessed=n_in * n_out + bt * n_in * 2
                + bt * n_out * 2,
                transcendentals=0),
        )(x2, q8)
        return out * s_pc[None, :].astype(jnp.bfloat16)

    def xla_int8(x2, q8, s_pc):
        y = jnp.dot(x2, q8.astype(x2.dtype),
                    preferred_element_type=jnp.float32)
        return (y * s_pc[None, :]).astype(jnp.bfloat16)

    variants = {}
    for stage in ("ceiling", "nibbles", "sub8", "blockwise", "pc_out"):
        variants[f"{stage}_n"] = make_mm(stage, split_k=False)
        variants[f"{stage}_nk"] = make_mm(stage, split_k=True)
    for stage in ("ceiling", "nibbles", "blockwise", "pc_out"):
        variants[f"{stage}_kfull"] = make_kfull(stage)
    variants["xla_pc"] = xla_pc
    variants["prod_int4"] = prod_int4
    variants["int8_kfull"] = ("int8", int8_kfull)
    variants["xla_int8"] = ("int8", xla_int8)

    ks = jax.random.split(jax.random.key(0), len(shapes))
    Ws, W8s = [], []
    for k, (a, b) in zip(ks, shapes):
        Ws.append(dict(
            q=jax.random.randint(k, (L, a // 2, b), 0, 256, jnp.uint8),
            s_blk=jnp.full((L, a // BLOCK, b), 1e-4, jnp.float32),
            s_pc=jnp.full((L, b), 1e-4, jnp.float32)))
        W8s.append(dict(
            q8=jax.random.randint(k, (L, a, b), -127, 128, jnp.int8),
            s_pc=jnp.full((L, b), 1e-4, jnp.float32)))

    def stack_pass(x, Ws, mm, int8_mode):
        def lbody(carry, ws):
            acc = carry
            outs = []
            for w in ws:
                if int8_mode:
                    n_in = w["q8"].shape[-2]
                    y = mm(acc[:, :n_in], w["q8"], w["s_pc"])
                else:
                    n_in = w["q"].shape[-2] * 2
                    y = mm(acc[:, :n_in], w["q"], w["s_blk"], w["s_pc"])
                outs.append(jnp.pad(
                    y, ((0, 0), (0, acc.shape[1] - y.shape[1]))))
            return acc * 0.999 + sum(outs).astype(acc.dtype) * 1e-6, None
        # group the 7 mats into a python loop over a scanned layer axis
        x2, _ = jax.lax.scan(lbody, x, Ws)
        return x2

    for name, mm in variants.items():
        if only and name not in only:
            continue
        int8_mode = isinstance(mm, tuple)
        if int8_mode:
            mm = mm[1]
        ws_used = W8s if int8_mode else Ws
        gb_used = gb4 * (2 if int8_mode else 1)
        for t in ts:
            bt = -(-t // 16) * 16
            x0 = jnp.ones((bt, i), jnp.bfloat16) * 0.01
            try:
                loop = jax.jit(
                    lambda x, Ws, mm=mm, m8=int8_mode: jax.lax.fori_loop(
                        0, iters, lambda k, xx: stack_pass(xx, Ws, mm, m8),
                        x))
                y = loop(x0, ws_used)
                float(jnp.sum(y).astype(jnp.float32))
                t0 = time.perf_counter()
                y = loop(x0, ws_used)
                float(jnp.sum(y).astype(jnp.float32))
                dt = (time.perf_counter() - t0) / iters * 1e3
                bw = gb_used / (dt / 1e3)
                print(f"T={t:3d} {name:14s} {dt:7.2f} ms/stack-pass "
                      f"{bw:6.1f} GB/s effective", flush=True)
            except Exception as e:
                print(f"T={t:3d} {name:14s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
