"""bf16 7B layout experiment: AOT layout negotiation without OOM.

Round-1 finding (ROADMAP #2): at 7B bf16 XLA's layout assignment
materializes ~3GB of transposed wq/wk/wv copies for the wide tree-verify
matmul and OOMs the 16GB chip; `with_layout_constraint` inside the decode
while_loop did not stick.

Round-2 probe findings:
- AOT-compiling `_spec_round` with Format(Layout.AUTO) on the weight inputs
  reveals XLA *wants* wq/wk/wv stored transposed: negotiated major-to-minor
  (0, 2, 1) on the stacked (L, In, Out) leaves.
- Relaying out already-built default-layout params OOMs at any granularity:
  params (13.5GB) + state + one 1GB transposed copy exceeds the ~14GB
  usable HBM.

Hence: negotiate formats from SHAPE AVALS ONLY (engine.negotiate_round_
formats — no weight buffers exist yet), generate every param leaf directly
INTO its negotiated format (jit out_shardings=Format), and build the
engine with formats pinned (SpecEngine(formats=...)) so no call-site
relayout copies appear in prefill or the fused loops.

Usage: BENCH_MODEL=7b python tools/layout_probe.py
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main():
    model_kind = os.environ.get("BENCH_MODEL", "7b")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/flowspec_jax_cache"))
    import jax.numpy as jnp
    import numpy as np
    import functools

    from flowspec_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig, TreeConfig,
    )
    from flowspec_tpu.draft.eagle import init_eagle_params
    from flowspec_tpu.models.llama import init_llama_params
    from flowspec_tpu.runtime import engine as E

    if model_kind == "7b":
        mc = ModelConfig.llama_7b(); max_seq = 768
    elif model_kind == "13b":
        mc = ModelConfig.llama_13b(); max_seq = 384
    else:
        mc = ModelConfig.tiny(); max_seq = 512
    tc = TreeConfig(node_cap=96, leaf_cap=96, depth_cap=16)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_new_tokens=64, max_seq_len=max_seq)
    dev = jax.devices()[0]

    def mem():
        try:
            s = dev.memory_stats()
            return {k: round(s[k] / 2**30, 2) for k in
                    ("bytes_in_use", "peak_bytes_in_use") if k in s}
        except Exception:
            return {}

    t0 = time.time()
    p_fmt, d_fmt = E.negotiate_round_formats(cfg)
    print("negotiate (AOT compile from avals) s:", round(time.time() - t0, 1))

    # The Format objects out of compiled.input_formats carry explicit tiling;
    # out_shardings silently ignores those. Rebuild minimal Formats with just
    # the major_to_minor permutation.
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding
    sds = SingleDeviceSharding(dev)

    def minimal(fmt_tree):
        return jax.tree_util.tree_map(
            lambda f: Format(Layout(
                major_to_minor=tuple(f.layout.major_to_minor)), sds),
            fmt_tree)
    p_fmt = minimal(p_fmt)
    d_fmt = minimal(d_fmt)

    p_aval = jax.eval_shape(functools.partial(init_llama_params, cfg=mc),
                            jax.random.key(0))
    names = [jax.tree_util.keystr(k) for k, _ in
             jax.tree_util.tree_flatten_with_path(p_aval)[0]]
    for name, leaf, fmtl in zip(names, jax.tree_util.tree_leaves(p_aval),
                                jax.tree_util.tree_leaves(p_fmt)):
        major = tuple(fmtl.layout.major_to_minor)
        if major != tuple(range(len(leaf.shape))):
            print(f"  negotiated layout {name}: {major} shape {leaf.shape}")

    # generate every leaf directly INTO its negotiated format. The seed is
    # baked into the HLO as a constant: identical-HLO leaves (wq/wk/wv)
    # otherwise hit the persistent compilation cache, whose deserialized
    # executables LOSE the out_shardings layout (observed: wq fresh-compiled
    # lands (0,2,1), wk/wv cache-hit land default).
    def gen_into(aval, fmt, seed):
        def g():
            k = jax.random.fold_in(jax.random.key(seed), salt)
            if jnp.issubdtype(aval.dtype, jnp.integer):
                return jnp.zeros(aval.shape, aval.dtype)
            return (jax.random.normal(k, aval.shape, jnp.float32) *
                    (aval.shape[-2] if len(aval.shape) >= 2 else
                     aval.shape[-1]) ** -0.5).astype(aval.dtype)
        y = jax.jit(g, out_shardings=fmt)()
        y.block_until_ready()
        got = tuple(y.format.layout.major_to_minor)
        want = tuple(fmt.layout.major_to_minor)
        assert got == want, (got, want, aval.shape)
        return y

    t0 = time.time()
    # Persistent-cache hits silently DROP out_shardings layouts (observed:
    # fresh compiles land (0,2,1), cache hits land default; flipping
    # jax_enable_compilation_cache mid-process does not stop lookups). Bake
    # a per-process salt into each leaf's HLO so no cross-run hit is
    # possible, and verify every built layout below.
    salt = int(time.time_ns()) % (2 ** 31 - 1)

    def build(aval_tree, fmt_tree, base_seed):
        leaves, treedef = jax.tree_util.tree_flatten(aval_tree)
        fmts = jax.tree_util.tree_leaves(fmt_tree)
        return jax.tree_util.tree_unflatten(treedef, [
            gen_into(a, f, base_seed + i)
            for i, (a, f) in enumerate(zip(leaves, fmts))])

    d_aval = jax.eval_shape(lambda k: init_eagle_params(k, mc),
                            jax.random.key(1))
    params = build(p_aval, p_fmt, 10)
    draft = build(d_aval, d_fmt, 100)
    jax.config.update("jax_enable_compilation_cache", True)
    print(f"params+draft built into formats in {time.time()-t0:.1f}s", mem())
    for name, leaf, fmtl in zip(names, jax.tree_util.tree_leaves(params),
                                jax.tree_util.tree_leaves(p_fmt)):
        got = tuple(leaf.format.layout.major_to_minor)
        want = tuple(fmtl.layout.major_to_minor)
        if got != want:
            print(f"  MISMATCH {name}: built {got} wanted {want}")

    eng = E.SpecEngine(params, draft, cfg, formats=(p_fmt, d_fmt))
    state = eng.init_state(0)
    state = eng.prefill(state, np.random.default_rng(0).integers(10, 1000, 64))
    print("after prefill:", mem())

    # spec only: the AR (T=1) program prefers DEFAULT weight layouts and
    # copies the transposed wq/wk/wv back (3GB of HLO temps -> OOM at 7B
    # bf16). The negotiated formats are a tree-verify-path feature; bf16 AR
    # runs fine on default layouts (it never had the OOM).
    prompt = np.random.default_rng(1).integers(10, 1000, 64)
    out, stats = eng.generate_fused(prompt, max_new_tokens=64,
                                    eos_token_id=-1)
    t0 = time.time()
    out, stats = eng.generate_fused(prompt, max_new_tokens=64,
                                    eos_token_id=-1)
    dt = time.time() - t0
    print(f"spec fused: {stats['new_tokens']/dt:.1f} tok/s", mem())


if __name__ == "__main__":
    main()
