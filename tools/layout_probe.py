"""bf16 7B layout experiment: can AOT layout negotiation (or pre-transposed
weight storage) suppress XLA's transposed wq/wk/wv copies?

Round-1 finding (ROADMAP #2): at 7B bf16 XLA's layout assignment
materializes ~3GB of transposed attention-weight copies for the wide
tree-verify matmul and OOMs the 16GB chip; `with_layout_constraint` inside
the decode while_loop did not stick.

This probes the principled fix: AOT-compile `_spec_round` with
Format(Layout.AUTO) on the weight inputs, read back the negotiated input
formats, `device_put` the params into them, and execute. Reports per-leaf
layouts that differ from the default and the device memory stats after a
few rounds.

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
    import dataclasses
    from jax.experimental.layout import Format, Layout

    import bench as benchmod
    from flowspec_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig, TreeConfig,
    )
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
    params, draft = benchmod.build_params(mc, "none")
    eng = E.SpecEngine(params, draft, cfg)
    dev = jax.devices()[0]

    def mem():
        try:
            s = dev.memory_stats()
            return {k: round(s[k] / 2**30, 2) for k in
                    ("bytes_in_use", "peak_bytes_in_use") if k in s}
        except Exception:
            return {}

    print("after param init:", mem())

    state = eng.init_state(0)
    state = eng.prefill(state, np.random.default_rng(0).integers(10, 1000, 64))
    print("after prefill:", mem())

    fn = functools.partial(E._spec_round, cfg=eng.cfg.model,
                           tree_cfg=eng.cfg.tree, sampling=eng.cfg.sampling)
    auto = jax.tree_util.tree_map(lambda _: Format(Layout.AUTO),
                                  (state, params, draft))
    jitted = jax.jit(fn, in_shardings=auto)
    t0 = time.time()
    lowered = jitted.lower(state, params, draft)
    compiled = lowered.compile()
    print("AOT compile s:", round(time.time() - t0, 1))

    in_fmts = compiled.input_formats[0]
    st_fmt, p_fmt, d_fmt = in_fmts

    # which param leaves got a non-default layout?
    flat_p, treedef = jax.tree_util.tree_flatten(p_fmt)
    names = [str(k) for k, _ in
             jax.tree_util.tree_flatten_with_path(params)[0]]
    for name, (leaf, fmt) in zip(
            names, zip(jax.tree_util.tree_leaves(params), flat_p)):
        try:
            major = fmt.layout.major_to_minor
        except Exception:
            major = fmt
        default = tuple(range(len(leaf.shape)))
        if tuple(major) != default:
            print(f"  negotiated layout {name}: {major} shape {leaf.shape}")

    params2 = jax.device_put(params, p_fmt)
    draft2 = jax.device_put(draft, d_fmt)
    state2 = jax.device_put(state, st_fmt)
    del params, draft, state
    print("after relayout:", mem())

    st, res = compiled(state2, params2, draft2)
    n = int(res.n_accepted)
    print("round 1 ok, n_accepted:", n, mem())
    t0 = time.time()
    for _ in range(8):
        st, res = compiled(st, params2, draft2)
        int(res.n_accepted)
    dt = (time.time() - t0) / 8
    print(f"per-round (host-dispatch incl.): {dt*1e3:.1f} ms", mem())


if __name__ == "__main__":
    main()
