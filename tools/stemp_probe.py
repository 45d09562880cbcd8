"""Score-temperature sweep at 7B on the chip: accept/round + tok/s per tau.

TreeConfig.score_temperature reshapes the draft tree (see config.py): at
tau=1 the random base's flat softmax packs the whole node budget into
levels 0-1 (accept caps at ~3); sharper scoring should deepen the tree
toward the teacher-forced agreement ceiling (~0.86 -> accept ~4.5-5).
Run: python tools/stemp_probe.py   (holds the TPU)
"""

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import numpy as np

TAUS = [float(x) for x in os.environ.get(
    "STEMP_TAUS", "1,0.5,0.3,0.2,0.1").split(",")]
DEPTHS = [int(x) for x in os.environ.get("STEMP_DEPTHS", "6,8").split(",")]


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/flowspec_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from bench import build_params
    from flowspec_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig, TreeConfig)
    from flowspec_tpu.runtime.engine import SpecEngine

    mc = ModelConfig.llama_7b()
    n_tokens = 256
    max_seq = 64 + n_tokens + 24
    ckpt = os.path.join(_ROOT, "checkpoints", "draft_7b_thin_fp16.npz")
    params, _ = build_params(mc, "int8", "trained", ckpt)
    rng0 = np.random.default_rng(0)
    prompt = rng0.integers(10, 1000, 64)
    from flowspec_tpu.draft.eagle import load_thin_draft, \
        quantize_eagle_params
    draft = quantize_eagle_params(load_thin_draft(ckpt, params.embed),
                                  "int8")

    for depth in DEPTHS:
        for tau in TAUS:
            tc = TreeConfig(node_cap=96, leaf_cap=96,
                            depth_cap=max(16, depth + 2), depth=depth,
                            score_temperature=tau)
            cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                               max_new_tokens=n_tokens, max_seq_len=max_seq)
            eng = SpecEngine(params, draft, cfg)
            eng.generate_fused(prompt, max_new_tokens=n_tokens,
                               eos_token_id=-1)    # compile+warm
            t0 = time.perf_counter()
            out, st = eng.generate_fused(prompt, max_new_tokens=n_tokens,
                                         eos_token_id=-1)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "depth": depth, "tau": tau,
                "tok_s": round(st["new_tokens"] / dt, 2),
                "accept_per_round": round(st["accept_per_round"], 3),
            }), flush=True)


if __name__ == "__main__":
    main()
