"""Probe the bench-scale random 7B base's greedy dynamics on the TPU.

Question the round-3 distillation plan rides on: are the random base's
greedy continuations *learnable* by a small draft? Random-weight
transformers usually fall into short attractor cycles under greedy
decoding; if the bench base does too, a distilled draft can earn high
acceptance (VERDICT r2 #1). This prints the AR continuation for a few
bench-distribution prompts and summarizes repetition structure.

Run: python tools/rollout_probe.py   (holds the TPU)
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import numpy as np


def cycle_structure(seq):
    """Smallest period p such that the tail of seq repeats with period p,
    plus how much of the tail it covers."""
    n = len(seq)
    for p in range(1, n // 2 + 1):
        # longest suffix consistent with period p
        cov = 0
        for i in range(n - 1 - p, -1, -1):
            if seq[i] == seq[i + p]:
                cov += 1
            else:
                break
        if cov >= max(2 * p, n // 3):
            return p, cov + p
    return None, 0


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/flowspec_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from flowspec_tpu.config import EngineConfig, ModelConfig, SamplingConfig, TreeConfig
    from flowspec_tpu.runtime.engine import SpecEngine
    sys.path.insert(0, _ROOT)
    from bench import build_params

    mc = ModelConfig.llama_7b()
    n_tokens = 256
    max_seq = 64 + n_tokens + 24
    tc = TreeConfig(node_cap=96, leaf_cap=96, depth_cap=16)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_new_tokens=n_tokens, max_seq_len=max_seq)
    print("building int8 7B params...", flush=True)
    t0 = time.time()
    params, draft = build_params(mc, "int8")
    print(f"built in {time.time()-t0:.1f}s", flush=True)

    eng = SpecEngine(params, draft, cfg)
    rng0 = np.random.default_rng(0)
    for it in range(4):
        prompt = rng0.integers(10, 1000, 64)
        t0 = time.time()
        out, stats = eng.generate_ar_fused(prompt, max_new_tokens=n_tokens,
                                           eos_token_id=-1)
        dt = time.time() - t0
        gen = [int(x) for x in out[64:]]
        uniq = len(set(gen))
        p, cov = cycle_structure(gen)
        print(f"prompt {it}: {len(gen)} toks in {dt:.1f}s, "
              f"{uniq} unique, cycle period={p} covering last {cov}",
              flush=True)
        print("  first 48:", gen[:48], flush=True)
        print("  last  48:", gen[-48:], flush=True)


if __name__ == "__main__":
    main()
