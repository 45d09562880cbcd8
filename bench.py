"""Headline benchmark: single-request tree-speculative decoding throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference FlowSpec reports 8.70 output tokens/s for
LLaMA2-Chat-7B (greedy, mean over 6 datasets) on its 5-Jetson / 150 Mbps
cluster (BASELINE.md; reference README.md:136-144). We measure the same
quantity — end-to-end output tokens/s of the speculative engine on a 7B-class
model — on one TPU chip. Weights are random (no checkpoints in this
environment), which makes draft acceptance worst-case (~1 token/round);
real EAGLE weights only raise tokens/s from here.

Env knobs: BENCH_MODEL=7b|1b|tiny (default 7b), BENCH_TOKENS (default 128),
BENCH_MODE=spec|ar (default spec).
"""

import json
import os
import time

import numpy as np


def main():
    model_kind = os.environ.get("BENCH_MODEL", "7b")
    n_tokens = int(os.environ.get("BENCH_TOKENS", "128"))
    mode = os.environ.get("BENCH_MODE", "spec")

    import jax
    import jax.numpy as jnp
    from flowspec_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig, TreeConfig,
    )
    from flowspec_tpu.draft.eagle import init_eagle_params
    from flowspec_tpu.models.llama import init_llama_params
    from flowspec_tpu.runtime.engine import SpecEngine

    if model_kind == "7b":
        mc = ModelConfig.llama_7b()
        max_seq = 1152
    elif model_kind == "1b":
        mc = ModelConfig(hidden_size=2048, intermediate_size=5504,
                         num_hidden_layers=16, num_attention_heads=16,
                         num_key_value_heads=16)
        max_seq = 1152
    else:
        mc = ModelConfig.tiny()
        max_seq = 512

    tc = TreeConfig()  # reference defaults: 80 tokens / top-10 / depth-6
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_new_tokens=n_tokens, max_seq_len=max_seq)

    key = jax.random.key(0)
    params = init_llama_params(key, mc)
    draft = init_eagle_params(jax.random.key(1), mc, embed=params.embed)
    eng = SpecEngine(params, draft, cfg)

    prompt = np.random.default_rng(0).integers(10, 1000, 64)

    gen = eng.generate if mode == "spec" else eng.generate_ar
    # warmup (compile)
    gen(prompt, max_new_tokens=4, eos_token_id=-1)

    t0 = time.perf_counter()
    out, stats = gen(prompt, max_new_tokens=n_tokens, eos_token_id=-1)
    dt = time.perf_counter() - t0
    toks = stats["new_tokens"]
    tps = toks / dt

    baseline = 8.70   # FlowSpec LLaMA2-7B greedy mean, BASELINE.md
    print(json.dumps({
        "metric": f"output_tokens_per_s_{model_kind}_{mode}_greedy",
        "value": round(tps, 3),
        "unit": "tokens/s",
        "vs_baseline": round(tps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
