"""Tree-shape sweep ON THE TRAINED STRUCT BASE, greedy and T=1.

Why (r3 verdict #7): every committed tree sweep ran on the random bench
base, whose degenerate greedy dynamics picked d8/tau0.2 (acceptance
saturates at the tree budget) and whose flat softmax pins T=1 acceptance
at ~1.0 — neither transfers to a base with real dynamics. This sweeps
(depth x score_temperature x total_tokens) x temperature {0, 1} on the
~0.5B base trained by tools/train_struct_base.py and ships the stochastic
default bench.py/bench_suite use for struct rows.

Ref anchor: eval/eval_params.py:196-205 (the reference's tree-shape grid,
run per temperature by its outer loop run_pipe_eval.py:191).

Env: STRUCT_BASE/STRUCT_DRAFT npz paths (default /tmp/struct_*_big.npz),
SWEEP_OUT (default SWEEP_r05_struct.jsonl), SWEEP_TOKENS (default 128),
SWEEP_PROMPTS (default 3). Runs in ONE process; uses the host round loop
so each grid point compiles only the small per-round program.
Run: python tools/struct_sweep.py     (holds the TPU ~15-25 min)
"""

import dataclasses
import itertools
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import numpy as np

DEPTHS = tuple(int(x) for x in os.environ.get(
    "SWEEP_DEPTHS", "4,6,8").split(","))
STEMPS = tuple(float(x) for x in os.environ.get(
    "SWEEP_STEMPS", "0.3,0.6,1.0").split(","))
TOTALS = tuple(int(x) for x in os.environ.get(
    "SWEEP_TOTALS", "48,80").split(","))
TEMPS = tuple(float(x) for x in os.environ.get(
    "SWEEP_TEMPS", "0,1").split(","))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/flowspec_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from bench import build_struct_params
    from flowspec_tpu.config import EngineConfig, SamplingConfig, TreeConfig
    from flowspec_tpu.eval.synth import gen_struct_corpus
    from flowspec_tpu.runtime.engine import SpecEngine
    from tools.train_struct_base import SCALES

    out_path = os.environ.get("SWEEP_OUT",
                              os.path.join(_ROOT, "SWEEP_r05_struct.jsonl"))
    n_tok = int(os.environ.get("SWEEP_TOKENS", "128"))
    n_prompts = int(os.environ.get("SWEEP_PROMPTS", "3"))
    s = SCALES[os.environ.get("STRUCT_SCALE", "big")]
    mc, params, draft = build_struct_params()
    prompt_len = s["prompt_len"]
    prompts = gen_struct_corpus(
        n_prompts, max(prompt_len + 1, s["copy_dist"] + 2), vocab=s["vocab"],
        seed=2, n_classes=s["n_classes"],
        copy_dist=s["copy_dist"])[:, :prompt_len]

    rows = []
    for temp, depth, stemp, total in itertools.product(
            TEMPS, DEPTHS, STEMPS, TOTALS):
        tc = TreeConfig(top_k=10, depth=depth, total_tokens=total,
                        node_cap=total + 1, leaf_cap=total + 1,
                        depth_cap=depth + 2, score_temperature=stemp)
        cfg = EngineConfig(model=mc, tree=tc,
                           sampling=SamplingConfig(temperature=temp),
                           max_new_tokens=n_tok,
                           max_seq_len=prompt_len + n_tok + depth + 8,
                           prefill_chunk=32)
        eng = SpecEngine(params, draft, cfg)
        accs, tpss = [], []
        for i in range(n_prompts):
            t0 = time.perf_counter()
            out, st = eng.generate(prompts[i], max_new_tokens=n_tok,
                                   eos_token_id=-1, seed=17 + i)
            dt = time.perf_counter() - t0
            accs.append(st["accept_per_round"])
            if i > 0:       # prompt 0 pays the per-round compile
                tpss.append(st["new_tokens"] / dt)
        row = dict(temperature=temp, depth=depth, score_temp=stemp,
                   total_tokens=total,
                   accept_per_round=round(float(np.mean(accs)), 3),
                   tok_s=round(float(np.mean(tpss)), 2))
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    for temp in TEMPS:
        best = max((r for r in rows if r["temperature"] == temp),
                   key=lambda r: r["tok_s"])
        print(f"BEST T={temp:g}: {json.dumps(best)}")


if __name__ == "__main__":
    main()
