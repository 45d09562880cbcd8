"""Probe: is the random base's greedy stream width-dependent (bf16 ties)?

train_bench_draft.py's eval found spec-vs-AR streams diverging even at
acceptance 1.0. Hypothesis: the random base's top-2 logits are often
within bf16 rounding of each other, and the verify pass (wide query, big
matmul tiles) rounds differently than the 1-row AR step, flipping argmax
on near-ties — a property of RANDOM weights (near-degenerate logits), not
of the spec algebra (exact-equality tests pass in f32 on CPU, and real
checkpoints have wide top-1 margins).

Method: AR-generate on the chip, then teacher-force the SAME stream in
one wide prefill pass and compare per-position argmax vs the token the
AR step actually chose; report the top-2 logit gap at each mismatch.

Run: python tools/tie_probe.py   (holds the TPU)
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/flowspec_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from bench import build_params
    from flowspec_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig, TreeConfig)
    from flowspec_tpu.models import model_forward
    from flowspec_tpu.models.bias import prefill_bias
    from flowspec_tpu.models.kv_cache import init_kv_cache
    from flowspec_tpu.models.llama import (
        embed_tokens, final_hidden, lm_head_logits)
    from flowspec_tpu.runtime.engine import SpecEngine

    mc = ModelConfig.llama_7b()
    n_tokens = 128
    max_seq = 64 + 256 + 24     # match bench/trainer shapes (cache hits)
    tc = TreeConfig(node_cap=96, leaf_cap=96, depth_cap=16)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_new_tokens=256, max_seq_len=max_seq)
    print("building int8 base...", flush=True)
    params, draft = build_params(mc, "int8")
    eng = SpecEngine(params, draft, cfg)
    dt = jnp.dtype(mc.dtype)
    seq_len = 64 + n_tokens
    kv_rows = -(-seq_len // 256) * 256

    @jax.jit
    def teacher_logits(params, seq):
        cache = init_kv_cache(mc.num_hidden_layers, 1,
                              mc.num_key_value_heads, kv_rows,
                              mc.head_dim_, dt)
        hidden = embed_tokens(params, seq[None])
        bias = prefill_bias(jnp.zeros((), jnp.int32), seq_len, kv_rows)
        pos = jnp.arange(seq_len, dtype=jnp.int32)
        out, _ = model_forward(params, cache, hidden, pos, bias,
                               jnp.zeros((), jnp.int32), mc)
        return lm_head_logits(params, final_hidden(params, out, mc))[0]

    tot_pos = 0
    tot_mis = 0
    gaps_at_mis = []
    min_gap_ok = []
    for i in range(4):
        prompt = np.random.default_rng(500 + i).integers(10, 1000, 64)
        out, _ = eng.generate_ar_fused(prompt, max_new_tokens=n_tokens,
                                       eos_token_id=-1)
        seq = np.asarray(out[:seq_len], np.int32)
        lg = np.asarray(teacher_logits(params, jnp.asarray(seq)),
                        np.float32)
        # position j's logits predict token j+1
        pred = lg[63:seq_len - 1]
        chosen = seq[64:]
        am = pred.argmax(axis=-1)
        top2 = np.partition(pred, -2, axis=-1)[:, -2:]
        gap = top2[:, 1] - top2[:, 0]          # top1 - top2
        mis = am != chosen
        tot_pos += len(chosen)
        tot_mis += int(mis.sum())
        gaps_at_mis += gap[mis].tolist()
        min_gap_ok += [float(gap[~mis].min())] if (~mis).any() else []
        print(f"prompt {i}: {int(mis.sum())}/{len(chosen)} argmax flips "
              f"(wide pass vs AR step); median top-2 gap at flips = "
              f"{np.median(gap[mis]) if mis.any() else float('nan'):.4f}, "
              f"overall median gap {np.median(gap):.4f}", flush=True)
    print(f"TOTAL: {tot_mis}/{tot_pos} width-dependent argmax flips; "
          f"gap-at-flip median "
          f"{np.median(gaps_at_mis) if gaps_at_mis else float('nan'):.4f} "
          f"(bf16 ulp at logit scale ~0.03-0.12)", flush=True)


if __name__ == "__main__":
    main()
