"""Interactive demo: speculative decoding on a chat prompt.

Reference: run_pipe.py — loads the stage model, builds a vicuna/llama chat
prompt, warms up, runs N timed generations, prints the decoded output and
throughput. Here: one process, any engine (single-chip / pipeline / TP).

With real checkpoints:
    python demo.py --model /path/to/vicuna-7b --draft /path/to/EAGLE-vicuna \
        --engine pipeline --schedule continuous --prompt "Tell me a story."

Without checkpoints (random weights, token-level demo):
    python demo.py --random tiny
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="HF model dir (safetensors)")
    ap.add_argument("--draft", help="EAGLE draft checkpoint dir")
    ap.add_argument("--thin-draft", help="distilled thin-draft npz "
                    "(tools/train_bench_draft.py checkpoint)")
    ap.add_argument("--random", choices=["tiny", "1b", "7b"],
                    help="use random weights of this size instead")
    ap.add_argument("--engine", default="single",
                    choices=["single", "pipeline", "tp", "galaxy", "serve"])
    ap.add_argument("--slots", type=int, default=4,
                    help="serve engine: concurrent decode slots")
    ap.add_argument("--requests", type=int, default=8,
                    help="serve engine: queued copies of the prompt")
    ap.add_argument("--queue-order", default="fifo",
                    choices=["fifo", "sjf", "lpt"],
                    help="serve engine: admission policy")
    ap.add_argument("--prefix-cache", action="store_true",
                    help="serve engine: shared_prefix='auto' — the common"
                         " prompt prefix is prefilled once and cached")
    ap.add_argument("--schedule", default="continuous")
    ap.add_argument("--template", default="vicuna")
    ap.add_argument("--prompt", default="Tell me a short story about a robot.")
    ap.add_argument("--max-new-tokens", type=int, default=128)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu); needed because "
                         "the container's sitecustomize overrides the "
                         "JAX_PLATFORMS env var via jax.config")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from flowspec_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig, StageTopology, TreeConfig,
    )
    from flowspec_tpu.draft.eagle import init_eagle_params, load_eagle_params
    from flowspec_tpu.models.llama import init_llama_params
    from flowspec_tpu.models.loader import load_llama_params, load_model_config
    from flowspec_tpu.runtime import SpecEngine
    from flowspec_tpu.utils.chat import build_prompt

    tokenizer = None
    if args.model:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(args.model)
        mc = load_model_config(args.model)
        params = load_llama_params(args.model, mc)
        draft = (load_eagle_params(args.draft, embed=params.embed)
                 if args.draft else
                 init_eagle_params(jax.random.key(1), mc, embed=params.embed))
    else:
        kind = args.random or "tiny"
        mc = (ModelConfig.tiny(vocab_size=1024) if kind == "tiny" else
              ModelConfig(hidden_size=2048, intermediate_size=5504,
                          num_hidden_layers=16, num_attention_heads=16,
                          num_key_value_heads=16) if kind == "1b" else
              ModelConfig.llama_7b())
        params = init_llama_params(jax.random.key(0), mc)
        draft = init_eagle_params(jax.random.key(1), mc, embed=params.embed)
    if args.thin_draft:
        from flowspec_tpu.draft.eagle import load_thin_draft
        draft = load_thin_draft(args.thin_draft, params.embed)

    tc = TreeConfig(node_cap=96, leaf_cap=96, depth_cap=16)
    topo = StageTopology.even(mc.num_hidden_layers, args.stages)
    cfg = EngineConfig(model=mc, tree=tc,
                       sampling=SamplingConfig(temperature=args.temperature),
                       topology=topo, max_new_tokens=args.max_new_tokens,
                       max_seq_len=1152)

    if args.engine == "pipeline":
        from flowspec_tpu.parallel import PipelineEngine
        eng = PipelineEngine(params, draft, cfg, schedule=args.schedule)
        gen = eng.generate_fused
    elif args.engine in ("tp", "galaxy"):
        from flowspec_tpu.parallel.tp import TPEngine
        eng = TPEngine(params, draft, cfg, galaxy=args.engine == "galaxy")
        gen = eng.generate_fused
    elif args.engine == "serve":
        from flowspec_tpu.runtime.batched import BatchedSpecEngine
        eng = BatchedSpecEngine(params, draft, cfg, batch_size=args.slots)
        gen = None   # serve path handled below
    else:
        eng = SpecEngine(params, draft, cfg)
        gen = eng.generate_fused

    if tokenizer is not None:
        text = build_prompt([(args.prompt, None)], template=args.template)
        prompt_ids = tokenizer(text).input_ids
        eos = tokenizer.eos_token_id
    else:
        prompt_ids = list(np.random.default_rng(0).integers(
            10, mc.vocab_size - 1, 32))
        eos = -1

    print(f"engine={args.engine} schedule={args.schedule} "
          f"prompt_len={len(prompt_ids)}")
    if args.engine == "serve":
        prompts = [prompt_ids] * args.requests
        kw = {"queue_order": args.queue_order}
        if args.prefix_cache:
            kw["shared_prefix"] = "auto"
        eng.serve(prompts, max_new_tokens=args.max_new_tokens,
                  eos_token_id=eos, **kw)
        t0 = time.perf_counter()
        outs, stats = eng.serve(prompts, max_new_tokens=args.max_new_tokens,
                                eos_token_id=eos, **kw)
        dt = time.perf_counter() - t0
        out = outs[0]
    else:
        gen(prompt_ids, max_new_tokens=args.max_new_tokens, eos_token_id=eos)
        t0 = time.perf_counter()
        out, stats = gen(prompt_ids, max_new_tokens=args.max_new_tokens,
                         eos_token_id=eos)
        dt = time.perf_counter() - t0

    new = out[len(prompt_ids):]
    if tokenizer is not None:
        print("---\n" + tokenizer.decode(new) + "\n---")
    else:
        print("generated token ids:", new[:32], "..." if len(new) > 32 else "")
    line = (f"{stats['new_tokens']} tokens in {dt:.2f}s = "
            f"{stats['new_tokens'] / dt:.2f} tok/s | "
            f"accept/round = {stats.get('accept_per_round') or 0:.2f}")
    if "slot_utilization" in stats:
        line += f" | slot_utilization = {stats['slot_utilization']:.2f}"
    print(line)


if __name__ == "__main__":
    main()
