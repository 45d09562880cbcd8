"""Parameter-sweep CLI: the reference's `eval/eval_params.py` as a module.

Reference: eval/eval_params.py:196-205 sweeps a (init_depth, expand_depth)
grid by mutating the global run_config between harness runs; here each grid
point builds an immutable TreeConfig and a fresh engine, runs the shared
harness (flowspec_tpu/eval/harness.py) over the question files, and appends
one summary JSON line per (config, dataset) to the results file.

Usage (random weights, CPU or TPU):
    python -m flowspec_tpu.eval.sweep --random tiny \
        --data data/mt_bench/question.jsonl --limit 2 \
        --depths 4,6 --expand-depths 2 --chunk-lens 8,16 \
        --max-new-tokens 32 --out sweep_results.jsonl

With real checkpoints, pass --model/--draft like demo.py; the model's HF
tokenizer is used. Without checkpoints a deterministic byte-level tokenizer
keeps the pipeline runnable end-to-end (throughput/acceptance numbers are
then architecture smoke numbers, not model-quality numbers).
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import time


def byte_tokenizer(vocab_size: int):
    """Deterministic text<->token fallback so the harness can run without a
    checkpoint: bytes offset past the special-token range, clipped to vocab."""
    lo = 3

    def tok(text: str):
        return [lo + (b % (vocab_size - lo)) for b in text.encode()][:512]

    def detok(tokens):
        return bytes(int(max(0, t - lo)) % 256 for t in tokens).decode(
            "latin-1")

    return tok, detok


def build_engine(args, mc, tc, params, draft, temperature: float):
    import jax
    from flowspec_tpu.config import (
        EngineConfig, SamplingConfig, StageTopology,
    )

    cfg = EngineConfig(
        model=mc, tree=tc,
        sampling=SamplingConfig(temperature=temperature),
        topology=StageTopology.even(mc.num_hidden_layers, args.stages),
        max_new_tokens=args.max_new_tokens,
        max_seq_len=args.max_seq_len)
    if args.engine == "pipeline":
        from flowspec_tpu.parallel import PipelineEngine
        return PipelineEngine(params, draft, cfg, schedule=args.schedule)
    if args.engine == "tp":
        from flowspec_tpu.parallel.tp import TPEngine
        return TPEngine(params, draft, cfg)
    if args.engine == "serve":
        from flowspec_tpu.runtime.batched import BatchedSpecEngine
        # adapt_tree=False: the batch-adaptive table would silently cap
        # total_tokens at 47/31 for >=2/>=4 slots, making every sweep row
        # above the cap measure the same tree while recording the requested
        # one (advisor r3). A sweep must run exactly the config it reports.
        return BatchedSpecEngine(params, draft, cfg,
                                 batch_size=args.serve_slots,
                                 adapt_tree=False,
                                 dynamic_tree=args.dynamic_tree)
    from flowspec_tpu.runtime import SpecEngine
    return SpecEngine(params, draft, cfg)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="HF model dir")
    ap.add_argument("--draft", help="EAGLE draft dir")
    ap.add_argument("--random", choices=["tiny", "1b", "7b"], default=None,
                    help="random weights of this size instead of --model")
    ap.add_argument("--engine", default="single",
                    choices=["single", "pipeline", "tp", "serve"])
    ap.add_argument("--serve-slots", type=int, default=4,
                    help="serve engine: concurrent decode slots")
    ap.add_argument("--dynamic-tree", action="store_true",
                    help="serve engine: per-dispatch tree variants keyed "
                         "on the live active-lane count")
    ap.add_argument("--queue-order", default="fifo",
                    choices=["fifo", "sjf", "lpt"],
                    help="serve engine: admission policy")
    ap.add_argument("--prefix-cache", action="store_true",
                    help="serve engine: auto-detect the chat template's "
                         "shared preamble and prefill it once "
                         "(shared_prefix='auto')")
    ap.add_argument("--schedule", default="continuous")
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--data", nargs="+", required=True,
                    help="question.jsonl path(s)")
    ap.add_argument("--limit", type=int, default=5,
                    help="questions per dataset")
    ap.add_argument("--max-conv-turns", type=int, default=1)
    ap.add_argument("--depths", default="6", help="comma list (ref init_depth)")
    ap.add_argument("--expand-depths", default="6",
                    help="comma list (ref expand_depth)")
    ap.add_argument("--chunk-lens", default="16", help="comma list")
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--total-tokens", type=int, default=80)
    ap.add_argument("--score-temps", default="1",
                    help="comma list of beam score temperatures (tree-"
                         "shape knob, TreeConfig.score_temperature)")
    ap.add_argument("--temperatures", default=None,
                    help="comma list — outer sweep axis, like the "
                         "reference's `temperatures` loop "
                         "(eval/run_pipe_eval.py:191); overrides "
                         "--temperature")
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--resume", action="store_true",
                    help="multi-turn KV reuse: turn N prefills only the "
                         "new tokens (engine resume_and_generate) instead "
                         "of re-prefilling the whole conversation")
    ap.add_argument("--trained-draft", default=None,
                    help="npz thin-draft checkpoint "
                         "(tools/train_bench_draft.py) to use instead of "
                         "a random draft")
    ap.add_argument("--quant", default="none",
                    choices=["none", "int8", "nf4", "int4", "mixed"])
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--max-seq-len", type=int, default=2560)
    ap.add_argument("--template", default="vicuna")
    ap.add_argument("--out", default="sweep_results.jsonl")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (see CLAUDE.md: the axon "
                         "sitecustomize overrides JAX_PLATFORMS)")
    ap.add_argument("--no-fused", action="store_true",
                    help="host round loop instead of the fused on-device "
                         "decode loop: each grid point then compiles only "
                         "the (small) per-round program — the right trade "
                         "for wide grids on the tunneled backend, where "
                         "one 7B fused-loop compile can cost minutes")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from flowspec_tpu.config import ModelConfig, TreeConfig
    from flowspec_tpu.draft.eagle import init_eagle_params, load_eagle_params
    from flowspec_tpu.models.llama import init_llama_params
    from flowspec_tpu.eval.harness import load_questions, run_eval

    tokenizer = None
    if args.model:
        from transformers import AutoTokenizer
        from flowspec_tpu.models.loader import (
            load_llama_params, load_model_config,
        )
        tokenizer = AutoTokenizer.from_pretrained(args.model)
        mc = load_model_config(args.model)
        params = load_llama_params(args.model, mc)
        draft = (load_eagle_params(args.draft, embed=params.embed)
                 if args.draft else
                 init_eagle_params(jax.random.key(1), mc, embed=params.embed))
        tok, detok = (
            lambda s: tokenizer(s).input_ids,
            lambda ts: tokenizer.decode(ts, skip_special_tokens=True))
    else:
        kind = args.random or "tiny"
        if kind == "tiny":
            mc = ModelConfig.tiny(vocab_size=1024, n_layers=args.stages)
        elif kind == "1b":
            mc = ModelConfig(hidden_size=2048, intermediate_size=5504,
                             num_hidden_layers=16, num_attention_heads=16,
                             num_key_value_heads=16)
        else:
            mc = ModelConfig.llama_7b()
        if args.quant != "none":
            import sys as _sys
            _sys.path.insert(0, os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))))
            from bench import build_params
            params, draft = build_params(mc, args.quant)
        else:
            params = init_llama_params(jax.random.key(0), mc)
            draft = init_eagle_params(jax.random.key(1), mc,
                                      embed=params.embed)
        tok, detok = byte_tokenizer(mc.vocab_size)

    if args.trained_draft:
        from flowspec_tpu.draft.eagle import (
            load_thin_draft, quantize_eagle_params,
        )
        draft = load_thin_draft(args.trained_draft, params.embed)
        if args.quant != "none":
            draft = quantize_eagle_params(
                draft, "int8" if args.quant == "mixed" else args.quant)

    temps = ([float(x) for x in args.temperatures.split(",")]
             if args.temperatures else [args.temperature])
    grid = list(itertools.product(
        temps,
        [int(x) for x in args.depths.split(",")],
        [int(x) for x in args.expand_depths.split(",")],
        [int(x) for x in args.chunk_lens.split(",")],
        [float(x) for x in args.score_temps.split(",")]))

    rows = []
    for temperature, depth, expand_depth, chunk_len, stemp in grid:
        tc = TreeConfig(top_k=args.top_k, depth=depth,
                        total_tokens=args.total_tokens,
                        expand_depth=expand_depth, chunk_len=chunk_len,
                        depth_cap=max(24, depth + expand_depth + 2),
                        score_temperature=stemp)
        eng = build_engine(args, mc, tc, params, draft, temperature)
        # prefer the fused on-device decode loop: the host round loop pays
        # one dispatch RTT per round (~70ms through the tunneled backend).
        # --resume uses the host round loop instead (resume keeps state
        # across turns; its prefill saving targets multi-turn TTFT).
        gen_fn = (eng.generate if args.no_fused else
                  getattr(eng, "generate_fused", eng.generate))
        gen = lambda toks: gen_fn(
            toks, max_new_tokens=args.max_new_tokens, eos_token_id=-1)
        for path in args.data:
            name = os.path.basename(os.path.dirname(path)) or path
            qs = load_questions(path, limit=args.limit)
            t0 = time.perf_counter()
            if args.engine == "serve":
                from flowspec_tpu.eval.harness import run_eval_serve
                summary = run_eval_serve(
                    eng, tok, qs, name=name, template=args.template,
                    max_new_tokens=args.max_new_tokens,
                    queue_order=args.queue_order,
                    prefix_cache=args.prefix_cache)
            else:
                res = run_eval(gen, tok, detok, qs, name=name,
                               template=args.template,
                               max_turns=args.max_conv_turns,
                               engine=eng if args.resume else None,
                               resume=args.resume,
                               max_new_tokens=args.max_new_tokens)
                summary = res.summary()
            row = dict(temperature=temperature, depth=depth,
                       expand_depth=expand_depth, score_temp=stemp,
                       chunk_len=chunk_len, engine=args.engine,
                       schedule=args.schedule,
                       draft=("trained" if args.trained_draft else "random"),
                       quant=args.quant,
                       wall_s=round(time.perf_counter() - t0, 3),
                       **summary)
            rows.append(row)
            print(json.dumps(row))
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
    return rows


if __name__ == "__main__":
    main()
