"""Train a base model with REAL sequential structure, then earn draft
acceptance against it — the realism anchor the random bench base can't be.

Why: the ROADMAP honesty notes flag that every bench-scale earned-
acceptance number rides on a RANDOM base whose greedy dynamics collapse to
attractors (distilled acceptance artificially high and depth-saturating)
and whose near-flat softmax pins stochastic T=1 acceptance at ~1.0. The
reference's numbers ride on real checkpoints (reference
eval/run_pipe_eval.py:348-360) that don't exist in this environment. This
tool closes the gap from the other side: it TRAINS a mid-scale LLaMA-
architecture base (the repo's own models/llama.py stack, so training runs
the exact inference code path) on a deterministic synthetic corpus with
learnable-but-partial structure (flowspec_tpu/eval/synth.py: class-table +
induction-copy + Zipf noise), verifies it learned (held-out top-1 vs the
Bayes oracle), then distills a thin EAGLE draft EAGLE-style on teacher-forced corpus
pairs (fresh seed-3 draws; greedy-rollout distillation memorizes — see
distill_draft) and measures in an f32 engine:

  - greedy accept/round + losslessness vs AR (earned, on structured
    dynamics — no attractors: the greedy state space is the class-window,
    astronomically larger than the trajectory);
  - T=1 stochastic accept/round (the first REAL rejection-sampling
    acceptance number in this repo: the trained softmax is peaked where
    the structure is deterministic and flat where it's noise);
  - spec vs AR tokens/s on the current backend.

Phases run in ONE process (the tunnel pays per-process compile costs).

Env: STRUCT_SCALE=tiny|mid (default mid; tiny is the CPU/CI scale),
STRUCT_STEPS / STRUCT_DISTILL_OUTER / STRUCT_SEQS override sizes,
STRUCT_OUT directs the JSON report (default checkpoints/struct_<scale>.json).
Run: python tools/train_struct_base.py      (mid holds the TPU ~20-40 min)
"""

import dataclasses
import functools
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import numpy as np

SCALES = {
    # CPU/CI scale: the full pipeline in a few minutes. The corpus must be
    # big enough that learning the STRUCTURE beats memorizing sequences
    # (the first cut at 384x96 tokens hit Bayes-level top-1 on train and
    # 0.04 held-out — pure memorization).
    "tiny": dict(vocab=512, hidden=128, inter=320, layers=4, heads=4, kv=4,
                 n_classes=16, copy_dist=8, seq_len=96, n_seqs=2048,
                 holdout=64, batch=16, steps=800, lr=3e-3,
                 distill_pool=128, distill_outer=25, gen_tokens=48,
                 prompt_len=24, draft_width=64, distill_batch=16),
    # 8-layer CPU scale: same difficulty family as tiny but deep enough to
    # stage-split 8 ways — trains the committed dryrun fixture
    # (tests/fixtures/struct_tiny8_*.npz) that drives the 8-stage
    # multichip gate at the PRODUCTION tree shape with real multi-token
    # acceptance (r4 verdict #8)
    # draft capacity is the binding factor at this scale: hidden 128 gave
    # held-out draft agree 0.18 / accept 1.38 even with 5x distillation
    # data (flat curve — capacity-limited, mirroring mid's finding that
    # width 1024 was needed for agree 0.827); hidden 256 + n_classes 8
    # puts the 1-layer draft back in its learnable regime
    "tiny8": dict(vocab=1024, hidden=256, inter=640, layers=8, heads=4,
                  kv=4, n_classes=8, copy_dist=8, seq_len=128, n_seqs=4096,
                  holdout=64, batch=16, steps=3000, lr=3e-3,
                  distill_pool=128, distill_outer=150, gen_tokens=48,
                  prompt_len=24, draft_width=256, distill_batch=16),
    # hardware scale: ~170M params. Sizing from the run trajectories:
    # 3000 base steps -> held-out top1 0.146, still climbing; 15000 ->
    # 0.27, 0.72x the Bayes ceiling. n_classes is the difficulty dial:
    # at K=64 the (a+b) mod K class composition proved un-grokkable for
    # the ONE-layer draft within budget (streaming agree plateaued at
    # 0.07 over 77k fresh sequences while the 12-layer base learned it),
    # an honest capacity result; K=16 keeps the same structure family at
    # a difficulty the draft can learn, which is what the acceptance
    # measurement needs. Draft is full-width (EAGLE's layout).
    "mid": dict(vocab=8192, hidden=1024, inter=2816, layers=12, heads=16,
                kv=16, n_classes=16, copy_dist=16, seq_len=512,
                n_seqs=16384, holdout=64, batch=16, steps=12000, lr=1e-3,
                distill_pool=256, distill_outer=300, gen_tokens=256,
                prompt_len=64, draft_width=1024, distill_batch=16),
    # bench scale (r3 verdict #1): ~0.5B — big enough that serve rounds
    # are HBM-meaningful (1GB bf16 weights), small enough that f32 master
    # + adamw moments + grads (~9GB) fit beside activations on the 16GB
    # chip. Same K=16 structure family the mid draft PROVED learnable
    # (held-out agree 0.827); full-width draft (EAGLE's layout).
    "big": dict(vocab=8192, hidden=1792, inter=4864, layers=12, heads=14,
                kv=14, n_classes=16, copy_dist=16, seq_len=512,
                n_seqs=16384, holdout=64, batch=16, steps=12000, lr=8e-4,
                distill_pool=256, distill_outer=300, gen_tokens=256,
                prompt_len=64, draft_width=1792, distill_batch=16),
}

DRAFT_FIELDS = ("fc_w", "fc_b", "wq", "wk", "wv", "wo",
                "w_gate", "w_up", "w_down", "post_ln", "w_out")


def model_config(s):
    from flowspec_tpu.config import ModelConfig
    return ModelConfig(vocab_size=s["vocab"], hidden_size=s["hidden"],
                       intermediate_size=s["inter"],
                       num_hidden_layers=s["layers"],
                       num_attention_heads=s["heads"],
                       num_key_value_heads=s["kv"],
                       max_position_embeddings=2560)


def make_lm_loss(mc, t_len):
    """Causal-LM CE through the repo's own decoder_layer stack (bf16
    compute, f32 logits), remat over the layer scan."""
    import jax
    import jax.numpy as jnp
    from flowspec_tpu.models.bias import prefill_bias
    from flowspec_tpu.models.llama import (
        decoder_layer, embed_tokens, final_hidden, lm_head_logits)

    dt = jnp.bfloat16

    def lm_loss(params, tok_b):
        p = jax.tree_util.tree_map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params)
        b = tok_b.shape[0]
        x = embed_tokens(p, tok_b)
        pos = jnp.arange(t_len, dtype=jnp.int32)
        bias = prefill_bias(jnp.zeros((), jnp.int32), t_len, t_len,
                            dtype=jnp.float32)

        def body(carry, lp):
            k0 = jnp.zeros((b, mc.num_key_value_heads, t_len, mc.head_dim_),
                           dt)
            y, _, _ = decoder_layer(carry, lp, k0, jnp.zeros_like(k0), pos,
                                    bias, jnp.zeros((), jnp.int32), mc)
            return y, None

        x, _ = jax.lax.scan(jax.checkpoint(body), x, p.layers)
        h = final_hidden(p, x, mc)
        logits = lm_head_logits(p, h[:, :-1])          # (B, T-1, V) f32
        labels = tok_b[:, 1:]
        lsm = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(lsm, labels[..., None], axis=-1).mean()
        acc = (jnp.argmax(logits, axis=-1) == labels).mean()
        return ce, acc

    return lm_loss


def save_base(params, path):
    import jax
    np.savez_compressed(path, **{
        f"p{i}": np.asarray(l).astype(np.float16) for i, l in enumerate(
            jax.tree_util.tree_leaves(params))})


def load_base(path, mc):
    """Rebuild bf16 LlamaParams from the flat fp16 leaves save_base wrote
    (leaf order = tree-flatten order of init_llama_params's structure)."""
    import functools
    import jax
    import jax.numpy as jnp
    from flowspec_tpu.models.llama import init_llama_params
    ref = jax.eval_shape(functools.partial(init_llama_params, cfg=mc),
                         jax.random.key(0))
    leaves, treedef = jax.tree_util.tree_flatten(ref)
    z = np.load(path)
    new = [jnp.asarray(z[f"p{i}"]).astype(l.dtype)
           for i, l in enumerate(leaves)]
    return jax.tree_util.tree_unflatten(treedef, new)


def save_draft(draft, path):
    np.savez_compressed(path, **{
        f: np.asarray(getattr(draft, f)).astype(np.float16)
        for f in DRAFT_FIELDS if getattr(draft, f) is not None})


def load_draft(path, embed, dtype):
    """EagleParams from save_draft leaves (fields absent in the file —
    e.g. w_out for a full-width draft — stay None)."""
    import jax.numpy as jnp
    from flowspec_tpu.draft.eagle import EagleParams
    z = np.load(path)
    return EagleParams(embed=embed, **{
        f: (jnp.asarray(z[f]).astype(dtype) if f in z.files else None)
        for f in DRAFT_FIELDS})


def train_base(mc, corpus_train, s, steps, log=print, save_every=None,
               save_path=None):
    """Next-token CE on the corpus; f32 master weights, bf16 compute.
    Returns bf16 LlamaParams. `save_every` steps (if set) snapshots the
    params to `save_path` so a crash never costs the whole run — at the
    big scale base training holds the TPU ~2h."""
    import jax
    import jax.numpy as jnp
    import optax
    from flowspec_tpu.models.llama import init_llama_params

    dt = jnp.bfloat16
    batch, lr = s["batch"], s["lr"]
    t_len = corpus_train.shape[1]
    n_train = corpus_train.shape[0]
    lm_loss = make_lm_loss(mc, t_len)

    params = init_llama_params(jax.random.key(3), mc, dtype=jnp.float32)
    step0 = 0
    init_from = os.environ.get("STRUCT_BASE_INIT")
    if init_from:
        # resume base training interrupted by a tunnel outage: reload the
        # last fp16 snapshot as the f32 master and skip the steps already
        # taken (recorded beside the snapshot). AdamW moments restart cold
        # and the cosine schedule is offset so the lr continues where it
        # left off rather than re-warming to peak.
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), load_base(init_from, mc))
        meta = init_from + ".step.npy"
        step0 = int(np.load(meta)) if os.path.exists(meta) else 0
        log(f"base resumed from {init_from} at step {step0} (opt cold)")
    sched = optax.cosine_decay_schedule(lr, steps, 0.05)
    opt = optax.adamw(lambda count: sched(count + step0),
                      b1=0.9, b2=0.95, weight_decay=0.01)
    opt_state = opt.init(params)

    def one_step(carry, it, corpus):
        params, opt_state = carry
        k = jax.random.fold_in(jax.random.key(4242), it)
        idx = jax.random.randint(k, (batch,), 0, n_train)
        (ce, acc), g = jax.value_and_grad(lm_loss, has_aux=True)(
            params, corpus[idx])
        upd, opt_state = opt.update(g, opt_state, params)
        return (optax.apply_updates(params, upd), opt_state), (ce, acc)

    chunk = min(100, steps)
    # corpus is an ARGUMENT (not a closure capture): captured device arrays
    # are baked into the HLO and the tunneled remote-compile endpoint
    # rejects multi-MB uploads (CLAUDE.md round-3 notes)

    # donate params+opt_state: at 0.5B the f32 master+moments are ~6GB —
    # without donation XLA holds input AND output copies across the call
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_chunk(params, opt_state, it0, corpus):
        (params, opt_state), (ces, accs) = jax.lax.scan(
            lambda c, it: one_step(c, it, corpus), (params, opt_state),
            it0 + jnp.arange(chunk, dtype=jnp.int32))
        return params, opt_state, ces[-1], accs[-1]

    tok_dev = jnp.asarray(corpus_train)
    t0 = time.time()
    for c in range(step0, steps, chunk):
        params, opt_state, ce, acc = run_chunk(
            params, opt_state, jnp.asarray(c, jnp.int32), tok_dev)
        log(f"base step {c+chunk:5d}/{steps} ce {float(ce):.4f} "
            f"top1 {float(acc):.3f} ({time.time()-t0:.0f}s)")
        if (save_every and save_path and (c + chunk) % save_every == 0
                and c + chunk < steps):
            save_base(params, save_path)
            np.save(save_path + ".step.npy", np.int64(c + chunk))
            log(f"checkpoint: {save_path} @ step {c+chunk}")
    del opt_state
    eval_loss = jax.jit(lm_loss)
    bf16 = jax.tree_util.tree_map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params)
    return bf16, (lambda tok_b: eval_loss(params, tok_b))


def oracle_top1(corpus_holdout, s, n_positions=512):
    """Bayes-optimal top-1 accuracy on held-out positions (the ceiling a
    perfectly trained base approaches)."""
    from flowspec_tpu.eval.synth import oracle_next_token_dist
    rng = np.random.default_rng(7)
    hit = 0
    n = 0
    for _ in range(n_positions):
        r = rng.integers(0, corpus_holdout.shape[0])
        t = rng.integers(s["copy_dist"] + 1, s["seq_len"])
        p = oracle_next_token_dist(corpus_holdout[r], t, s["vocab"],
                                   n_classes=s["n_classes"],
                                   copy_dist=s["copy_dist"], table_seed=0)
        hit += int(np.argmax(p) == corpus_holdout[r, t])
        n += 1
    return hit / n


def distill_draft(params, mc, s, log=print):
    """EAGLE-style distillation with STREAMING fresh data.

    Each outer round draws a brand-new seeded corpus pool, computes the
    teacher's final-norm hiddens for it, and takes ONE pass of gradient
    steps over it — no sequence is ever revisited, so memorization is
    impossible and train agreement IS generalization. Both fixed-pool
    variants memorized at mid scale (train-agree 1.0, held-out 0.05:
    greedy rollouts collapse to low diversity, and even a 640-sequence
    teacher-forced pool is small enough for a 5M-param draft to store).
    Real EAGLE training lives in this regime too (~1 epoch over a large
    text corpus)."""
    import jax
    import jax.numpy as jnp
    import optax
    from flowspec_tpu.draft.eagle import (
        EagleParams, draft_view, eagle_layer, fuse, init_eagle_params,
        project_out)
    from flowspec_tpu.models import model_forward
    from flowspec_tpu.models.bias import prefill_bias
    from flowspec_tpu.models.kv_cache import init_kv_cache
    from flowspec_tpu.models.llama import embed_tokens, final_hidden
    from flowspec_tpu.eval.synth import gen_struct_corpus

    dt = jnp.bfloat16
    pool, n_outer = s["distill_pool"], s["distill_outer"]
    batch = s["distill_batch"]
    prompt_len, gen_tokens = s["prompt_len"], s["gen_tokens"]
    seq_len = prompt_len + gen_tokens
    kv_rows = -(-seq_len // 64) * 64
    fb = min(32, pool)                      # teacher forward batch

    @jax.jit
    def hiddens_of(params, seqs):
        """(FB, T) -> (FB, T, H) teacher final-norm hiddens."""
        cache = init_kv_cache(mc.num_hidden_layers, fb,
                              mc.num_key_value_heads, kv_rows, mc.head_dim_,
                              dt)
        hidden = embed_tokens(params, seqs)
        bias = prefill_bias(jnp.zeros((), jnp.int32), seq_len, kv_rows)
        pos = jnp.arange(seq_len, dtype=jnp.int32)
        out, _ = model_forward(params, cache, hidden, pos, bias,
                               jnp.zeros((), jnp.int32), mc)
        return final_hidden(params, out, mc)

    def pool_of(seed):
        toks = gen_struct_corpus(
            pool, seq_len, vocab=s["vocab"], seed=seed,
            n_classes=s["n_classes"], copy_dist=s["copy_dist"])
        toks = jnp.asarray(toks)
        hid = jnp.concatenate([hiddens_of(params, toks[i:i + fb])
                               for i in range(0, pool, fb)])
        return toks, hid

    width = s["draft_width"]
    draft0 = init_eagle_params(jax.random.key(9), mc, embed=params.embed,
                               dtype=jnp.float32, width=width)
    dcfg = draft_view(draft0, mc)
    t_pairs = seq_len - 1
    head = params.lm_head

    def draft_forward(trainable, embed, tok_b, hid_b):
        p = EagleParams(embed=embed, **trainable)
        h_in = hid_b[:, :-1].astype(jnp.float32)
        x = fuse(p, tok_b[:, 1:], h_in)
        pos = jnp.arange(t_pairs, dtype=jnp.int32)
        bias = jnp.where(pos[None, :] <= pos[:, None], 0.0,
                         -1e9).astype(jnp.float32)

        def one(x1, h1):
            k = jnp.zeros((1, dcfg.num_key_value_heads, t_pairs,
                           dcfg.head_dim_), jnp.float32)
            out, _, _ = eagle_layer(x1[None], p, k, jnp.zeros_like(k), pos,
                                    bias, jnp.zeros((), jnp.int32), dcfg)
            return project_out(p, out, h1[None])[0]

        return jax.vmap(one)(x, h_in)

    def loss_fn(trainable, consts, tok_b, hid_b):
        out = draft_forward(trainable, consts["embed"], tok_b, hid_b)
        tgt = hid_b[:, 1:].astype(jnp.float32)
        d = out - tgt
        ad = jnp.abs(d)
        hub = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5).mean()
        ld = jnp.einsum("bth,hv->btv", out.astype(dt), consts["head"],
                        preferred_element_type=jnp.float32)
        lt = jnp.einsum("bth,hv->btv", hid_b[:, 1:], consts["head"],
                        preferred_element_type=jnp.float32)
        lab = jnp.argmax(lt, axis=-1)
        lsm = jax.nn.log_softmax(ld, axis=-1)
        ce = -jnp.take_along_axis(lsm, lab[..., None], axis=-1).mean()
        agree = (jnp.argmax(ld, axis=-1) == lab).mean()
        return 0.5 * hub + ce, (hub, ce, agree)

    trainable = {f: getattr(draft0, f) for f in DRAFT_FIELDS}
    init_from = os.environ.get("STRUCT_DRAFT_INIT")
    outer0 = 0
    if init_from:
        # resume a distillation interrupted by a tunnel outage: reload the
        # trainable fields (f32) and skip the pools already consumed
        # (recorded beside the snapshot); AdamW restarts cold — acceptable
        # for a warm-started draft
        z = np.load(init_from)
        # fields absent from the snapshot fall back to the FRESH init, not
        # None: optax treats None as an empty subtree, so a partial/stale
        # snapshot would otherwise silently train without that field
        # (advisor r4). Fields that are None in draft0 (e.g. w_out for a
        # full-width draft) legitimately stay None.
        trainable = {f: (jnp.asarray(z[f]).astype(jnp.float32)
                         if f in z.files else getattr(draft0, f))
                     for f in DRAFT_FIELDS}
        outer0 = int(np.load(init_from + ".meta.npy")) \
            if os.path.exists(init_from + ".meta.npy") else 0
        log(f"distill resumed from {init_from} at pool {outer0}")
    steps_per = pool // batch               # ONE pass over each pool
    total_steps = n_outer * steps_per
    opt = optax.adamw(optax.cosine_decay_schedule(1e-3, total_steps, 0.02),
                      weight_decay=1e-4)
    opt_state = opt.init(trainable)

    def one_step(carry, it, consts):
        trainable, opt_state = carry
        idx = it * batch + jnp.arange(batch)
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, consts, consts["tok"][idx], consts["hid"][idx])
        upd, opt_state = opt.update(g, opt_state, trainable)
        return (optax.apply_updates(trainable, upd), opt_state), (l,) + aux

    @jax.jit
    def run_pool(trainable, opt_state, consts):
        (trainable, opt_state), (ls, hubs, ces, ags) = jax.lax.scan(
            lambda c, it: one_step(c, it, consts), (trainable, opt_state),
            jnp.arange(steps_per, dtype=jnp.int32))
        return trainable, opt_state, ls[-1], ags[-1]

    t0 = time.time()
    # scale-specific default: concurrent runs at different scales (e.g.
    # the CPU tiny8 fixture beside the TPU big run) must not overwrite
    # each other's resume snapshots
    snap_path = os.environ.get(
        "STRUCT_DISTILL_SNAP",
        f"/tmp/struct_distill_snap_{s['hidden']}h{s['layers']}L.npz")
    for outer in range(outer0, n_outer):
        toks, hid = pool_of(30_000 + outer)
        consts = {"tok": toks, "hid": hid, "embed": params.embed,
                  "head": head}
        trainable, opt_state, l, ag = run_pool(trainable, opt_state, consts)
        if (outer + 1) % max(1, n_outer // 15) == 0:
            log(f"distill pool {outer+1:4d}/{n_outer} "
                f"({(outer+1)*steps_per} steps, all data fresh) "
                f"loss {float(l):.4f} top1-agree {float(ag):.3f} "
                f"({time.time()-t0:.0f}s)")
        if (outer + 1) % 50 == 0 and outer + 1 < n_outer:
            # crash/outage insurance: f32 trainable snapshot + pool count
            np.savez_compressed(snap_path, **{
                f: np.asarray(v) for f, v in trainable.items()
                if v is not None})
            np.save(snap_path + ".meta.npy", np.int64(outer + 1))
            log(f"distill snapshot: {snap_path} @ pool {outer+1}")

    @jax.jit
    def eval_agree(trainable, consts, tok_b, hid_b):
        _, (hub, ce, agree) = loss_fn(trainable, consts, tok_b, hid_b)
        return agree

    # held-out alpha selection (delta shrink; see train_bench_draft.py) —
    # under streaming data the learned delta is expected to keep alpha
    # near 1 (nothing was memorized); a 0 selection means the draft
    # failed to learn the base's hidden dynamics at all
    ho_toks, ho_hid = pool_of(999_983)
    consts = {"tok": ho_toks, "hid": ho_hid, "embed": params.embed,
              "head": head}
    if trainable["w_out"] is None:
        # full-width draft: project_out returns the layer output directly
        # (no residual delta head), so there is no delta to shrink
        best_a = 1.0
        best_ag = float(eval_agree(trainable, consts, ho_toks[:fb],
                                   ho_hid[:fb]))
        log(f"full-width draft: held-out top1-agree {best_ag:.3f}")
    else:
        best_a, best_ag = 0.0, -1.0
        for a in (0.0, 0.1, 0.25, 0.5, 0.75, 1.0):
            tr_a = {**trainable, "w_out": trainable["w_out"] * a}
            ag = float(eval_agree(tr_a, consts, ho_toks[:fb], ho_hid[:fb]))
            log(f"alpha {a:4.2f}: held-out top1-agree {ag:.3f}")
            if ag > best_ag:
                best_a, best_ag = a, ag
        log(f"selected alpha={best_a} (held-out agree {best_ag:.3f})")
        trainable = {**trainable, "w_out": trainable["w_out"] * best_a}

    draft = EagleParams(embed=params.embed, **{
        f: None if trainable[f] is None else jnp.asarray(trainable[f], dt)
        for f in DRAFT_FIELDS})
    return draft, {"holdout_top1_agree": round(best_ag, 4),
                   "w_out_alpha": best_a, "width": width,
                   "distill_fresh_seqs": n_outer * pool}


def run(scale: str, log=print):
    import jax
    import jax.numpy as jnp
    from flowspec_tpu.config import (
        EngineConfig, SamplingConfig, TreeConfig)
    from flowspec_tpu.eval.synth import gen_struct_corpus
    from flowspec_tpu.runtime.engine import SpecEngine

    s = dict(SCALES[scale])
    s["steps"] = int(os.environ.get("STRUCT_STEPS", s["steps"]))
    s["distill_outer"] = int(os.environ.get("STRUCT_DISTILL_OUTER",
                                            s["distill_outer"]))
    s["n_seqs"] = int(os.environ.get("STRUCT_SEQS", s["n_seqs"]))
    mc = model_config(s)

    log(f"[{scale}] corpus {s['n_seqs']}x{s['seq_len']} vocab {s['vocab']}")
    corpus = gen_struct_corpus(s["n_seqs"] + s["holdout"], s["seq_len"],
                               vocab=s["vocab"], seed=0,
                               n_classes=s["n_classes"],
                               copy_dist=s["copy_dist"])
    train, hold = corpus[:s["n_seqs"]], corpus[s["n_seqs"]:]

    base_load = os.environ.get("STRUCT_BASE_LOAD")
    if base_load:
        # reuse a previously trained base (fp16 leaves from save_base) —
        # base training dominates the runtime (~35 min at mid scale)
        params = load_base(base_load, mc)
        log(f"loaded base from {base_load}")
        lm_loss = jax.jit(make_lm_loss(mc, s["seq_len"]))
        ce_h, acc_h = (float(x) for x in lm_loss(params, jnp.asarray(hold)))
    else:
        params, eval_loss = train_base(
            mc, train, s, s["steps"], log=log,
            save_every=int(os.environ.get("STRUCT_SAVE_EVERY", "2000")),
            save_path=f"/tmp/struct_base_{scale}_last.npz")
        # checkpoint immediately: a crash in a later phase must not cost
        # the ~30 min of base training (it did once). The step meta marks
        # training COMPLETE so a babysitter relaunch with STRUCT_BASE_INIT
        # skips straight past the (empty) training loop.
        save_base(params, f"/tmp/struct_base_{scale}_last.npz")
        np.save(f"/tmp/struct_base_{scale}_last.npz.step.npy",
                np.int64(s["steps"]))
        log(f"base saved: /tmp/struct_base_{scale}_last.npz")
        ce_h, acc_h = (float(x) for x in eval_loss(jnp.asarray(hold)))
    bayes = oracle_top1(hold, s)
    log(f"held-out: top1 {acc_h:.3f} (Bayes oracle {bayes:.3f}, "
        f"ratio {acc_h/max(bayes,1e-9):.2f}) ce {ce_h:.3f}")

    prompt_len, gen_tokens = s["prompt_len"], s["gen_tokens"]
    max_seq = prompt_len + gen_tokens + 24
    # tree shape env-tunable so the anchor can also be measured at the
    # swept optimum (SWEEP_r03: depth 8 / tau 0.2) — tree shape dominates
    # acceptance as much as draft quality does
    t_depth = int(os.environ.get("STRUCT_DEPTH", "6"))
    t_total = int(os.environ.get("STRUCT_TOTAL", "48"))
    t_stemp = float(os.environ.get("STRUCT_STEMP", "1"))
    tc = TreeConfig(top_k=8, depth=t_depth, total_tokens=t_total,
                    expand_tokens=24, expand_depth=2,
                    node_cap=max(64, t_total + 16),
                    leaf_cap=max(64, t_total + 16),
                    depth_cap=max(10, t_depth + 2),
                    score_temperature=t_stemp)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_new_tokens=gen_tokens, max_seq_len=max_seq,
                       prefill_chunk=32)

    draft_load = os.environ.get("STRUCT_DRAFT_LOAD")
    if draft_load:
        draft = load_draft(draft_load, params.embed, jnp.bfloat16)
        dstats = {"draft": f"loaded from {draft_load}"}
        log(f"loaded draft from {draft_load}")
    else:
        draft, dstats = distill_draft(params, mc, s, log=log)
        dsave = os.environ.get("STRUCT_DRAFT_SAVE")
        if dsave:
            save_draft(draft, dsave)
            log(f"draft saved: {dsave}")

    # ---- engine eval: greedy + T=1, spec vs AR ------------------------
    # f32 engines: the trained base is high-entropy on noise positions,
    # so bf16 verify-width rounding flips near-tied argmaxes (the 7B
    # tie_probe phenomenon, here at ~0.5%/token); f32 restores exact
    # greedy equality, and at 171M the f32 weights are only ~700MB. Spec
    # and AR both run f32, so the speedup ratio stays apples-to-apples.
    # TPU caveat: f32 matmuls still run as bf16 MXU passes at the default
    # precision, so near-ties keep flipping; 'highest' uses the 3-pass
    # f32 decomposition and restores width-independent argmaxes
    jax.config.update("jax_default_matmul_precision", "highest")
    f32 = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if a.dtype == jnp.bfloat16 else a, t)
    mc32 = dataclasses.replace(mc, dtype="float32")
    cfg32 = dataclasses.replace(cfg, model=mc32)
    p32, d32 = f32(params), f32(draft)
    eng = SpecEngine(p32, d32, cfg32)
    eng_t1 = SpecEngine(p32, d32, dataclasses.replace(
        cfg32, sampling=SamplingConfig(temperature=1.0)))
    res = {"scale": scale, "params_m": round(sum(
        int(np.prod(np.shape(l))) for l in jax.tree_util.tree_leaves(params)
    ) / 1e6, 1), "base_holdout_top1": round(acc_h, 4),
        "bayes_oracle_top1": round(bayes, 4), "base_holdout_ce": round(ce_h, 4),
        "tree": f"d{t_depth}/tau{t_stemp:g}/n{t_total}",
        **dstats}

    accs, accs_t1, losses, match = [], [], 0, []
    n_eval = 6
    tps_spec, tps_ar = [], []
    eval_prompts = gen_struct_corpus(
        n_eval, max(prompt_len + 1, s["copy_dist"] + 2), vocab=s["vocab"],
        seed=2, n_classes=s["n_classes"], copy_dist=s["copy_dist"]
    )[:, :prompt_len]
    for i in range(n_eval):
        prompt = eval_prompts[i]
        t0 = time.time()
        ar, _ = eng.generate_ar_fused(prompt, max_new_tokens=gen_tokens,
                                      eos_token_id=-1)
        dt_ar = time.time() - t0
        t0 = time.time()
        out, st = eng.generate_fused(prompt, max_new_tokens=gen_tokens,
                                     eos_token_id=-1)
        dt_sp = time.time() - t0
        n = min(len(out), len(ar))
        div = next((j for j in range(n) if out[j] != ar[j]), n)
        ok = div == n
        losses += 0 if ok else 1
        match.append(div / max(n, 1))   # bf16 near-tie flips show as
        # high match_frac with ok=False (tools/tie_probe.py); real
        # divergence shows as low match_frac
        accs.append(st["accept_per_round"])
        _, st1 = eng_t1.generate_fused(prompt, max_new_tokens=gen_tokens,
                                       eos_token_id=-1)
        accs_t1.append(st1["accept_per_round"])
        if i > 0:     # first pair pays compiles
            tps_spec.append(st["new_tokens"] / dt_sp)
            tps_ar.append(len(ar[prompt_len:]) / dt_ar)
        log(f"eval {i}: accept {st['accept_per_round']:.2f} "
            f"T1-accept {st1['accept_per_round']:.2f} lossless={ok}")
    res.update({
        "accept_per_round_greedy": round(float(np.mean(accs)), 3),
        "accept_per_round_t1": round(float(np.mean(accs_t1)), 3),
        "greedy_lossless": f"{n_eval-losses}/{n_eval}",
        "ar_match_frac": round(float(np.mean(match)), 4),
        "spec_tok_s": round(float(np.mean(tps_spec)), 2),
        "ar_tok_s": round(float(np.mean(tps_ar)), 2),
        "eval_dtype": "float32",
        "protocol": "train_struct_base.py: structured corpus (synth.py "
                    "seed 0) -> base trained from scratch -> STREAMING "
                    "teacher-forced distillation (fresh seeds 30000+, one "
                    "pass each — memorization impossible) -> eval prompts "
                    "seed 2; engine eval f32/highest-precision"})
    return params, draft, res


def main():
    scale = os.environ.get("STRUCT_SCALE", "mid")
    import jax
    if scale in ("tiny", "tiny8"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/tmp/flowspec_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    params, draft, res = run(scale)
    out = os.environ.get("STRUCT_OUT", os.path.join(
        _ROOT, "checkpoints", f"struct_{scale}.json"))
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    # weights go to /tmp (a ~340MB mid-scale base doesn't belong in git;
    # the corpus + training are deterministic-by-seed and re-runnable)
    save_base(params, f"/tmp/struct_base_{scale}.npz")
    print(f"report: {out}; weights: /tmp/struct_base_{scale}.npz")


if __name__ == "__main__":
    main()
