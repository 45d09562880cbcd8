"""Distill a tiny EAGLE draft against a tiny random base model.

Every throughput number in this environment runs at WORST-CASE acceptance
(1 committed token/round): there are no pretrained checkpoints, so the
random draft never agrees with the random base. This tool earns real
acceptance instead of synthesizing it (BENCH_FORCE_ACCEPT): it trains the
draft the way EAGLE is trained (eagle paper / reference eagle/cnets.py
consumes a pretrained one) — regress the base's next final-norm hidden and
match the base's next-token distribution through the shared lm_head — on
the base model's own greedy rollouts (the exact distribution the decode
loop visits) plus teacher-forced random contexts (the prompt regime).

Outputs tests/fixtures/tiny_draft_trained.npz; tests/test_trained_draft.py
loads it and asserts the engine commits >1 token/round end-to-end while
staying lossless vs AR. Run: python tools/train_tiny_draft.py
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import numpy as np


VOCAB = 64
SEQ = 64
N_ROLLOUTS = 192
N_RANDOM = 64
STEPS = 3000
BATCH = 32
HIDDEN_W = 1.0
CE_W = 0.3
# TINY_LAYERS=8 trains a fixture for the 8-stage multichip dryrun gate
# (1 layer per stage), so the pipeline's prune/merge/none_expand paths run
# at real multi-token commits there (r2 verdict #8); default 2 is the
# single-chip test fixture.
N_LAYERS = int(os.environ.get("TINY_LAYERS", "2"))


def tiny_cfg():
    from flowspec_tpu.config import ModelConfig
    mc = ModelConfig.tiny(vocab_size=VOCAB, n_layers=N_LAYERS)
    return type(mc)(**{**mc.__dict__, "dtype": "float32"})


def build_models():
    import jax
    import jax.numpy as jnp
    from flowspec_tpu.draft.eagle import init_eagle_params
    from flowspec_tpu.models.llama import init_llama_params

    mc = tiny_cfg()
    base = init_llama_params(jax.random.key(0), mc, dtype=jnp.float32)
    draft0 = init_eagle_params(jax.random.key(9), mc, embed=base.embed,
                               dtype=jnp.float32)
    return mc, base, draft0


def base_teacher_forward(base, tokens, mc):
    """tokens (B, T) -> final-norm hiddens (B, T, H) — the quantity the
    engine feeds the draft (pair_hidden = normed[path], engine.py)."""
    import jax
    import jax.numpy as jnp
    from flowspec_tpu.models import model_forward
    from flowspec_tpu.models.bias import prefill_bias
    from flowspec_tpu.models.kv_cache import init_kv_cache
    from flowspec_tpu.models.llama import embed_tokens, final_hidden

    t = tokens.shape[1]

    def one(seq):
        cache = init_kv_cache(mc.num_hidden_layers, 1,
                              mc.num_key_value_heads, t, mc.head_dim_,
                              jnp.float32)
        hidden = embed_tokens(base, seq[None])
        bias = prefill_bias(jnp.zeros((), jnp.int32), t, t)
        pos = jnp.arange(t, dtype=jnp.int32)
        out, _ = model_forward(base, cache, hidden, pos, bias,
                               jnp.zeros((), jnp.int32), mc)
        return final_hidden(base, out, mc)[0]

    return jax.lax.map(one, tokens)


def greedy_rollouts(base, mc, key, n, seq_len, prompt_len=8):
    """(n, seq_len) int32 — base-model greedy continuations of random
    prompts: the exact sequence distribution the decode loop visits."""
    import jax
    import jax.numpy as jnp
    from flowspec_tpu.models import model_forward
    from flowspec_tpu.models.bias import prefill_bias
    from flowspec_tpu.models.kv_cache import init_kv_cache
    from flowspec_tpu.models.llama import (
        embed_tokens, final_hidden, lm_head_logits,
    )

    prompts = jax.random.randint(key, (n, prompt_len), 0, VOCAB, jnp.int32)

    def rollout(prompt):
        cache = init_kv_cache(mc.num_hidden_layers, 1,
                              mc.num_key_value_heads, seq_len, mc.head_dim_,
                              jnp.float32)
        hidden = embed_tokens(base, prompt[None])
        bias = prefill_bias(jnp.zeros((), jnp.int32), prompt_len, seq_len)
        pos = jnp.arange(prompt_len, dtype=jnp.int32)
        out, cache = model_forward(base, cache, hidden, pos, bias,
                                   jnp.zeros((), jnp.int32), mc)
        logits = lm_head_logits(base, final_hidden(base, out, mc))[0, -1]
        tok0 = jnp.argmax(logits).astype(jnp.int32)
        buf = jnp.zeros((seq_len,), jnp.int32)
        buf = jax.lax.dynamic_update_slice(buf, prompt, (0,))

        def step(carry, i):
            buf, cache, tok = carry
            buf = buf.at[i].set(tok)
            b = prefill_bias(i, 1, seq_len)
            out, cache = model_forward(
                base, cache, embed_tokens(base, tok[None][None]),
                i[None], b, i, mc)
            cache = cache.with_length(i + 1)
            nxt = jnp.argmax(lm_head_logits(
                base, final_hidden(base, out, mc))[0, 0]).astype(jnp.int32)
            return (buf, cache, nxt), None

        (buf, _, _), _ = jax.lax.scan(
            step, (buf, cache, tok0),
            jnp.arange(prompt_len, seq_len, dtype=jnp.int32))
        return buf

    return jax.lax.map(rollout, prompts)


def draft_forward(draft, tokens, hidden, mc):
    """Teacher-forced draft pass over pairs (token_{i+1}, hidden_i):
    tokens (B, T), hidden (B, T, H) -> draft out (B, T-1, H) approximating
    hidden[:, 1:]."""
    import jax
    import jax.numpy as jnp
    from flowspec_tpu.draft.eagle import eagle_layer, fuse

    t = tokens.shape[1] - 1
    x = fuse(draft, tokens[:, 1:], hidden[:, :-1])     # (B, T-1, H)
    pos = jnp.arange(t, dtype=jnp.int32)
    i = pos[:, None]
    j = pos[None, :]
    bias = jnp.where(j <= i, 0.0, -1e9).astype(jnp.float32)

    def one(x1):
        k = jnp.zeros((1, mc.num_key_value_heads, t, mc.head_dim_),
                      jnp.float32)
        v = jnp.zeros_like(k)
        out, _, _ = eagle_layer(x1[None], draft, k, v, pos, bias,
                                jnp.zeros((), jnp.int32), mc)
        return out[0]

    return jax.vmap(one)(x)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from flowspec_tpu.draft.eagle import EagleParams

    mc, base, draft0 = build_models()
    key = jax.random.key(42)
    k_roll, k_rand, k_train = jax.random.split(key, 3)

    print("building corpus...", flush=True)
    rolls = greedy_rollouts(base, mc, k_roll, N_ROLLOUTS, SEQ)
    rand = jax.random.randint(k_rand, (N_RANDOM, SEQ), 0, VOCAB, jnp.int32)
    tokens = jnp.concatenate([rolls, rand], axis=0)
    hiddens = base_teacher_forward(base, tokens, mc)
    print(f"corpus: {tokens.shape} tokens, hiddens {hiddens.shape}",
          flush=True)

    head = base.lm_head
    frozen_embed = draft0.embed

    def loss_fn(trainable, tok_b, hid_b):
        draft = EagleParams(embed=frozen_embed, **trainable)
        out = draft_forward(draft, tok_b, hid_b, mc)       # (B, T-1, H)
        tgt = hid_b[:, 1:]
        # huber on hiddens (EAGLE's smooth-l1 regression target)
        d = out - tgt
        ad = jnp.abs(d)
        hub = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5).mean()
        # CE against the base's next-token distribution via the SHARED head
        ld = (out @ head).astype(jnp.float32)
        lt = (tgt @ head).astype(jnp.float32)
        pt = jax.nn.softmax(lt, axis=-1)
        ce = -(pt * jax.nn.log_softmax(ld, axis=-1)).sum(-1).mean()
        return HIDDEN_W * hub + CE_W * ce, (hub, ce)

    trainable = {f: getattr(draft0, f) for f in
                 ("fc_w", "fc_b", "wq", "wk", "wv", "wo",
                  "w_gate", "w_up", "w_down", "post_ln")}
    sched = optax.cosine_decay_schedule(3e-3, STEPS, 0.05)
    opt = optax.adamw(sched, weight_decay=1e-4)
    opt_state = opt.init(trainable)

    @jax.jit
    def step(trainable, opt_state, tok_b, hid_b):
        (l, (hub, ce)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable, tok_b, hid_b)
        upd, opt_state = opt.update(g, opt_state, trainable)
        return optax.apply_updates(trainable, upd), opt_state, l, hub, ce

    n = tokens.shape[0]
    for it in range(STEPS):
        k = jax.random.fold_in(k_train, it)
        idx = jax.random.randint(k, (BATCH,), 0, n)
        trainable, opt_state, l, hub, ce = step(
            trainable, opt_state, tokens[idx], hiddens[idx])
        if it % 300 == 0 or it == STEPS - 1:
            print(f"step {it:5d} loss {float(l):.4f} "
                  f"huber {float(hub):.4f} ce {float(ce):.4f}", flush=True)

    draft = EagleParams(embed=frozen_embed, **trainable)

    # ---- evaluate end-to-end acceptance --------------------------------
    from flowspec_tpu.config import EngineConfig, SamplingConfig, TreeConfig
    from flowspec_tpu.runtime.engine import SpecEngine
    tc = TreeConfig(top_k=6, depth=5, total_tokens=24, expand_tokens=12,
                    expand_depth=2, node_cap=48, leaf_cap=48, depth_cap=10,
                    chunk_len=8)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_seq_len=256, prefill_chunk=16)
    eng = SpecEngine(base, draft, cfg)
    eng0 = SpecEngine(base, draft0, cfg)
    rng = np.random.default_rng(123)
    accs, accs0 = [], []
    for i in range(8):
        prompt = rng.integers(0, VOCAB, 8).tolist()
        ar, _ = eng.generate_ar(prompt, max_new_tokens=48, eos_token_id=-1)
        out, st = eng.generate(prompt, max_new_tokens=48, eos_token_id=-1)
        assert out == ar, (i, out, ar)
        accs.append(st["accept_per_round"])
        _, st0 = eng0.generate(prompt, max_new_tokens=48, eos_token_id=-1)
        accs0.append(st0["accept_per_round"])
    print(f"accept/round trained: {np.mean(accs):.3f} "
          f"(untrained: {np.mean(accs0):.3f}), lossless on 8/8 prompts",
          flush=True)

    out_path = os.path.join(_ROOT, "tests", "fixtures",
                            "tiny_draft_trained.npz" if N_LAYERS == 2
                            else f"tiny_draft_trained_l{N_LAYERS}.npz")
    np.savez_compressed(
        out_path,
        accept_per_round=np.mean(accs),
        **{f: np.asarray(getattr(draft, f)) for f in
           ("fc_w", "fc_b", "wq", "wk", "wv", "wo",
            "w_gate", "w_up", "w_down", "post_ln")})
    print(f"saved {out_path}", flush=True)


if __name__ == "__main__":
    main()
