"""Realism anchor for earned acceptance: the structured-base pipeline.

The bench base is random-weight (no checkpoints in this environment), so
its earned-acceptance numbers carry two artifacts the ROADMAP documents:
greedy attractors inflate acceptance, and a flat softmax pins T=1
acceptance at ~1. tools/train_struct_base.py closes the gap by TRAINING a
base (through this repo's own models/llama.py stack) on a synthetic corpus
with learnable-but-partial structure, then distilling a thin draft on its
rollouts — the reference's evaluation shape (real base -> EAGLE draft ->
measured mean accepted length, reference eval/run_pipe_eval.py:348-360)
reproduced end to end with no external weights.

This test runs the WHOLE pipeline at tiny scale on CPU (~3-4 min, the
longest test in the suite): corpus -> base training -> generalization
check vs the Bayes oracle -> rollout distillation -> engine evaluation.
All seeds are fixed and CPU XLA is deterministic, so thresholds sit just
under the measured values.
"""

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_struct_corpus_is_deterministic_and_predictable():
    from flowspec_tpu.eval.synth import (
        gen_struct_corpus, oracle_next_token_dist)
    x = gen_struct_corpus(24, 96, vocab=512, seed=0, n_classes=16,
                          copy_dist=8)
    x2 = gen_struct_corpus(24, 96, vocab=512, seed=0, n_classes=16,
                           copy_dist=8)
    assert np.array_equal(x, x2)
    # different sampling seed, same language tables -> different tokens
    y = gen_struct_corpus(24, 96, vocab=512, seed=1, n_classes=16,
                          copy_dist=8)
    assert not np.array_equal(x, y)

    # the Bayes oracle must beat the unigram top-1 by a wide margin:
    # that margin is exactly the learnable structure the base trains on
    rng = np.random.default_rng(0)
    hit = 0
    n = 300
    for _ in range(n):
        r = rng.integers(0, x.shape[0])
        t = rng.integers(9, x.shape[1])
        p = oracle_next_token_dist(x[r], t, 512, n_classes=16, copy_dist=8)
        hit += int(np.argmax(p) == x[r, t])
    vals, cnts = np.unique(x, return_counts=True)
    unigram_top1 = cnts.max() / x.size
    assert hit / n > 0.30, hit / n
    assert unigram_top1 < 0.12, unigram_top1


def test_struct_base_pipeline_earns_acceptance():
    """Full tiny-scale pipeline. Measured on CPU (deterministic seeds):
    base held-out top1 0.112 (unigram ~0.06, Bayes 0.398); STREAMING
    distillation (fresh data every pool — memorization impossible, see
    distill_draft) reaches held-out top1-agree 0.268 with selected
    w_out alpha 0.75 (> 0: the learned delta GENERALIZES — on the random
    bench base alpha selection degenerates to 0); greedy accept/round
    1.54 with 6/6 lossless in the f32 engine; T=1 accept 1.14 (> 1: real
    rejection-sampling acceptance, impossible on the random base's flat
    softmax)."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import train_struct_base as tsb
    _params, _draft, res = tsb.run("tiny", log=lambda *a, **k: None)

    # the base learned the structure, not the sequences
    assert res["base_holdout_top1"] >= 0.09, res
    assert res["bayes_oracle_top1"] >= 0.30, res
    # the distilled delta generalizes (data is all-fresh by construction)
    assert res["w_out_alpha"] > 0, res
    assert res["holdout_top1_agree"] >= 0.20, res
    # earned acceptance: greedy and stochastic both above 1
    assert res["accept_per_round_greedy"] >= 1.40, res
    assert res["accept_per_round_t1"] >= 1.08, res
    ok, n = res["greedy_lossless"].split("/")
    assert int(ok) >= int(n) - 1, res
