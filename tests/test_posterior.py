"""Acceptance rule vs oracle (ref pipeline_utils.py:1345-1433)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowspec_tpu.config import SamplingConfig
from tests.helpers import (
    CAPS, to_token_tree,
    j_greedy as evaluate_posterior_greedy,
    j_stochastic as evaluate_posterior_stochastic,
)
from tests.oracle import (
    NaiveTree, random_tree, evaluate_posterior_greedy as np_greedy,
)

VOCAB = 50


def _logits_for(t, rng, bias_path=None, strength=6.0):
    """Random node logits; optionally biased to follow a token path."""
    lg = rng.normal(size=(CAPS["node_cap"], VOCAB)).astype(np.float32)
    if bias_path is not None:
        for node, tok in bias_path:
            lg[node, tok] += strength
    return lg


def test_greedy_matches_oracle_random():
    rng = np.random.default_rng(1)
    for trial in range(30):
        t = random_tree(rng, int(rng.integers(2, 60)), vocab=VOCAB)
        tt = to_token_tree(t)
        lg = _logits_for(t, rng)
        best, alen, p = np_greedy(lg[:t.n], t)
        got = evaluate_posterior_greedy(jnp.asarray(lg), tt)
        assert int(got.accept_len) == alen
        assert int(got.best_leaf) == best
        np.testing.assert_allclose(np.asarray(got.sample_p)[:VOCAB], p,
                                   rtol=1e-5, atol=1e-6)


def test_greedy_full_acceptance():
    """Logits rigged so the deepest chain is always argmax-consistent."""
    rng = np.random.default_rng(2)
    t = random_tree(rng, 40, vocab=VOCAB)
    ri = t.retrieve()
    depths = (ri >= 0).sum(1)
    leaf = int(np.argmax(depths))
    path = [n for n in ri[leaf] if n >= 0]
    # each node on the path predicts the next node's token
    bias = [(path[i], t.tokens[path[i + 1]]) for i in range(len(path) - 1)]
    lg = _logits_for(t, rng, bias_path=bias, strength=50.0)
    got = evaluate_posterior_greedy(jnp.asarray(lg), to_token_tree(t))
    assert int(got.accept_len) == len(path) - 1
    got_path = np.asarray(to_token_tree(t).retrieve)[int(got.best_leaf)]
    assert [int(x) for x in got_path if x >= 0][:len(path)] == path


def test_greedy_zero_acceptance():
    """Root predicts a token no child carries -> accept_len 0, sample from root."""
    rng = np.random.default_rng(3)
    t = random_tree(rng, 20, vocab=VOCAB)
    child_toks = {t.tokens[i] for i in range(1, t.n) if t.parents[i] == 0}
    missing = next(x for x in range(VOCAB) if x not in child_toks)
    lg = _logits_for(t, rng, bias_path=[(0, missing)], strength=50.0)
    got = evaluate_posterior_greedy(jnp.asarray(lg), to_token_tree(t))
    assert int(got.accept_len) == 0
    assert int(np.asarray(got.sample_p).argmax()) == missing


def test_stochastic_greedy_limit():
    """With a near-deterministic target distribution, stochastic acceptance
    must accept exactly the argmax-consistent prefix (any temperature)."""
    rng = np.random.default_rng(4)
    for trial in range(10):
        t = random_tree(rng, 40, vocab=VOCAB)
        lg = _logits_for(t, rng) * 30.0     # near-one-hot softmax
        tt = to_token_tree(t)
        cfg = SamplingConfig(temperature=1.0)
        ref_best, ref_len, _ = np_greedy(lg[:t.n], t)
        got = evaluate_posterior_stochastic(
            jnp.asarray(lg), tt, cfg, jax.random.key(trial))
        assert int(got.accept_len) == ref_len
        # same accepted token prefix (leaf row may differ on ties)
        ri = np.asarray(tt.retrieve)
        cand = np.asarray(tt.candidates())
        assert (cand[int(got.best_leaf), :ref_len + 1] ==
                cand[ref_best, :ref_len + 1]).all()


def test_stochastic_acceptance_rate_uniformish():
    """Statistical check: acceptance probability of a single child token x
    equals p(x) under the target distribution (q == 1 rule, ref :1414)."""
    # root with one child carrying token 0; target P(token 0) controlled.
    t = NaiveTree([5, 0], [-1, 0])
    tt = to_token_tree(t)
    cfg = SamplingConfig(temperature=1.0)
    for p_target, seed in [(0.3, 0), (0.7, 1)]:
        lg = np.zeros((CAPS["node_cap"], VOCAB), np.float32)
        lg[0, 0] = np.log(p_target)
        lg[0, 1] = np.log(1 - p_target)
        lg[0, 2:] = -40.0
        lg[1, :] = 0.0
        accepts = 0
        trials = 400
        keys = jax.random.split(jax.random.key(seed), trials)
        f = jax.jit(lambda k: evaluate_posterior_stochastic(
            jnp.asarray(lg), tt, cfg, k).accept_len)
        for k in keys:
            accepts += int(f(k))
        rate = accepts / trials
        assert abs(rate - p_target) < 0.08, (p_target, rate)


def test_stochastic_residual_distribution():
    """On rejection the returned sample_p must be the renormalized residual
    with the rejected token zeroed (ref :1419-1421)."""
    t = NaiveTree([5, 0], [-1, 0])   # single child, token 0
    tt = to_token_tree(t)
    cfg = SamplingConfig(temperature=1.0)
    lg = np.zeros((CAPS["node_cap"], VOCAB), np.float32)
    lg[0, 0] = np.log(0.05)          # child token: tiny prob -> usually rejected
    lg[0, 1] = np.log(0.60)
    lg[0, 2] = np.log(0.35)
    lg[0, 3:] = -40.0
    out = evaluate_posterior_stochastic(jnp.asarray(lg), tt, cfg,
                                        jax.random.key(42))
    if int(out.accept_len) == 0:
        p = np.asarray(out.sample_p)
        assert p[0] < 1e-6
        np.testing.assert_allclose(p[1], 0.60 / 0.95, rtol=1e-3)
        np.testing.assert_allclose(p[2], 0.35 / 0.95, rtol=1e-3)


def test_root_only_tree():
    t = NaiveTree([5], [-1])
    tt = to_token_tree(t)
    lg = np.random.default_rng(0).normal(size=(CAPS["node_cap"], VOCAB)) \
        .astype(np.float32)
    got = evaluate_posterior_greedy(jnp.asarray(lg), tt)
    assert int(got.accept_len) == 0
    np.testing.assert_allclose(
        np.asarray(got.sample_p)[:VOCAB], _softmax_np(lg[0, :VOCAB]), rtol=1e-5)
    got_s = evaluate_posterior_stochastic(
        jnp.asarray(lg), tt, SamplingConfig(temperature=1.0),
        jax.random.key(0))
    assert int(got_s.accept_len) == 0


def _softmax_np(x):
    e = np.exp(x - x.max())
    return e / e.sum()
