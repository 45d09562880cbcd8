"""Acceptance: greedy prefix-match and stochastic rejection sampling.

Reference: `evaluate_posterior` (pipeline_utils.py:1345-1433). Two key
departures for TPU:

1. We operate on per-*node* logits ``(N_cap, V)`` instead of the reference's
   gathered ``(leaves, depth, V)`` tensor — at static capacities the gathered
   form would be ~100x larger. ``logits[n]`` is the base model's next-token
   distribution *at* tree node n; the reference's ``logits[l, d]`` is exactly
   ``node_logits[retrieve[l, d]]``.
2. The stochastic path's sequential python loops (depth loop + sibling-set
   loop with renormalization) become nested ``lax.scan``s with a carried
   residual distribution; dedup of sibling tokens uses a first-occurrence
   precomputation instead of a python set (same acceptance distribution; RNG
   is jax PRNG rather than torch global RNG, so per-trace draws differ but the
   sampling law matches).

Return convention matches the reference: ``accept_len`` counts accepted tree
tokens *beyond the root* (callers add 1 for the root, stage_ea_model.py:646).
``sample_p`` is the (V,) distribution to sample the next root token from.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from flowspec_tpu.config import SamplingConfig
from flowspec_tpu.tree.sampling import warp_logits
from flowspec_tpu.tree.types import TokenTree


class PosteriorResult(NamedTuple):
    best_leaf: jax.Array     # () int32 — row into retrieve
    accept_len: jax.Array    # () int32 — accepted tokens beyond root
    sample_p: jax.Array      # (V,) float32 — next-token distribution


def evaluate_posterior_greedy(node_logits: jax.Array,
                              tree: TokenTree) -> PosteriorResult:
    """Greedy longest-prefix-match (ref pipeline_utils.py:1367-1382).

    A path entry at depth d is accepted iff its token equals the argmax of the
    logits at its parent (the node at depth d-1 on the same path).
    """
    node_cap = tree.node_cap
    node_argmax = jnp.argmax(node_logits, axis=-1).astype(jnp.int32)   # (N,)

    cand = tree.candidates()                        # (L, D)
    safe_ri = jnp.clip(tree.retrieve, 0, node_cap - 1)
    parent_pred = node_argmax[safe_ri]              # (L, D): pred of node at [l,d]
    # match at position d (>=1): cand[l, d] == prediction at node retrieve[l, d-1]
    match = cand[:, 1:] == parent_pred[:, :-1]
    match &= tree.retrieve[:, 1:] >= 0
    accept_lens = jnp.cumprod(match.astype(jnp.int32), axis=1).sum(axis=1)
    accept_lens = jnp.where(tree.leaf_valid(), accept_lens, -1)

    accept_len = jnp.maximum(jnp.max(accept_lens), 0).astype(jnp.int32)
    best = jnp.where(accept_len == 0, 0,
                     jnp.argmax(accept_lens).astype(jnp.int32))
    # Next-token distribution: probs at the last accepted node
    # (= ref logits[best, accept_len], a logits row; we return softmax probs).
    last_node = jnp.clip(tree.retrieve[best, accept_len], 0, node_cap - 1)
    sample_p = jax.nn.softmax(node_logits[last_node].astype(jnp.float32))
    return PosteriorResult(best, accept_len, sample_p)


def evaluate_posterior_stochastic(node_logits: jax.Array, tree: TokenTree,
                                  cfg: SamplingConfig, key: jax.Array,
                                  max_trials: int | None = None) -> PosteriorResult:
    """EAGLE/SpecInfer-style sequential rejection sampling
    (ref pipeline_utils.py:1384-1433).

    At each depth along the accepted path: iterate distinct sibling tokens in
    leaf-row order; accept token x with prob p(x) (draft q == 1, matching the
    reference's ``acp = px / qx`` with ``qx = 1.0``); on rejection zero p(x)
    and renormalize. If the final depth ends in rejection(s) with no
    acceptance, the *residual* distribution is returned for sampling.
    """
    node_cap, vocab = node_logits.shape
    leaf_cap, depth_cap = tree.retrieve.shape
    # Trials per depth are bounded by the distinct child tokens of one node.
    # Callers that know the beam width should pass ~4*top_k (covers several
    # merge generations); the default of leaf_cap is exact but slower.
    if max_trials is None:
        max_trials = leaf_cap
    cand = tree.candidates()
    leaf_valid = tree.leaf_valid()

    warped = warp_logits(node_logits.astype(jnp.float32), cfg)

    class Carry(NamedTuple):
        active: jax.Array        # () bool — still descending
        accept_len: jax.Array    # () int32 — accepted beyond root
        best: jax.Array          # () int32
        is_eq: jax.Array         # (L,) bool — rows matching accepted prefix
        gtp_last: jax.Array      # (V,) f32 — residual distribution at last depth
        reject_no_accept: jax.Array  # () bool — last depth ended rejected
        key: jax.Array

    def depth_step(c: Carry, i):
        # Node at depth i-1 on the accepted path = retrieve[fi, i-1] where fi
        # is any row matching the prefix (ref uses the first).
        fi = jnp.argmax(c.is_eq).astype(jnp.int32)
        path_node = jnp.clip(tree.retrieve[fi, i - 1], 0, node_cap - 1)
        gtp0 = jax.nn.softmax(warped[path_node])

        # First-occurrence dedup of sibling tokens among matching rows.
        x = cand[:, i]                                       # (L,)
        eligible = c.is_eq & (x >= 0) & leaf_valid & (tree.retrieve[:, i] >= 0)
        same_tok = (x[None, :] == x[:, None])
        earlier = (jnp.arange(leaf_cap)[None, :] < jnp.arange(leaf_cap)[:, None])
        dup = jnp.any(same_tok & earlier & eligible[None, :], axis=1)
        trial = eligible & ~dup                              # rows to try, in order

        # Compact the (few — at most one per distinct sibling token, i.e. the
        # beam width) trial rows to the front and scan only those. Sequential
        # rejection with per-step renormalization is algebraically
        # p(x_m) / (1 - sum_{j<m} p(x_j)) because trial tokens are distinct,
        # so the carry is the scalar rejected mass, not the (V,) distribution.
        m_trials = min(max_trials, leaf_cap)
        order = jnp.argsort(~trial, stable=True)
        t_rows = order[:m_trials]
        t_valid = trial[t_rows]
        t_tok = jnp.where(t_valid, x[t_rows], 0)
        p_t = jnp.where(t_valid, gtp0[jnp.clip(t_tok, 0, vocab - 1)], 0.0)

        keys = jax.random.split(c.key, m_trials + 1)
        step_key, row_keys = keys[0], keys[1:]

        class Inner(NamedTuple):
            accepted: jax.Array   # () bool
            best: jax.Array       # () int32
            tok: jax.Array        # () int32
            removed: jax.Array    # () f32 — rejected probability mass

        def row_step(s: Inner, inp):
            row, tok, p, valid, rk = inp
            do = valid & ~s.accepted
            denom = jnp.maximum(1.0 - s.removed, 1e-30)
            r = jax.random.uniform(rk)
            acc = do & (r * denom <= p)
            rej = do & ~acc
            return Inner(accepted=s.accepted | acc,
                         best=jnp.where(acc, row, s.best),
                         tok=jnp.where(acc, tok, s.tok),
                         removed=s.removed + jnp.where(rej, p, 0.0)), rej

        init = Inner(jnp.asarray(False), c.best, jnp.asarray(-1, jnp.int32),
                     jnp.zeros(()))
        inner, step_rej = jax.lax.scan(
            row_step, init,
            (t_rows.astype(jnp.int32), t_tok, p_t, t_valid, row_keys))
        rejected_any = jnp.any(step_rej)
        # Residual distribution: rejected tokens zeroed, renormalized.
        rej_pos = jnp.where(step_rej, jnp.clip(t_tok, 0, vocab - 1), vocab)
        gtp_res = gtp0.at[rej_pos].set(0.0, mode="drop")
        gtp_res = gtp_res / jnp.maximum(gtp_res.sum(), 1e-30)

        step_active = c.active & (i == c.accept_len + 1) & jnp.any(eligible)
        accepted = step_active & inner.accepted
        new_is_eq = jnp.where(accepted, c.is_eq & (x == inner.tok), c.is_eq)
        return Carry(
            active=c.active & accepted,
            accept_len=jnp.where(accepted, c.accept_len + 1, c.accept_len),
            best=jnp.where(accepted, inner.best.astype(jnp.int32), c.best),
            is_eq=new_is_eq,
            gtp_last=jnp.where(step_active, gtp_res, c.gtp_last),
            reject_no_accept=jnp.where(
                step_active, rejected_any & ~inner.accepted,
                c.reject_no_accept),
            key=step_key,
        ), None

    is_eq0 = leaf_valid  # every valid row shares the root
    init = Carry(active=jnp.asarray(True), accept_len=jnp.asarray(0, jnp.int32),
                 best=jnp.asarray(0, jnp.int32), is_eq=is_eq0,
                 gtp_last=jnp.zeros((vocab,), jnp.float32),
                 reject_no_accept=jnp.asarray(False), key=key)
    out, _ = jax.lax.scan(depth_step, init,
                          jnp.arange(1, depth_cap, dtype=jnp.int32))

    # sample_p: residual distribution if the walk ended on rejections,
    # otherwise the (warped) distribution at the last accepted node.
    last_node = jnp.clip(tree.retrieve[out.best, out.accept_len], 0,
                         node_cap - 1)
    p_node = jax.nn.softmax(warped[last_node])
    use_residual = out.reject_no_accept & \
        (out.accept_len < jnp.asarray(depth_cap - 1, jnp.int32))
    sample_p = jnp.where(use_residual, out.gtp_last, p_node)
    return PosteriorResult(out.best, out.accept_len, sample_p)
