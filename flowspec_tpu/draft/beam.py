"""Beam-search draft-tree generation (the reference's `topK_genrate`).

Reference: eagle/cnets.py:700-991. The python depth loop becomes a `lax.scan`
whose carry is the beam frontier (tokens, parent hiddens, cumulative scores,
flat candidate ids, ancestor-mask rows); every level forwards the K frontier
nodes through the single draft layer against the draft KV cache and emits K*K
candidates (per-row top-k tokens with cumulative log-probs). Incremental
expansion (`expand_last`, eagle/cnets.py:1439-1708) reuses the same scan body
starting from the saved frontier, then re-selects with the previous node set
force-included — the merged tree then appends exactly the new nodes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from flowspec_tpu.config import ModelConfig, TreeConfig
from flowspec_tpu.draft.eagle import (
    EagleParams, draft_view, eagle_layer, fuse, project_out,
)
from flowspec_tpu.models.kv_cache import KVCache
from flowspec_tpu.tree.build import build_tree, select_topn
from flowspec_tpu.tree.types import TokenTree


def head_logits(x: jax.Array, head) -> jax.Array:
    """(..., H) @ head -> (..., V) float32. `head` may be an Int8Tensor:
    the beam only scores draft *proposals*, so an int8 head halves the
    ~0.26GB/level HBM read at 7B while verification keeps the exact bf16
    head (greedy losslessness is proposal-independent)."""
    from flowspec_tpu.ops.quant import Int8Tensor
    if isinstance(head, Int8Tensor):
        y = jnp.einsum("...h,hv->...v", x, head.q.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        return y * head.scale
    return jnp.einsum("...h,hv->...v", x, head,
                      preferred_element_type=jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BeamState:
    """Frontier after `level` beam levels; frontier nodes are *not yet* in the
    draft KV (they are written by the next scan step, at beam block `level`)."""
    tokens: jax.Array      # (K,) int32
    hidden: jax.Array      # (K, H) — draft output hidden of each node's parent
    scores: jax.Array      # (K,) f32 cumulative logp
    flat_ids: jax.Array    # (K,) int32 candidate flat ids
    mask: jax.Array        # (K, LVLS*K) bool — ancestors among beam blocks,
                           #   excluding self (self bit added at forward time)
    level: jax.Array       # () int32 — next beam block index
    ctx_end: jax.Array     # () int32 — draft KV length before beam region
    pos0: jax.Array        # () int32 — rope position of beam level 0
    # Accumulated candidate pool (static M = K + max_levels*K^2):
    cand_tokens: jax.Array   # (M,)
    cand_scores: jax.Array   # (M,)
    cand_parents: jax.Array  # (M,)
    cand_valid: jax.Array    # (M,) bool
    selected: jax.Array      # (M,) bool — set after build (for expansion)


def _beam_step(p: EagleParams, head: jax.Array, cache_k, cache_v,
               state: BeamState, cfg: ModelConfig, top_k: int,
               max_levels: int, inv_tau: float = 1.0):
    """Forward the frontier at beam block `state.level`, emit K*K candidates,
    select the next frontier. Returns (state', cache_k', cache_v')."""
    k_beam = top_k
    s_max = cache_k.shape[2]
    l = state.level

    # --- forward frontier through the draft layer
    write_start = state.ctx_end + l * k_beam
    x = fuse(p, state.tokens[None], state.hidden[None])
    positions = jnp.full((k_beam,), state.pos0 + l, jnp.int32)

    eye_l = (jnp.arange(max_levels * k_beam, dtype=jnp.int32)[None, :] ==
             (l * k_beam + jnp.arange(k_beam, dtype=jnp.int32))[:, None])
    fwd_mask = state.mask | eye_l                                # (K, LVLS*K)
    j = jnp.arange(s_max, dtype=jnp.int32)[None, :]
    beam_col = jnp.clip(j - state.ctx_end, 0, max_levels * k_beam - 1)
    beam_part = jnp.take_along_axis(
        fwd_mask, jnp.broadcast_to(beam_col, (k_beam, s_max)), axis=1)
    ok = jnp.where(j < state.ctx_end, True, beam_part)
    ok = ok & (j < state.ctx_end + max_levels * k_beam)
    bias = jnp.where(ok, 0.0, -1e9).astype(jnp.float32)

    out, cache_k, cache_v = eagle_layer(
        x, p, cache_k, cache_v, positions, bias, write_start,
        draft_view(p, cfg))
    out = project_out(p, out, state.hidden[None])[0]              # (K, H)

    # --- candidates: per-row top-k next tokens with cumulative scores.
    # head_topk = top-k of log_softmax in one fused weight pass (Pallas
    # kernel on TPU int8 heads, exact XLA fallback elsewhere — see
    # ops/head_topk.py; the unfused chain was the beam's dominant cost).
    # score_temperature scales the hidden before the head — logits are
    # linear in it, so this is exactly log_softmax(logits / tau); per-row
    # top-k order is invariant (see TreeConfig.score_temperature).
    from flowspec_tpu.ops.head_topk import head_topk
    row_lp, row_tok = head_topk(out * inv_tau, head, k_beam)      # (K, K)
    cu = row_lp + state.scores[:, None]                           # (K, K)

    flat_base = k_beam + l * k_beam * k_beam
    cand_tok = row_tok.reshape(-1).astype(jnp.int32)
    cand_sc = cu.reshape(-1)
    cand_par = jnp.repeat(state.flat_ids, k_beam)

    m = state.cand_tokens.shape[0]
    ct = jax.lax.dynamic_update_slice(state.cand_tokens, cand_tok, (flat_base,))
    cs = jax.lax.dynamic_update_slice(state.cand_scores, cand_sc, (flat_base,))
    cp = jax.lax.dynamic_update_slice(state.cand_parents, cand_par, (flat_base,))
    cv = state.cand_valid | (
        (jnp.arange(m) >= flat_base) & (jnp.arange(m) < flat_base + k_beam ** 2))

    # --- next frontier: global top-k over the K*K candidates
    top_sc, sel = jax.lax.top_k(cand_sc, k_beam)
    b = sel // k_beam
    new_state = BeamState(
        tokens=cand_tok[sel],
        hidden=out[b],
        scores=top_sc,
        flat_ids=flat_base + sel,
        mask=fwd_mask[b],
        level=l + 1,
        ctx_end=state.ctx_end,
        pos0=state.pos0,
        cand_tokens=ct, cand_scores=cs, cand_parents=cp, cand_valid=cv,
        selected=state.selected,
    )
    return new_state, cache_k, cache_v


def _init_beam(p: EagleParams, head: jax.Array, root_hidden: jax.Array,
               ctx_end, pos0, tree_cfg: TreeConfig, max_levels: int):
    """Root expansion: top-k children of the root from its draft hidden
    (eagle/cnets.py:748-760)."""
    from flowspec_tpu.ops.head_topk import head_topk
    k_beam = tree_cfg.top_k
    m = k_beam + max_levels * k_beam * k_beam
    sc, tok = head_topk(root_hidden / tree_cfg.score_temperature, head,
                        k_beam)

    cand_tokens = jnp.full((m,), -1, jnp.int32).at[:k_beam].set(
        tok.astype(jnp.int32))
    cand_scores = jnp.full((m,), -jnp.inf, jnp.float32).at[:k_beam].set(sc)
    cand_parents = jnp.full((m,), -1, jnp.int32)
    cand_valid = jnp.arange(m) < k_beam

    h = root_hidden.shape[-1]
    return BeamState(
        tokens=tok.astype(jnp.int32),
        hidden=jnp.broadcast_to(root_hidden, (k_beam, h)).astype(root_hidden.dtype),
        scores=sc,
        flat_ids=jnp.arange(k_beam, dtype=jnp.int32),
        mask=jnp.zeros((k_beam, max_levels * k_beam), jnp.bool_),
        level=jnp.zeros((), jnp.int32),
        ctx_end=jnp.asarray(ctx_end, jnp.int32),
        pos0=jnp.asarray(pos0, jnp.int32),
        cand_tokens=cand_tokens, cand_scores=cand_scores,
        cand_parents=cand_parents, cand_valid=cand_valid,
        selected=jnp.zeros((m,), jnp.bool_),
    )


def topk_generate(p: EagleParams, head: jax.Array, cache: KVCache,
                  root_token: jax.Array, root_hidden: jax.Array,
                  tree_cfg: TreeConfig, cfg: ModelConfig,
                  num_select: int | None = None,
                  depth: int | None = None,
                  max_levels: int | None = None,
                  force_deep_path: bool = False):
    """Generate a fresh draft tree hanging off `root_token`.

    `root_hidden` (H,) is the draft layer's output for the context pair whose
    token input was the root (= `out_hidden[:, -1]` of draft_context_forward).
    `max_levels` reserves beam/candidate capacity for later expansion
    (default: depth + expand_depth). Returns (tree, beam_state, cache').
    The returned cache has the beam region written but `length` still at
    ctx_end — the reference's stable_kv semantics (eagle/cnets.py:737-744).
    """
    depth = depth if depth is not None else tree_cfg.depth
    num_select = (num_select if num_select is not None
                  else tree_cfg.total_tokens)   # 0 = root-only tree (ar mode)
    max_levels = max_levels or (tree_cfg.depth + tree_cfg.expand_depth)
    assert depth <= max_levels

    state = _init_beam(p, head, root_hidden, cache.length, cache.length,
                       tree_cfg, max_levels)

    def body(carry, _):
        st, ck, cv = carry
        st, ck, cv = _beam_step(p, head, ck, cv, st, cfg, tree_cfg.top_k,
                                max_levels,
                                inv_tau=1.0 / tree_cfg.score_temperature)
        return (st, ck, cv), None

    (state, ck, cv), _ = jax.lax.scan(
        body, (state, cache.k[0], cache.v[0]), None, length=depth)

    sel_force = None
    if force_deep_path and num_select > 0:
        # SYNTHETIC-ACCEPTANCE BENCH MODE support (EngineConfig.
        # force_accept): random-weight beam scores decay ~uniformly per
        # level, so plain top-N keeps shallow nodes and the deepest
        # selected path saturates around 3 — force the best final-frontier
        # node's full chain into the tree so forced acceptance can reach
        # `depth` tokens/round. Trees stay valid (ancestor-closed, within
        # num_select); with trained drafts this flag is never set.
        m = state.cand_tokens.shape[0]
        i_m = jnp.arange(m, dtype=jnp.int32)

        def walk(carry, _):
            mask, node = carry
            mask = mask | (i_m == node)
            nxt = jnp.where(node >= 0,
                            state.cand_parents[jnp.clip(node, 0, m - 1)],
                            -1)
            return (mask, nxt), None

        (sel_force, _), _ = jax.lax.scan(
            walk, (jnp.zeros((m,), jnp.bool_), state.flat_ids[0]), None,
            length=depth)
        num_select = max(num_select - depth, 1)   # keep total <= node_cap
    sel = select_topn(state.cand_scores, state.cand_valid, num_select,
                      force_include=sel_force)
    tree = build_tree(state.cand_tokens, state.cand_scores,
                      state.cand_parents, sel, root_token,
                      tree_cfg.node_cap, tree_cfg.leaf_cap,
                      tree_cfg.depth_cap, sort_score=tree_cfg.sort_score)
    state = dataclasses.replace(state, selected=sel)
    new_cache = KVCache(k=ck[None], v=cv[None], length=cache.length)
    return tree, state, new_cache


def expand_tree(p: EagleParams, head: jax.Array, cache: KVCache,
                state: BeamState, root_token: jax.Array,
                tree_cfg: TreeConfig, cfg: ModelConfig,
                extra_depth: int, expand_size: int,
                max_levels: int | None = None):
    """Continue the saved beam `extra_depth` more levels and build the
    *superset* tree: previously selected nodes force-included + top
    `expand_size` new candidates (ref `expand_last`, eagle/cnets.py:1439-1708,
    which picks `expand_size` nodes not previously selected, :1521-1535).

    Callers merge the result onto the in-flight tree; because the old node
    set is a subset, the merge appends exactly the new nodes (the invariant
    the reference asserts at :1650-1676). Returns (tree, state', cache').
    """
    max_levels = max_levels or (tree_cfg.depth + tree_cfg.expand_depth)

    def body(carry, _):
        st, ck, cv = carry
        st, ck, cv = _beam_step(p, head, ck, cv, st, cfg, tree_cfg.top_k,
                                max_levels,
                                inv_tau=1.0 / tree_cfg.score_temperature)
        return (st, ck, cv), None

    (state2, ck, cv), _ = jax.lax.scan(
        body, (state, cache.k[0], cache.v[0]), None, length=extra_depth)

    new_sel = select_topn(state2.cand_scores, state2.cand_valid, expand_size,
                          force_include=state.selected)
    tree = build_tree(state2.cand_tokens, state2.cand_scores,
                      state2.cand_parents, new_sel, root_token,
                      tree_cfg.node_cap, tree_cfg.leaf_cap,
                      tree_cfg.depth_cap, sort_score=tree_cfg.sort_score)
    state2 = dataclasses.replace(state2, selected=new_sel)
    new_cache = KVCache(k=ck[None], v=cv[None], length=cache.length)
    return tree, state2, new_cache
