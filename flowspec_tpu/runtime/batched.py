"""Batched + continuous-batching speculative decoding.

The reference is strictly batch-size-1 (eagle/kv_cache.py:91 asserts it;
BASELINE.json config 5 lists continuous batching as the target beyond it).
Here the whole per-request round (`_spec_round`) is pure over an EngineState
pytree, so batching is `jax.vmap` over stacked states — per-request KV
caches, trees, RNG and acceptance all vectorize, and a batched round is
bit-identical to B independent single-request rounds (tested).

Two APIs:
- generate_batch: fixed set of B requests, synchronized rounds, per-request
  stop tracking on host.
- serve: continuous batching at round granularity — B slots; when a request
  finishes, its slot is immediately re-prefilled with the next queued prompt
  while the other slots keep decoding.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flowspec_tpu.config import EngineConfig
from flowspec_tpu.draft.eagle import EagleParams
from flowspec_tpu.models.kv_cache import KVCache
from flowspec_tpu.models.llama import LlamaParams
from flowspec_tpu.runtime.engine import (
    EngineState, ServeCtx, SpecEngine, _spec_decode_loop, _spec_round,
)


def adapt_tree_for_batch(tree, batch_size: int):
    """Batch-adaptive speculation: shrink the per-lane draft tree as the
    batch grows. At T = B*nodes verify tokens the 7B matmuls leave the
    HBM-bound regime and go MXU-bound (PROFILE_batched_7b_int8.md), so
    wide per-lane trees stop being free — measured serve B=4 aggregate:
    61.0 tok/s at 96 nodes -> 83.3 at 48 -> 92.7 at 32. Greedy outputs
    are tree-size-invariant (losslessness is unaffected); only acceptance
    per round trades off, the same total_token tradeoff the reference
    tunes via tools/length_sweep.py:5-30."""
    import dataclasses
    if batch_size <= 1:
        return tree
    target = 48 if batch_size <= 3 else 32
    if tree.total_tokens + 1 <= target:
        return tree
    return dataclasses.replace(
        tree, total_tokens=target - 1,
        node_cap=min(tree.node_cap, target),
        leaf_cap=min(tree.leaf_cap, target))


OVERHEAD_ROUNDS = 2     # pause+resume host-boundary dispatches, in rounds


class ConversationStore:
    """Per-conversation lane snapshots for multi-turn serving (the exact
    EngineState a request finished with, lifted off its lane, plus the
    full token history). Turn N+1 of a stored conversation resumes from
    the snapshot and chain-prefills ONLY the new tokens — the serve-path
    twin of SpecEngine.resume_and_generate (the reference re-prefills the
    whole conversation every turn, eval/run_pipe_eval.py:200-320).

    Each snapshot holds a full lane KV allocation, so the store is LRU-
    capped: `max_items` (default 8) bounds device memory."""

    def __init__(self, max_items: int = 8):
        self.max_items = max_items
        self._d = {}            # conv_id -> {"state": ..., "history": [..]}

    def get(self, conv_id):
        if conv_id in self._d:
            self._d[conv_id] = self._d.pop(conv_id)    # refresh recency
            return self._d[conv_id]
        return None

    def put(self, conv_id, state, history):
        self._d.pop(conv_id, None)
        while len(self._d) >= self.max_items:
            self._d.pop(next(iter(self._d)))
        self._d[conv_id] = {"state": state,
                            "history": [int(t) for t in history]}

    def __len__(self):
        return len(self._d)

    def __contains__(self, conv_id):
        return conv_id in self._d

    def clone(self):
        """Shallow copy (entries share device snapshots — immutable jax
        arrays, so sharing is safe). Lets a caller run a THROWAWAY resume
        pass — e.g. warming the resumed-fill compile before timing an
        A/B — without the real store's recency/entries being touched."""
        c = ConversationStore(max_items=self.max_items)
        c._d = dict(self._d)
        return c


class BatchedSpecEngine(SpecEngine):
    """SpecEngine plus vmapped multi-request decoding over B slots."""

    def __init__(self, params: LlamaParams, draft: EagleParams,
                 cfg: EngineConfig, batch_size: int = 4,
                 adapt_tree: bool = True, dynamic_tree: bool = False,
                 dynamic_batch: bool = False):
        """`adapt_tree` (default on) applies the measured batch->tree-size
        table (see adapt_tree_for_batch); pass False to pin the configured
        tree (e.g. for exact-output parity tests against SpecEngine under
        stochastic sampling, where tree shape affects the sampled path).

        `dynamic_tree` keys the SERVE dispatch's tree size on the live
        active-lane count instead of the static batch size: state is
        allocated for the full configured tree, and each dispatch picks
        the adapt_tree_for_batch variant for however many lanes are
        actually busy — a half-idle streaming batch then earns the bigger
        per-lane trees its own B=1/2 measurements prefer (r3 verdict #4;
        the r3 static table left acceptance on the table at utilization
        0.78-0.87). Greedy outputs are tree-size-invariant, so variant
        switches mid-workload stay lossless. Implies adapt_tree=False for
        allocation; generate_batch* paths then run the full tree.

        `dynamic_batch` additionally re-WIDTHS the serve_stream dispatch to
        the active-lane bucket (power-of-two, capped at batch_size): a
        vmapped idle lane costs exactly one active lane's verify FLOPs, so
        a drain tail at 1 of 4 lanes pays 4x the compute it needs — the
        resize is one lane-gather dispatch at each bucket crossing and the
        scan re-specializes by input shape (no code changes). Composes
        with dynamic_tree (narrow dispatches then also earn bigger
        per-lane trees)."""
        self.dynamic_tree = dynamic_tree
        self.dynamic_batch = dynamic_batch
        if adapt_tree and not dynamic_tree:
            import dataclasses
            cfg = dataclasses.replace(
                cfg, tree=adapt_tree_for_batch(cfg.tree, batch_size))
        super().__init__(params, draft, cfg)
        self.batch_size = batch_size
        cfg = self.cfg    # SpecEngine clamps the tree caps; stay consistent
        if dynamic_tree:
            import dataclasses

            def clamp(tc):
                return dataclasses.replace(
                    tc, node_cap=min(tc.node_cap, tc.total_tokens + 1),
                    leaf_cap=min(tc.leaf_cap, tc.total_tokens + 1))
            self._tree_variants = {
                n: clamp(adapt_tree_for_batch(cfg.tree, n))
                for n in range(1, batch_size + 1)}
        else:
            self._tree_variants = {}
        self._vround = jax.jit(jax.vmap(
            functools.partial(_spec_round, cfg=cfg.model, tree_cfg=cfg.tree,
                              sampling=cfg.sampling,
                              force_accept=cfg.force_accept),
            in_axes=(0, None, None, None)), donate_argnums=(0,))
        self._vloops = {}
        # serve dispatch programs (mixed prefill/decode lanes, ServeCtx
        # vmapped along 0), keyed by rounds-per-dispatch (and tree variant
        # under dynamic_tree)
        self._serve_scans = {}
        # shared-prefix templates keyed by the prefix tokens (a template
        # holds a full KV allocation — a few hundred MB at 7B — so keep
        # only the most recent two)
        self._prefix_templates = {}
        self._lanes_jit = None
        self._lanes_resume_jit = None
        self._stack_jit = None
        self._write_slot_jit = None
        self._read_slot_jit = None
        self._boundary_jit = None
        self._resize_jit = None
        self._zero_tstate = None

    def _serve_tree(self, n_active: int):
        """The dispatch tree for `n_active` busy lanes (None = the engine
        default program) — see dynamic_tree."""
        if not self.dynamic_tree:
            return None
        n = max(1, min(int(n_active), self.batch_size))
        tc = self._tree_variants[n]
        return None if tc == self.cfg.tree else tc

    def _serve_width(self, want: int) -> int:
        """The dispatch batch WIDTH for `want` needed lanes (dynamic_batch):
        the smallest power-of-two bucket >= want, capped at batch_size.
        Bucketing bounds the number of compiled width variants while a
        drain tail still pays verify rows only for the lanes it uses (a
        vmapped idle lane costs exactly one active lane's FLOPs)."""
        want = max(1, min(int(want), self.batch_size))
        w = 1
        while w < want:
            w *= 2
        return min(w, self.batch_size)

    def _resize_lanes(self, batched, bctx, emitted, budget, perm, keep):
        """Re-width the stacked lane state in ONE jitted dispatch: output
        lane j takes input lane perm[j]; lanes with keep[j]=False are
        deactivated (their payload is a placeholder copy — a refill resets
        lengths, so garbage rows are never read). jax.jit re-specializes
        per (in, out) width pair, so each transition compiles once."""
        if self._resize_jit is None:
            def rz(bx, cx, em, bud, perm, keep):
                def g(a):
                    if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
                        return jax.random.wrap_key_data(
                            jax.random.key_data(a)[perm],
                            impl=jax.random.key_impl(a))
                    return a[perm]
                bx2 = jax.tree_util.tree_map(g, bx)
                cx2 = jax.tree_util.tree_map(g, cx)
                import dataclasses as dc
                cx2 = dc.replace(cx2, active=cx2.active & keep)
                return bx2, cx2, em[perm], bud[perm]
            self._resize_jit = jax.jit(rz)
        return self._resize_jit(batched, bctx, emitted, budget,
                                jnp.asarray(perm, jnp.int32),
                                jnp.asarray(keep, bool))

    def _get_serve_scan(self, k_rounds: int, tree_cfg=None):
        """Up to K serve-rounds fused into one device program with
        DEVICE-SIDE slot refill: the full request queue (prompts, lengths,
        budgets) lives on device, and the round body itself detects a lane
        finishing (budget reached or eos emitted), resets that lane's
        engine state in-program and loads the next queued request into its
        ServeCtx — the refill lands on the very next round, and the
        dispatch never has to exit early to let the host repopulate a slot.

        This removes the two costs of the host-refill design: (a) the
        early exit that cut a dispatch short on every request completion
        (one extra ~70ms tunnel RTT per finish), and (b) the hard ceiling
        rounds_per_dispatch put on RTT amortization (the while_loop's trip
        count is dynamic, so K can be an entire workload). The host only
        unpacks token rows; its per-request accounting mirrors the
        device's exactly (same budget/eos rules), so outputs stay
        bit-identical to the solo runs.

        Lanes whose commit_len is out of budget-headroom are frozen (old
        state selected back) so garbage rounds past a finished request can
        never clamp-write over valid KV rows.

        `tree_cfg` (None = the engine tree) selects a DYNAMIC TREE
        VARIANT: a tree differing only in total_tokens/node_cap/leaf_cap
        (same depth_cap/top_k, so all EngineState shapes match and the
        SAME lane states flow through whichever variant the host picks
        per dispatch — see serve()'s active-lane keying). Programs are
        cached per (k, variant)."""
        # key on the FULL TreeConfig (frozen dataclass, hashable): two
        # variants sharing total_tokens but differing in node_cap/leaf_cap/
        # score_temperature must not reuse each other's compiled program
        # (advisor r4)
        key = k_rounds if tree_cfg is None else (k_rounds, tree_cfg)
        if key not in self._serve_scans:
            cfg = self.cfg
            tc = cfg.tree if tree_cfg is None else tree_cfg
            assert tc.depth_cap == cfg.tree.depth_cap, (
                "tree variants must share depth_cap (state geometry)")
            assert tc.depth_cap >= 3, "packed tail needs depth_cap+2 >= 5"
            vround = jax.vmap(
                functools.partial(_spec_round, cfg=cfg.model,
                                  tree_cfg=tc, sampling=cfg.sampling,
                                  force_accept=cfg.force_accept),
                in_axes=(0, None, None, None, 0))
            seq_limit = cfg.max_seq_len - cfg.tree.depth_cap - 1
            d_cap = cfg.tree.depth_cap
            k = k_rounds
            big = jnp.int32(2 ** 30)

            def run_k(batched, params, draft, beam_head, bctx,
                      lane_req, emitted, lane_budget, qhead,
                      q_prompts, q_lens, q_budgets, n_q, eos_id, seed, hold,
                      tp_commit, tp_draft_len, tp_pt, tp_ph, tp_np):
                """lane_req: (B,) request id per slot (-1 idle); qhead: ()
                next queue index. q_* are the FULL (padded) request queue.
                tp_*: the shared-prefix template a refilled lane resumes
                from — commit/KV lengths, queued draft pairs of the last
                prefix chunk, pair count (all zeros when no shared prefix;
                see _prefix_template). The prefix KV PAYLOAD rows
                [0, tp_commit) are carried by the lane states themselves:
                every lane starts as a template copy and nothing ever
                writes below commit_len, so refills only reset lengths.

                `hold` () bool: finished lanes are NOT refilled — their
                request id is parked as (-2 - req) and the lane idles until
                the host snapshots its exact state (conversation caching,
                serve(conversations=...)); -1 stays plain-idle.

                Returns the carried lane arrays plus one packed buffer:
                packed[j, s, :d_cap]  = accepted tokens of round j, slot s
                packed[j, s,  d_cap]  = n_accepted
                packed[j, s,  d_cap+1]= request id the slot served
                packed[k, s, 0..4]    = telemetry tail: executed round
                    count / lane_req / emitted / lane_budget / qhead —
                    everything the host boundary logic needs, in the ONE
                    fetch it already pays (per-array fetches cost ~70ms
                    tunnel RTT each)."""
                b = lane_req.shape[0]
                n_pad = q_prompts.shape[0]
                accs0 = jnp.zeros((k, b, d_cap + 2), jnp.int32)
                i0 = jnp.zeros((), jnp.int32)

                def cond(c):
                    st, ctx, req, em, bud, qh, accs, i = c
                    return (i < k) & jnp.any(ctx.active)

                def body(c):
                    st, ctx, req, em, bud, qh, accs, i = c
                    ok = st.commit_len <= seq_limit          # (B,)
                    st2, res, ctx2 = vround(st, params, draft, beam_head,
                                            ctx)
                    sel = lambda a, b_: jnp.where(
                        jnp.reshape(ok, ok.shape + (1,) * (a.ndim - 1)),
                        a, b_)
                    st3 = jax.tree_util.tree_map(sel, st2, st)
                    ctx3 = jax.tree_util.tree_map(sel, ctx2, ctx)
                    n_j = jnp.where(ok, res.n_accepted, 0)   # (B,)
                    valid = jnp.arange(d_cap)[None, :] < n_j[:, None]
                    eos_hit = jnp.any(
                        valid & (res.accepted == eos_id) & (eos_id >= 0),
                        axis=1)
                    em2 = em + n_j
                    fin = (req >= 0) & (eos_hit | (em2 >= bud))
                    held = fin & hold
                    # a lane is refillable when its request just finished
                    # (and isn't held for a host snapshot) OR it is plain
                    # idle (streaming arrivals can repopulate the queue
                    # after a lane drained it — serve_stream); held lanes
                    # (req <= -2) are never touched until the host
                    # releases them
                    free = (fin & ~hold) | ((req == -1) & ~ctx3.active)

                    # record BEFORE refill: this round's tokens belong to
                    # the finishing request
                    row = jnp.concatenate(
                        [res.accepted, n_j[:, None], req[:, None]], axis=1)
                    accs2 = accs.at[i].set(row)

                    # ---- device-side refill ------------------------------
                    qidx = qh + jnp.cumsum(free.astype(jnp.int32)) - 1
                    has = free & (qidx < n_q)
                    qsafe = jnp.clip(qidx, 0, n_pad - 1)
                    req2 = jnp.where(free, jnp.where(has, qidx, -1),
                                     jnp.where(held, -2 - req, req))
                    em3 = jnp.where(free, 0, em2)
                    bud2 = jnp.where(free,
                                     jnp.where(has, q_budgets[qsafe], big),
                                     bud)
                    qh2 = qh + jnp.sum(has.astype(jnp.int32))
                    ctx4 = ServeCtx(
                        prompt_buf=jnp.where(free[:, None],
                                             q_prompts[qsafe],
                                             ctx3.prompt_buf),
                        prompt_len=jnp.where(free, q_lens[qsafe],
                                             ctx3.prompt_len),
                        prompt_pos=jnp.where(free, tp_commit,
                                             ctx3.prompt_pos),
                        active=jnp.where(free, has,
                                         ctx3.active & ~held))
                    # reset the refilled lanes' engine state to the prefix
                    # template (all-zero without a shared prefix): lengths
                    # back to the prefix watermark, the template's queued
                    # pairs with the request's FIRST SUFFIX TOKEN patched
                    # into the root slot, fresh per-request PRNG key. KV
                    # payloads stay: rows < tp_commit hold the prefix
                    # (written once, never touched), rows past commit_len
                    # are masked.
                    sel = lambda new, old: jnp.where(
                        jnp.reshape(free, free.shape + (1,) * (old.ndim - 1)),
                        new, old)
                    z = lambda a: sel(jnp.zeros_like(a), a)
                    first_sfx = q_prompts[
                        qsafe, jnp.clip(tp_commit, 0,
                                        q_prompts.shape[1] - 1)]      # (B,)
                    ctxn = tp_pt.shape[0]
                    patched_pt = jnp.where(
                        jnp.arange(ctxn)[None, :] == tp_np - 1,
                        first_sfx[:, None], tp_pt[None, :])
                    kd = jax.random.key_data(st3.key)
                    fresh = jax.vmap(
                        lambda r: jax.random.key_data(
                            jax.random.key(seed + jnp.maximum(r, 0))))(req2)
                    key2 = jax.random.wrap_key_data(
                        jnp.where(free[:, None], fresh, kd),
                        impl=jax.random.key_impl(st3.key))
                    st4 = EngineState(
                        base_cache=KVCache(
                            k=st3.base_cache.k, v=st3.base_cache.v,
                            length=sel(tp_commit,
                                       st3.base_cache.length)),
                        draft_cache=KVCache(
                            k=st3.draft_cache.k, v=st3.draft_cache.v,
                            length=sel(tp_draft_len,
                                       st3.draft_cache.length)),
                        commit_len=sel(tp_commit, st3.commit_len),
                        root_token=sel(jnp.where(has, first_sfx, 0),
                                       st3.root_token),
                        pending_tokens=sel(patched_pt, st3.pending_tokens),
                        pending_hidden=sel(tp_ph[None], st3.pending_hidden),
                        n_pending=sel(tp_np, st3.n_pending),
                        root_hidden=z(st3.root_hidden),
                        key=key2)
                    return st4, ctx4, req2, em3, bud2, qh2, accs2, i + 1

                st, ctx, req, em, bud, qh, accs, n = jax.lax.while_loop(
                    cond, body,
                    (batched, bctx, lane_req, emitted, lane_budget, qhead,
                     accs0, i0))
                tail = jnp.zeros((1, b, d_cap + 2), jnp.int32)
                tail = tail.at[0, :, 0].set(n)
                tail = tail.at[0, :, 1].set(req)
                tail = tail.at[0, :, 2].set(em)
                tail = tail.at[0, :, 3].set(bud)
                tail = tail.at[0, :, 4].set(qh)
                packed = jnp.concatenate([accs, tail], axis=0)
                return st, ctx, req, em, bud, qh, packed

            self._serve_scans[key] = jax.jit(
                run_k, donate_argnums=(0, 4, 5, 6, 7, 8))
        return self._serve_scans[key]

    def _get_vloop(self, max_out: int):
        """max_out is static to the loop body, so each budget gets its own
        jitted vmapped program (cached). The token budget is per-lane
        (in_axes 0) so bucketed segments can resume each lane with its own
        remaining count."""
        if max_out not in self._vloops:
            cfg = self.cfg
            f = functools.partial(
                _spec_decode_loop, cfg=cfg.model, tree_cfg=cfg.tree,
                sampling=cfg.sampling, max_out=max_out,
                force_accept=cfg.force_accept)
            self._vloops[max_out] = jax.jit(
                jax.vmap(f, in_axes=(0, None, None, None, None, 0, None)))
        return self._vloops[max_out]

    # ------------------------------------------------------------------
    def _stack_states(self, states):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

    def _read_slot(self, batched, s: int):
        """Lift one lane's state out of the stacked pytree (one jitted
        gather — a copy, so the lane can be reused while the caller holds
        the snapshot). Used by preemption to pause a request."""
        if self._read_slot_jit is None:
            self._read_slot_jit = jax.jit(
                lambda bx, i: jax.tree_util.tree_map(lambda a: a[i], bx))
        return self._read_slot_jit(batched, jnp.asarray(s, jnp.int32))

    def _write_slot(self, batched, state, b: int):
        """Write one lane's state into slot b of the stacked pytree in ONE
        jitted dispatch (a per-leaf eager .at[].set is ~20 dispatches —
        ~70ms of tunnel RTT each on the axon backend). The stacked input
        is donated: callers always rebind the result."""
        if self._write_slot_jit is None:
            self._write_slot_jit = jax.jit(
                lambda bx, x, i: jax.tree_util.tree_map(
                    lambda a, v: a.at[i].set(v), bx, x),
                donate_argnums=(0,))
        return self._write_slot_jit(batched, state,
                                    jnp.asarray(b, jnp.int32))

    def _prefill_one(self, prompt, seed, max_seq=None):
        st = self.init_state(seed, max_seq=max_seq)
        return self.prefill(st, prompt)

    # ---- fused host-boundary surgery ---------------------------------
    def _zero_template(self):
        """A cached all-zero single-lane EngineState — the 'template' for
        fresh lane fills when serving without a shared prefix (identical
        to init_state modulo the per-lane key, which the boundary op
        re-derives from fresh_seed)."""
        if self._zero_tstate is None:
            self._zero_tstate = self.init_state(0)
        return self._zero_tstate

    def _get_boundary(self):
        """ONE jitted dispatch applying a host boundary's ENTIRE lane
        surgery: resume a parked request into a lane (optionally rolling
        its state back to a token watermark — multi-turn resume), admit
        fresh requests from the queue (template copies with the first
        suffix token patched in), and lift a pause/snapshot victim's exact
        state out — all in a single call. The r3 implementation spent
        ~4-6 dispatches (~70ms tunnel RTT each) per admission on
        _read_slot/_write_slot/eager .at[].set chains, which is exactly
        the host-surgery tax CLAUDE.md's round-3 notes flag; this is the
        one-jit fold.

        src_sel (B,): 0 keep lane, 1 take the parked state, 2 fresh fill.
        pause_idx (): lane to snapshot (before any writes), -1 for none —
        the snapshot is always returned (callers ignore it when unused).
        parked_rollback (): >=0 rolls the parked state's commit/KV
        watermarks back to that many committed tokens and clears pending
        pairs (resume_and_generate's rollback, serve-side)."""
        if self._boundary_jit is None:
            import dataclasses as dc

            def combine_raw(sel, old, par, fr):
                s = jnp.reshape(sel, sel.shape + (1,) * (old.ndim - 1))
                return jnp.where(s == 1, par[None],
                                 jnp.where(s == 2, fr, old))

            def combine(sel, old, par, fr):
                if jnp.issubdtype(old.dtype, jax.dtypes.prng_key):
                    kd = combine_raw(sel, jax.random.key_data(old),
                                     jax.random.key_data(par),
                                     jax.random.key_data(fr))
                    return jax.random.wrap_key_data(
                        kd, impl=jax.random.key_impl(old))
                return combine_raw(sel, old, par, fr)

            def apply(batched, bctx, emitted, budget,
                      parked_st, parked_ctx, parked_em, parked_bud,
                      parked_rollback, parked_seed, tstate, src_sel,
                      fresh_qpos, fresh_sfx, fresh_seed, fresh_pos,
                      pause_idx, q_prompts, q_lens, q_budgets):
                b = src_sel.shape[0]
                # snapshot BEFORE any writes
                pi = jnp.clip(pause_idx, 0, b - 1)
                snap_st = jax.tree_util.tree_map(lambda a: a[pi], batched)
                snap_ctx = jax.tree_util.tree_map(lambda a: a[pi], bctx)
                snap_em, snap_bud = emitted[pi], budget[pi]

                # parked rollback (multi-turn resume semantics). The lane
                # key is re-derived from parked_seed (the caller passes
                # seed + queue position, the same convention as fresh
                # fills), so a resumed turn's T>0 randomness doesn't
                # depend on WHICH admission path took it (advisor r4).
                rb = parked_rollback
                mk = lambda old, new: jnp.where(rb >= 0, new, old)
                parked_st = dc.replace(
                    parked_st,
                    base_cache=dc.replace(
                        parked_st.base_cache,
                        length=mk(parked_st.base_cache.length, rb)),
                    draft_cache=dc.replace(
                        parked_st.draft_cache,
                        length=mk(parked_st.draft_cache.length, rb)),
                    commit_len=mk(parked_st.commit_len, rb),
                    n_pending=mk(parked_st.n_pending,
                                 jnp.zeros((), jnp.int32)),
                    key=jax.random.wrap_key_data(
                        mk(jax.random.key_data(parked_st.key),
                           jax.random.key_data(jax.random.key(parked_seed))),
                        impl=jax.random.key_impl(parked_st.key)))

                # fresh lanes: template copies, first suffix token patched
                # into the placeholder pair slot, per-lane key
                def one(s, sd):
                    pt = jnp.where(
                        jnp.arange(tstate.pending_tokens.shape[0])
                        == tstate.n_pending - 1,
                        jnp.where(s >= 0, s, tstate.pending_tokens[
                            jnp.clip(tstate.n_pending - 1, 0, None)]),
                        tstate.pending_tokens)
                    return dc.replace(
                        tstate, pending_tokens=pt,
                        root_token=jnp.where(s >= 0, s, tstate.root_token),
                        key=jax.random.key(sd))
                fresh = jax.vmap(one)(fresh_sfx, fresh_seed)
                qsafe = jnp.clip(fresh_qpos, 0, q_prompts.shape[0] - 1)
                fresh_ctx = ServeCtx(prompt_buf=q_prompts[qsafe],
                                     prompt_len=q_lens[qsafe],
                                     prompt_pos=fresh_pos,
                                     active=fresh_qpos >= 0)

                cmb = functools.partial(combine, src_sel)
                new_b = jax.tree_util.tree_map(cmb, batched,
                                               parked_st, fresh)
                new_ctx = jax.tree_util.tree_map(cmb, bctx,
                                                 parked_ctx, fresh_ctx)
                new_em = jnp.where(src_sel == 1, parked_em,
                                   jnp.where(src_sel == 2, 0, emitted))
                new_bud = jnp.where(src_sel == 1, parked_bud,
                                    jnp.where(src_sel == 2,
                                              q_budgets[qsafe], budget))
                return (new_b, new_ctx, new_em, new_bud,
                        snap_st, snap_ctx, snap_em, snap_bud)

            self._boundary_jit = jax.jit(apply, donate_argnums=(0, 1, 2, 3))
        return self._boundary_jit

    def _run_boundary(self, batched, bctx, emitted, budget, plan,
                      q_prompts, q_lens, q_budgets):
        """Host wrapper: `plan` is a dict with src_sel/fresh_*/pause_idx/
        tstate/parked (None or (st, ctx, em, bud)) and parked_rollback.
        Returns (batched, bctx, emitted, budget, snapshot-or-None)."""
        parked = plan.get("parked")
        if parked is None:
            z = self._zero_template()
            parked = (z, self._serve_ctx(None), 0, 0)
        out = self._get_boundary()(
            batched, bctx, emitted, budget,
            parked[0], parked[1],
            jnp.asarray(int(parked[2]), jnp.int32),
            jnp.asarray(int(parked[3]), jnp.int32),
            jnp.asarray(int(plan.get("parked_rollback", -1)), jnp.int32),
            jnp.asarray(int(plan.get("parked_seed", 0)), jnp.int32),
            plan.get("tstate") or self._zero_template(),
            jnp.asarray(plan["src_sel"], jnp.int32),
            jnp.asarray(plan["fresh_qpos"], jnp.int32),
            jnp.asarray(plan["fresh_sfx"], jnp.int32),
            jnp.asarray(plan["fresh_seed"], jnp.int32),
            jnp.asarray(plan["fresh_pos"], jnp.int32),
            jnp.asarray(int(plan.get("pause_idx", -1)), jnp.int32),
            q_prompts, q_lens, q_budgets)
        batched, bctx, emitted, budget = out[:4]
        snap = out[4:] if plan.get("pause_idx", -1) >= 0 else None
        return batched, bctx, emitted, budget, snap

    # ------------------------------------------------------------------
    def generate_batch(self, prompts: Sequence, max_new_tokens=None,
                       eos_token_id: int = 2, seed: int = 0):
        """Decode len(prompts) requests in lockstep rounds. Returns
        (outputs, stats) — outputs[i] includes prompt i."""
        max_new = max_new_tokens or self.cfg.max_new_tokens
        b = len(prompts)
        states = [self._prefill_one(p, seed + i)
                  for i, p in enumerate(prompts)]
        batched = self._stack_states(states)

        outs = [list(np.asarray(p, np.int64)) for p in prompts]
        new_tokens = [0] * b
        done = [False] * b
        rounds = 0
        while not all(done):
            batched, res = self._vround(batched, self.params, self.draft,
                                        self.beam_head)
            rounds += 1
            n_acc = np.asarray(res.n_accepted)
            acc = np.asarray(res.accepted)
            for i in range(b):
                if done[i]:
                    continue
                for t in acc[i][:n_acc[i]]:
                    outs[i].append(int(t))
                    new_tokens[i] += 1
                    if int(t) == eos_token_id or new_tokens[i] >= max_new:
                        done[i] = True
                        break
        total = sum(new_tokens)
        return outs, {"new_tokens": total, "rounds": rounds,
                      "per_request": new_tokens,
                      "accept_per_round": total / max(rounds * b, 1)}

    # ------------------------------------------------------------------
    def generate_batch_fused(self, prompts: Sequence, max_new_tokens=None,
                             eos_token_id: int = 2, seed: int = 0):
        """All requests decoded in ONE device program (vmapped multi-round
        while_loop); finished lanes idle until the slowest request is done.

        With cfg.kv_buckets set, the batch decodes as a chain of fused
        segments like SpecEngine.generate_fused: all lanes' caches start
        in the smallest bucket that fits the longest prompt and migrate
        together when any lane's commit_len approaches the bucket budget
        (lane commit lengths stay within depth_cap+1 of each other per
        round, so a shared bucket schedule costs no lane anything)."""
        import jax.numpy as jnp
        max_new = max_new_tokens or self.cfg.max_new_tokens
        b = len(prompts)
        for p in prompts:
            self._check_budget(p, max_new)
        p_max = max(len(np.asarray(p).reshape(-1)) for p in prompts)
        buckets = self._plan_buckets(p_max, max_new)
        states = [self._prefill_one(p, seed + i, max_seq=buckets[0])
                  for i, p in enumerate(prompts)]
        batched = self._stack_states(states)

        outs = [list(np.asarray(p, np.int64)) for p in prompts]
        new_tokens = [0] * b
        lane_done = [False] * b
        rounds = 0
        for bi, seq in enumerate(buckets):
            if bi:
                from flowspec_tpu.runtime.engine import _grow_kv
                batched = _grow_kv(batched, *self._kv_rows(seq))
            # an eos'd lane gets budget 0: its loop cond fails immediately
            # and the gate select freezes its state for the whole segment
            remaining = jnp.asarray(
                [0 if lane_done[i] else max_new - new_tokens[i]
                 for i in range(b)], jnp.int32)
            out_buf, n_out, rnds, done, batched = self._get_vloop(
                int(max_new))(
                batched, self.params, self.draft, self.beam_head,
                jnp.asarray(eos_token_id, jnp.int32), remaining,
                jnp.asarray(seq, jnp.int32))
            rounds += int(np.max(np.asarray(rnds)))
            done = np.asarray(done)
            for i in range(b):
                if lane_done[i]:
                    continue
                for t in np.asarray(out_buf[i])[:int(n_out[i])]:
                    outs[i].append(int(t))
                    new_tokens[i] += 1
                    if int(t) == eos_token_id or new_tokens[i] >= max_new:
                        lane_done[i] = True
                        break
                lane_done[i] = lane_done[i] or bool(done[i])
            if all(d or nt >= max_new
                   for d, nt in zip(lane_done, new_tokens)):
                break
        total = sum(new_tokens)
        return outs, {"new_tokens": total, "rounds": rounds,
                      "per_request": new_tokens,
                      "kv_buckets_used": bi + 1}

    # ------------------------------------------------------------------
    def _serve_ctx(self, prompt=None, prompt_pos: int = 0):
        """ServeCtx for one slot; empty (inactive) when prompt is None.
        `prompt_pos` > 0 marks a prefix already resident in the lane's KV
        (shared-prefix serving) — the chain starts at that position."""
        p_cap = self.cfg.max_seq_len
        buf = np.zeros((p_cap,), np.int32)
        n = 0
        if prompt is not None:
            pr = np.asarray(prompt, np.int32).reshape(-1)
            n = len(pr)
            buf[:n] = pr
        return ServeCtx(prompt_buf=jnp.asarray(buf),
                        prompt_len=jnp.asarray(n, jnp.int32),
                        prompt_pos=jnp.asarray(prompt_pos, jnp.int32),
                        active=jnp.asarray(prompt is not None))

    def warmup(self, shared_prefix=None, ks=(8, 256), max_new_tokens=4):
        """Pre-pay the serve-path compiles so the first real request never
        absorbs them: the K-round dispatch program for each k in `ks`
        (serve defaults to 256, serve_stream to 8), the jitted lane
        builders and slot snapshot gather/scatter (prefix refills and
        preemption), and — when `shared_prefix` is given — the prefix
        template itself, cached for every later call. The cold-row costs
        this removes are measured in BENCH_SUITE_r03 (serve_prefix
        on_cold 147.1 vs on_cached 666.7 tok/s at 7B)."""
        v = self.cfg.model.vocab_size
        prompts = [[1 % v, 2 % v, 3 % v], [2 % v, 3 % v, 4 % v]]
        kw = {}
        if shared_prefix is not None:
            pfx = [int(x) for x in np.asarray(shared_prefix).reshape(-1)]
            prompts = [pfx + p for p in prompts]
            kw["shared_prefix"] = pfx
        for k in ks:
            self.serve(prompts, max_new_tokens=max_new_tokens,
                       eos_token_id=-1, rounds_per_dispatch=int(k), **kw)
        # snapshot gather/scatter (preemption pause/resume), both pytree
        # structures (EngineState and ServeCtx)
        st = self._stack_states(
            [self.init_state(i) for i in range(self.batch_size)])
        st = self._write_slot(st, self._read_slot(st, 0), 0)
        ctx = self._stack_states(
            [self._serve_ctx(None) for _ in range(self.batch_size)])
        ctx = self._write_slot(ctx, self._read_slot(ctx, 0), 0)
        # the fused boundary op (admissions/preemption/conversation
        # snapshots all route through it)
        b = self.batch_size
        st = self._stack_states(
            [self.init_state(i) for i in range(b)])
        em = jnp.zeros((b,), jnp.int32)
        bud = jnp.full((b,), 8, jnp.int32)
        bctx = self._stack_states([self._serve_ctx(None) for _ in range(b)])
        p_cap = self.cfg.max_seq_len
        qz = (jnp.zeros((8, p_cap), jnp.int32), jnp.zeros((8,), jnp.int32),
              jnp.zeros((8,), jnp.int32))
        self._run_boundary(
            st, bctx, em, bud,
            dict(src_sel=[0] * b, fresh_qpos=[-1] * b, fresh_sfx=[-1] * b,
                 fresh_seed=[0] * b, fresh_pos=[0] * b, pause_idx=0,
                 parked=None, tstate=None), *qz)
        # dynamic-tree variant programs: compile EVERY variant the engine
        # can pick (one per live active-lane count) for each k. Without
        # this, which variants exist at timing-time depends on the wall-
        # clock arrival pattern of earlier calls — a compile can land
        # inside a measured run (r5: a dyntree ON arm measured 74.7 vs
        # 323 tok/s purely from one such compile).
        if self.dynamic_tree:
            tmpl = self._template_consts(None)
            for k in ks:
                for n_act in range(1, b + 1):
                    scan = self._get_serve_scan(int(k),
                                                self._serve_tree(n_act))
                    batched = self._lanes_from_template(
                        self._zero_template(), [-1] * b, list(range(b)))
                    bctx = self._stack_states(
                        [self._serve_ctx([1, 2, 3] if i < n_act else None)
                         for i in range(b)])
                    scan(batched, self.params, self.draft, self.beam_head,
                         bctx,
                         jnp.asarray([i if i < n_act else -1
                                      for i in range(b)], jnp.int32),
                         jnp.zeros((b,), jnp.int32),
                         jnp.full((b,), 2, jnp.int32),
                         jnp.asarray(n_act, jnp.int32), *qz,
                         jnp.asarray(0, jnp.int32),
                         jnp.asarray(-1, jnp.int32),
                         jnp.asarray(0, jnp.int32),
                         jnp.asarray(False), *tmpl)

    # ---- shared-prefix (prefix-cache) serving ------------------------
    def _prefix_template(self, shared_prefix, seed: int):
        """Prefill the shared prefix ONCE into a template EngineState.

        The template stops before `_finish_prefill`: the last prefix
        chunk's draft pairs stay QUEUED with a placeholder in the final
        slot, exactly where a per-request patch drops in that request's
        first suffix token (the same slot `_finish_prefill` patches the
        sampled root into, engine.py:_finish_prefill). Every serve lane
        starts as a copy of this state, so the prefix KV rows
        [0, prefix_len) are computed once per serve() call instead of once
        per request; nothing in a round ever writes below commit_len, so
        device-side refills only reset lengths back to the watermark.
        Returns (template_state, prefix_len)."""
        prefix = np.asarray(shared_prefix, np.int32).reshape(-1)
        assert len(prefix) > 0, "shared_prefix must be non-empty"
        key = prefix.tobytes()
        if key in self._prefix_templates:
            # refresh recency: eviction pops the oldest-inserted entry
            self._prefix_templates[key] = self._prefix_templates.pop(key)
        else:
            # the template is deterministic (no sampling in the chunk
            # loop), so it is cached ACROSS serve calls — repeat workloads
            # on the same system prompt skip the prefill entirely. Through
            # the tunneled backend the build costs ~1s of dispatch RTTs,
            # which a one-shot small workload cannot amortize (measured:
            # BENCH_SUITE serve_prefix) but a cached reuse makes free.
            if len(self._prefix_templates) >= 2:
                self._prefix_templates.pop(
                    next(iter(self._prefix_templates)))
            st, _ = self._prefill_chunks(self.init_state(seed + 777_000),
                                         prefix)
            self._prefix_templates[key] = st
        return self._prefix_templates[key], len(prefix)

    def _template_consts(self, tstate):
        """The (tp_commit, tp_draft_len, tp_pt, tp_ph, tp_np) scan args for
        a prefix template — all zeros when serving without one."""
        if tstate is None:
            mc = self.cfg.model
            return (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                    jnp.zeros((self.ctx_pad,), jnp.int32),
                    jnp.zeros((1, self.ctx_pad, mc.hidden_size),
                              jnp.dtype(mc.dtype)),
                    jnp.zeros((), jnp.int32))
        return (tstate.commit_len, tstate.draft_cache.length,
                tstate.pending_tokens, tstate.pending_hidden,
                tstate.n_pending)

    def _lanes_with_resumes(self, tstate, first_sfx, key_seeds, parked,
                            rollbacks, use_parked):
        """All B lanes in ONE dispatch for a MIXED initial fill: rows with
        use_parked take their stored conversation snapshot rolled back to
        the `rollbacks` token watermark (pending cleared, key re-derived
        from the row's seed — identical semantics to the boundary op's
        parked path); other rows are fresh template copies with the first
        post-prefix token patched in. Replaces the r5a per-resume
        _run_boundary chain (~35ms/resume, PROFILE_serve.md) with one
        stacked select."""
        if self._lanes_resume_jit is None:
            import dataclasses as dc

            def build(t, sfx, seeds, par, rb, use):
                def one(s, sd, p, r, u):
                    pt = jnp.where(
                        jnp.arange(t.pending_tokens.shape[0])
                        == t.n_pending - 1,
                        jnp.where(s >= 0, s, t.pending_tokens[
                            jnp.clip(t.n_pending - 1, 0, None)]),
                        t.pending_tokens)
                    fresh = dc.replace(
                        t, pending_tokens=pt,
                        root_token=jnp.where(s >= 0, s, t.root_token),
                        key=jax.random.key(sd))
                    p2 = dc.replace(
                        p,
                        base_cache=dc.replace(p.base_cache, length=r),
                        draft_cache=dc.replace(p.draft_cache, length=r),
                        commit_len=r,
                        n_pending=jnp.zeros((), jnp.int32),
                        key=jax.random.key(sd))

                    def sel(a, b_):
                        if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
                            return jax.random.wrap_key_data(
                                jnp.where(u, jax.random.key_data(a),
                                          jax.random.key_data(b_)),
                                impl=jax.random.key_impl(a))
                        return jnp.where(u, a, b_)
                    return jax.tree_util.tree_map(sel, p2, fresh)
                return jax.vmap(one)(sfx, seeds, par, rb, use)
            self._lanes_resume_jit = jax.jit(build)
        return self._lanes_resume_jit(
            tstate, jnp.asarray(first_sfx, jnp.int32),
            jnp.asarray(key_seeds, jnp.int32), parked,
            jnp.asarray(rollbacks, jnp.int32),
            jnp.asarray(use_parked, bool))

    def _stack_parked(self, states):
        """Stack B single-lane states into one (B, ...) tree in ONE jitted
        dispatch (the eager _stack_states pays a tunnel RTT per leaf)."""
        if self._stack_jit is None:
            self._stack_jit = jax.jit(
                lambda *s: jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *s))
        return self._stack_jit(*states)

    def _lanes_from_template(self, tstate, first_sfx, key_seeds):
        """The full B-lane stacked EngineState from the template in ONE
        jitted dispatch (per-lane eager patching costs ~70ms of tunnel RTT
        per op — a dozen ops made the template path LOSE its round savings
        on small workloads). `first_sfx` (B,) holds each lane's first
        post-prefix token, -1 for idle lanes."""
        if self._lanes_jit is None:
            import dataclasses as dc

            def build(t, sfx, seeds):
                def one(s, sd):
                    pt = jnp.where(
                        jnp.arange(t.pending_tokens.shape[0])
                        == t.n_pending - 1,
                        jnp.where(s >= 0, s, t.pending_tokens[
                            jnp.clip(t.n_pending - 1, 0, None)]),
                        t.pending_tokens)
                    return dc.replace(
                        t, pending_tokens=pt,
                        root_token=jnp.where(s >= 0, s, t.root_token),
                        key=jax.random.key(sd))
                return jax.vmap(one, in_axes=(0, 0))(sfx, seeds)
            self._lanes_jit = jax.jit(build)
        return self._lanes_jit(tstate, jnp.asarray(first_sfx, jnp.int32),
                               jnp.asarray(key_seeds, jnp.int32))

    def _check_shared_prefix(self, prompts, shared_prefix):
        """Every prompt must extend the shared prefix by >= 1 token."""
        prefix = np.asarray(shared_prefix, np.int32).reshape(-1)
        for i, p in enumerate(prompts):
            pr = np.asarray(p, np.int32).reshape(-1)
            if len(pr) <= len(prefix) or not np.array_equal(
                    pr[:len(prefix)], prefix):
                raise ValueError(
                    f"prompt {i} does not strictly extend shared_prefix "
                    f"(prompt len {len(pr)}, prefix len {len(prefix)})")

    @staticmethod
    def _detect_shared_prefix(prompts):
        """Longest common prefix of all prompts, capped one token short of
        the shortest prompt (every request must keep >= 1 suffix token for
        the chain to start from). None when the LCP is empty."""
        if not prompts:
            return None
        arrs = [np.asarray(p, np.int32).reshape(-1) for p in prompts]
        cap = min(len(a) for a in arrs) - 1
        if cap <= 0:
            return None
        first = arrs[0][:cap]
        n = cap
        for a in arrs[1:]:
            neq = np.nonzero(a[:n] != first[:n])[0]
            if neq.size:
                n = int(neq[0])
            if n == 0:
                return None
        return first[:n].tolist()

    @staticmethod
    def _queue_schedule(order, budgets, policy: str, start: int = 0):
        """Order queue positions >= `start` by the admission policy.
        `order` maps queue position -> request id; entries before `start`
        are already consumed (or in flight) and must keep their positions.
        Policies (the reference serves batch=1 FIFO only — this is the
        admission-aware budget scheduling layer above it):
          fifo — arrival/submission order (default);
          sjf  — shortest job (smallest token budget) first: minimizes
                 mean completion latency over the workload;
          lpt  — longest job first: the classic makespan heuristic —
                 long requests start early so the tail drains many short
                 ones instead of idling B-1 slots behind one long lane.
        Sorts are stable, so equal-budget requests stay in FIFO order."""
        if policy == "fifo":
            return order
        head, tail = order[:start], order[start:]
        if policy == "sjf":
            tail = sorted(tail, key=lambda r: budgets[r])
        elif policy == "lpt":
            tail = sorted(tail, key=lambda r: -budgets[r])
        else:
            raise ValueError(f"unknown queue_order {policy!r}")
        return head + tail

    def serve(self, prompts: Sequence, max_new_tokens=None,
              eos_token_id: int = 2, seed: int = 0,
              rounds_per_dispatch: int = 256,
              queue_order: str = "fifo", shared_prefix=None,
              on_token=None, conversations=None,
              conversation_ids=None):
        """TOKEN-LEVEL continuous batching: up to `batch_size` slots run
        synchronized rounds; a slot whose request finishes is refilled from
        the device-resident queue IN-PROGRAM (see _get_serve_scan) and
        spends its next rounds consuming prompt-chain chunks (emitting
        nothing) while the other slots keep decoding — a refill never
        stalls the batch and never costs a dispatch (the reference cannot
        serve at all: batch size 1 is asserted at eagle/kv_cache.py:91).
        Returns outputs in `prompts` order plus utilization stats.

        `rounds_per_dispatch` bounds how many rounds one device program may
        run before control returns to the host — the admission-latency
        granularity for workloads where new requests arrive over time. With
        device-side refill the loop's trip count is dynamic, so large K
        costs only a (K, B, depth_cap+2) int32 token buffer; the default
        256 runs typical workloads in a handful of dispatches.

        `max_new_tokens` may be a single budget or one per request.
        `queue_order` picks the admission policy over the request queue
        (see _queue_schedule): "fifo" (default), "sjf", or "lpt". Outputs
        always come back in `prompts` order regardless of policy.

        `shared_prefix` (token list) turns on prefix-cache serving: every
        prompt must start with it, it is prefilled ONCE into a template
        (see _prefix_template), and each request — initial fills and
        in-program device refills alike — starts at
        commit_len = len(shared_prefix) with the prefix KV already
        resident, consuming only its suffix through the prompt chain. The
        per-request prefill work drops from ceil(len(prompt)/depth_cap)
        to ceil(suffix/depth_cap) chain rounds — the dominant TTFT cost
        for system-prompt-heavy workloads. Greedy outputs are identical
        to serving without it (tested); stochastic streams stay
        distributionally correct but are not bit-identical (fewer chain
        rounds means a different per-lane RNG split schedule). Pass
        "auto" to detect the longest common prefix of the queued prompts
        instead of supplying one.

        `on_token(request_index, token)` streams tokens out as the host
        unpacks each dispatch (SSE-style incremental delivery): called in
        emission order for every generated token, including the eos.
        Delivery granularity is `rounds_per_dispatch` — lower K streams
        sooner at more dispatch overhead, the same tradeoff as admission.

        MULTI-TURN serving: pass `conversations` (a ConversationStore) and
        `conversation_ids` (one id per prompt). Each request whose id is
        in the store and whose prompt extends the stored history resumes
        from the stored lane snapshot — KV rolled back to the common
        token prefix, only the new turn chain-prefilled (the serve-side
        twin of resume_and_generate; the reference re-prefills the whole
        conversation every turn, eval/run_pipe_eval.py:200-320). Finished
        requests' exact lane states are lifted off their lanes and stored
        under their ids for the next turn. In this mode lane transitions
        happen at HOST boundaries (the in-program refill cannot restore a
        per-request KV snapshot), so refills wait up to
        `rounds_per_dispatch` rounds — use a small K (e.g. 16); the
        returned stats gain `resumed_turns`."""
        n_req = len(prompts)
        if max_new_tokens is None:
            budgets = [self.cfg.max_new_tokens] * n_req
        elif np.ndim(max_new_tokens) == 0:
            budgets = [int(max_new_tokens)] * n_req
        else:
            budgets = [int(x) for x in max_new_tokens]
            assert len(budgets) == n_req, (len(budgets), n_req)
        b = self.batch_size
        k = max(1, int(rounds_per_dispatch))
        for p, mx in zip(prompts, budgets):
            self._check_budget(p, mx)
        if isinstance(shared_prefix, str):
            if shared_prefix != "auto":
                raise ValueError(f"shared_prefix={shared_prefix!r}: pass "
                                 "token ids or the string \"auto\"")
            shared_prefix = self._detect_shared_prefix(prompts)
        tstate, pfx_len = None, 0
        if shared_prefix is not None:
            self._check_shared_prefix(prompts, shared_prefix)
            tstate, pfx_len = self._prefix_template(shared_prefix, seed)
        conv_mode = conversations is not None
        if conv_mode:
            assert conversation_ids is not None and \
                len(conversation_ids) == n_req, "one id per prompt"
        outs: List[list] = [list(np.asarray(p, np.int64)) for p in prompts]
        new_tokens = [0] * n_req
        finished = [False] * n_req
        admit_round = [0] * n_req    # round index when the slot was filled
        finish_round = [0] * n_req
        resumed_turns = 0

        # admission order: queue position -> request id (identity for fifo)
        order = self._queue_schedule(list(range(n_req)), budgets,
                                     queue_order)

        # device-resident request queue, padded to a size bucket so queue
        # length changes don't recompile the program
        p_cap = self.cfg.max_seq_len
        n_pad = max(8, 1 << (n_req - 1).bit_length())
        q_prompts = np.zeros((n_pad, p_cap), np.int32)
        q_lens = np.zeros((n_pad,), np.int32)
        q_budgets = np.zeros((n_pad,), np.int32)
        for qpos, r in enumerate(order):
            pr = np.asarray(prompts[r], np.int32).reshape(-1)
            q_prompts[qpos, :len(pr)] = pr
            q_lens[qpos] = len(pr)
            q_budgets[qpos] = budgets[r]
        q_prompts = jnp.asarray(q_prompts)
        q_lens = jnp.asarray(q_lens)
        q_budgets = jnp.asarray(q_budgets)

        def _resume_keep(r):
            """Committed-token watermark to resume request r from, or -1
            for a fresh fill (no stored conversation / prefix too short).
            Mirrors the harness LCP logic: committed KV row i holds stream
            token i, so any shared token prefix is reusable."""
            if not conv_mode:
                return -1, None
            ent = conversations.get(conversation_ids[r])
            if ent is None:
                return -1, None
            hist = ent["history"]
            toks = [int(x) for x in np.asarray(prompts[r]).reshape(-1)]
            m = min(len(toks) - 1, len(hist))
            lcp = 0
            while lcp < m and toks[lcp] == hist[lcp]:
                lcp += 1
            if lcp < 2:
                return -1, None
            return lcp - 1, ent["state"]

        # initial fill: slots 0..b-1 take queue entries 0..b-1 on host (the
        # device path only refills on completion). Seeds are keyed by queue
        # position to match the device refill's jax.random.key(seed + qpos).
        slot_q = [s if s < n_req else -1 for s in range(b)]
        lane_np = list(slot_q)
        ctxs, sfx, kseeds, resumes = [], [], [], []
        for s in range(b):
            qp = slot_q[s]
            kseeds.append(seed + (qp if qp >= 0 else 1000 + s))
            pr = (np.asarray(prompts[order[qp]], np.int32).reshape(-1)
                  if qp >= 0 else None)
            keep, rstate = _resume_keep(order[qp]) if qp >= 0 else (-1,
                                                                    None)
            if rstate is not None:
                # multi-turn resume: stored snapshot rolled back to the
                # common-prefix watermark; the chain re-forwards the
                # boundary token and prefills only the new turn
                resumes.append((keep, rstate))
                ctxs.append(self._serve_ctx(pr, prompt_pos=keep))
                sfx.append(-1)
                resumed_turns += 1
            else:
                resumes.append(None)
                sfx.append(int(pr[pfx_len]) if pr is not None else -1)
                ctxs.append(self._serve_ctx(pr, prompt_pos=pfx_len))
        if any(r is not None for r in resumes):
            # MIXED initial fill (conversation resumes + fresh lanes):
            # one jitted stack of the parked snapshots + ONE fused build
            # that selects rolled-back-parked vs template-fresh per lane
            # — two dispatches total, regardless of resume count (the
            # r5a per-resume boundary chain paid ~35ms each)
            zt = tstate if tstate is not None else self._zero_template()
            parked = self._stack_parked(
                [rz[1] if rz is not None else zt for rz in resumes])
            batched = self._lanes_with_resumes(
                zt, sfx, kseeds, parked,
                [rz[0] if rz is not None else 0 for rz in resumes],
                [rz is not None for rz in resumes])
        elif tstate is None:
            batched = self._stack_states(
                [self.init_state(ks) for ks in kseeds])
        else:
            batched = self._lanes_from_template(tstate, sfx, kseeds)
        bctx = self._stack_states(ctxs)
        emitted = jnp.zeros((b,), jnp.int32)
        lane_budget = jnp.asarray(
            [budgets[order[qp]] if qp >= 0 else 2 ** 30 for qp in slot_q],
            jnp.int32)
        qh_host = min(b, n_req)

        rounds = 0
        busy_slot_rounds = 0
        first_seen = [-1] * n_req
        for qp in range(min(b, n_req)):
            first_seen[order[qp]] = 0
        tmpl = self._template_consts(tstate)
        n_active = sum(1 for l in lane_np if l >= 0)
        while not all(finished):
            scan_k = self._get_serve_scan(k, self._serve_tree(n_active))
            (batched, bctx, lane_req, emitted, lane_budget, qhead,
             packed) = scan_k(
                batched, self.params, self.draft, self.beam_head, bctx,
                jnp.asarray(lane_np, jnp.int32), emitted, lane_budget,
                jnp.asarray(qh_host, jnp.int32),
                q_prompts, q_lens, q_budgets,
                jnp.asarray(0 if conv_mode else n_req, jnp.int32),
                jnp.asarray(eos_token_id, jnp.int32),
                jnp.asarray(seed, jnp.int32),
                jnp.asarray(conv_mode), *tmpl)
            packed = np.asarray(packed)          # ONE device->host fetch
            n_exec = int(packed[-1, 0, 0])
            assert n_exec > 0, "serve scan made no progress"
            lane_np = [int(x) for x in packed[-1, :, 1]]
            qh_host = int(packed[-1, 0, 4])
            accs = packed[:-1, :, :-2]           # (K, B, depth_cap)
            naccs = packed[:-1, :, -2]           # (K, B)
            reqs = packed[:-1, :, -1]            # (K, B)
            for j in range(n_exec):
                for s in range(b):
                    qpos = int(reqs[j, s])
                    if qpos < 0:
                        continue
                    r = order[qpos]
                    if finished[r]:
                        continue
                    if first_seen[r] < 0:
                        admit_round[r] = rounds + j
                        first_seen[r] = 1
                    busy_slot_rounds += 1
                    for t in accs[j, s][:naccs[j, s]]:
                        outs[r].append(int(t))
                        new_tokens[r] += 1
                        if on_token is not None:
                            on_token(r, int(t))
                        if int(t) == eos_token_id or \
                                new_tokens[r] >= budgets[r]:
                            finished[r] = True
                            finish_round[r] = rounds + j + 1
                            break
            rounds += n_exec
            if conv_mode:
                # held lanes (req <= -2): snapshot the exact finish state
                # into the store, then refill the lane from the queue —
                # all in fused boundary dispatches (one per held lane)
                for s in range(b):
                    if lane_np[s] > -2:
                        continue
                    qpos = -2 - lane_np[s]
                    r = order[qpos]
                    plan = dict(src_sel=[0] * b, fresh_qpos=[-1] * b,
                                fresh_sfx=[-1] * b, fresh_seed=[0] * b,
                                fresh_pos=[0] * b, pause_idx=s,
                                parked=None, tstate=tstate)
                    lane_np[s] = -1
                    if qh_host < n_req:
                        rn = order[qh_host]
                        keep, rstate = _resume_keep(rn)
                        prn = np.asarray(prompts[rn],
                                         np.int32).reshape(-1)
                        if rstate is not None:
                            plan["src_sel"][s] = 1
                            plan["parked"] = (
                                rstate, self._serve_ctx(
                                    prn, prompt_pos=keep),
                                0, budgets[rn])
                            plan["parked_rollback"] = keep
                            plan["parked_seed"] = seed + qh_host
                            resumed_turns += 1
                        else:
                            plan["src_sel"][s] = 2
                            plan["fresh_qpos"][s] = qh_host
                            plan["fresh_sfx"][s] = (int(prn[pfx_len])
                                                    if tstate is not None
                                                    else -1)
                            plan["fresh_seed"][s] = seed + qh_host
                            plan["fresh_pos"][s] = pfx_len
                        lane_np[s] = qh_host
                        if first_seen[rn] < 0:
                            admit_round[rn] = rounds
                            first_seen[rn] = 1
                        qh_host += 1
                    (batched, bctx, emitted, lane_budget,
                     snap) = self._run_boundary(
                        batched, bctx, emitted, lane_budget, plan,
                        q_prompts, q_lens, q_budgets)
                    conversations.put(conversation_ids[r], snap[0],
                                      outs[r])
                    # the resumed/fresh lane's RNG key was set by the
                    # boundary op; parked resume keeps the stored key
            n_active = sum(1 for l in lane_np if l >= 0)
        total = sum(new_tokens)
        stats = {"new_tokens": total, "rounds": rounds,
                 "per_request": new_tokens,
                 # per-request latency in rounds, admission->finish
                 # (admission = slot fill; includes prompt-chain
                 # prefill rounds)
                 "latency_rounds": [finish_round[r] - admit_round[r]
                                    for r in range(n_req)],
                 "admit_rounds": admit_round,
                 # per busy lane-round (prompt-chain rounds included,
                 # so this is a floor on decode acceptance)
                 "accept_per_round": total / max(busy_slot_rounds, 1),
                 "slot_utilization": busy_slot_rounds
                 / max(rounds * b, 1)}
        if conv_mode:
            stats["resumed_turns"] = resumed_turns
        return outs, stats

    # ------------------------------------------------------------------
    def serve_stream(self, prompts: Sequence, arrivals_s: Sequence[float],
                     max_new_tokens=None, eos_token_id: int = 2,
                     seed: int = 0, rounds_per_dispatch: int = 8,
                     clock=None, queue_order: str = "fifo",
                     starvation_cap: int | None = None,
                     shared_prefix=None, prefix_overlap: bool = True,
                     preempt_factor: float | None = None,
                     on_token=None):
        """Streaming-arrival continuous batching: request r only becomes
        admittable `arrivals_s[r]` seconds after serving starts. Between
        device dispatches the host appends newly-arrived requests to the
        device-resident queue and applies ALL lane surgery for the
        boundary (admissions, preemption pause/resume) in ONE jitted
        dispatch (see _get_boundary — the r3 per-lane write/read chain
        cost ~4-6 tunnel RTTs per admission); lanes that free up
        mid-dispatch pick arrivals up in-program (see _get_serve_scan's
        idle-lane refill). `rounds_per_dispatch` is therefore the
        admission granularity — small K admits sooner, large K amortizes
        dispatch RTT (the tradeoff EngineConfig documents for serve()).

        Validates the admission story r2's verdict flagged as unmeasured:
        returns per-request arrival->admission and arrival->completion
        wall latencies plus the exact on-device rounds accounting.
        `clock` (a () -> seconds callable) injects fake time for tests.

        `queue_order` != "fifo" turns on admission-aware budget scheduling:
        at every host boundary the ARRIVED-but-not-yet-admitted segment of
        the device queue is reordered by the policy (_queue_schedule) —
        "sjf" admits short requests ahead of long ones that arrived
        earlier (lower mean latency; can starve long requests under
        sustained load), "lpt" the reverse (drains the tail wave). Requests
        already admitted (or consumed mid-dispatch) keep their positions;
        future arrivals stay in arrival order until they land.

        `starvation_cap` bounds how many host-boundary reorders may jump a
        pending request before it is PROMOTED: once a request has been
        scheduled behind a later arrival `starvation_cap` times, it pins to
        the front of the pending segment (promoted requests keep arrival
        order among themselves) and the policy only orders the rest. This
        is classic aging-by-bypass-count — it makes sjf starvation-free
        under sustained short-job load while preserving its mean-latency
        win when no one waits long. None (default) keeps the pure policy.

        `shared_prefix` works as in serve(): the common prefix is
        prefilled once and lanes resume from it. With `prefix_overlap`
        (default on) a COLD template builds in a background thread while
        the first arrivals are served UN-prefixed — the blocking build
        measurably cost more than the prefix saved (r3 suite:
        stream_prefix_on_cold 49.2 tok/s / p50 13.4s vs off 54.2 / 9.8s).
        Host admissions switch to the template the moment it lands; the
        in-program refill path switches once every lane has been
        template-born (a lane that never held the prefix KV rows cannot
        resume at the prefix watermark). Greedy outputs are identical
        either way.

        `preempt_factor` enables PREEMPTIVE lane migration with a COST
        MODEL (r3 shipped the mechanism without one and lost 35-47%
        aggregate throughput per preemption). At a boundary where every
        lane is busy and a request is pending, the lane with the most
        remaining budget is paused — its exact state lifted off the lane
        in the same single boundary dispatch that admits the short — iff
        BOTH: (a) the pending request's budget * preempt_factor <= the
        victim's remaining budget (the user knob: how much shorter the
        short must be), and (b) the modeled wait until a lane frees
        naturally exceeds the short's modeled service time
        (chain rounds + decode rounds at the measured acceptance rate +
        OVERHEAD_ROUNDS for the swap dispatches) — preempting a lane that
        was about to free anyway is pure loss. While a request is paused
        the device queue is capped at its current head so the next freed
        lane is RESERVED for the resume (in-program refills would
        otherwise serialize every pending short ahead of it — the r3
        lonely-tail regression); the paused request resumes at the next
        boundary with a free lane, state intact, zero recompute. At most
        one request is paused at a time (a snapshot holds a full lane KV
        allocation). Rejected triggers are counted in
        stats["preempt_cost_skips"].

        `on_token(request_index, token)` streams tokens per dispatch as
        in serve()."""
        import math
        import time as _time
        n_req = len(prompts)
        assert len(arrivals_s) == n_req, (len(arrivals_s), n_req)
        if max_new_tokens is None:
            budgets = [self.cfg.max_new_tokens] * n_req
        elif np.ndim(max_new_tokens) == 0:
            budgets = [int(max_new_tokens)] * n_req
        else:
            budgets = [int(x) for x in max_new_tokens]
        b = self.batch_size
        k = max(1, int(rounds_per_dispatch))
        for p, mx in zip(prompts, budgets):
            self._check_budget(p, mx)
        if isinstance(shared_prefix, str):
            raise ValueError(
                "auto prefix detection needs the full workload upfront; "
                "pass explicit tokens to serve_stream")
        tstate, pfx_len = None, 0
        pfx_thread, pfx_box = None, {}
        if shared_prefix is not None:
            self._check_shared_prefix(prompts, shared_prefix)
            pkey = np.asarray(shared_prefix,
                              np.int32).reshape(-1).tobytes()
            if pkey in self._prefix_templates or not prefix_overlap:
                tstate, pfx_len = self._prefix_template(shared_prefix,
                                                        seed)
            else:
                # overlap the cold template build with serving (r3
                # verdict #3): build in a daemon thread (JAX dispatch is
                # thread-safe; the chip serializes the work), serve the
                # first arrivals un-prefixed, switch when it lands
                import threading

                def _build():
                    try:
                        pfx_box["t"] = self._prefix_template(
                            shared_prefix, seed)
                    except Exception as e:      # re-raised at a boundary
                        pfx_box["err"] = e
                pfx_thread = threading.Thread(target=_build, daemon=True)
                pfx_thread.start()
        # arrival order is the initial queue order (the device consumes the
        # queue front-to-back); non-fifo policies reorder the pending
        # segment at host boundaries below
        order = sorted(range(n_req), key=lambda r: arrivals_s[r])
        self._queue_schedule([], [], queue_order)    # validate policy name
        outs: List[list] = [list(np.asarray(p, np.int64)) for p in prompts]
        new_tokens = [0] * n_req
        finished = [False] * n_req
        admit_round = [-1] * n_req
        finish_round = [0] * n_req
        admit_s = [0.0] * n_req
        finish_s = [0.0] * n_req
        bypass_count = [0] * n_req   # aging state for starvation_cap

        p_cap = self.cfg.max_seq_len
        n_pad = max(8, 1 << (n_req - 1).bit_length())
        q_host = (np.zeros((n_pad, p_cap), np.int32),
                  np.zeros((n_pad,), np.int32),
                  np.zeros((n_pad,), np.int32))  # np source of truth

        def _write_queue_rows(lo: int):
            """(Re)write host queue rows lo..n_req-1 from `order`; the
            device copies are re-uploaded by the caller (the scan does not
            donate the queue arrays, so upload only on change)."""
            qp, ql, qb = q_host
            for qpos in range(lo, n_req):
                r = order[qpos]
                pr = np.asarray(prompts[r], np.int32).reshape(-1)
                qp[qpos] = 0
                qp[qpos, :len(pr)] = pr
                ql[qpos] = len(pr)
                qb[qpos] = budgets[r]
            return tuple(jnp.asarray(a) for a in q_host)

        q_prompts, q_lens, q_budgets = _write_queue_rows(0)

        t0 = _time.perf_counter()
        now = (lambda: _time.perf_counter() - t0) if clock is None else clock
        if tstate is None:
            batched = self._stack_states(
                [self.init_state(seed + 1000 + s) for s in range(b)])
        else:
            batched = self._lanes_from_template(
                tstate, [-1] * b, [seed + 1000 + s for s in range(b)])
        bctx = self._stack_states(
            [self._serve_ctx(None) for _ in range(b)])
        emitted = jnp.zeros((b,), jnp.int32)
        lane_budget = jnp.full((b,), 2 ** 30, jnp.int32)
        lane_np = [-1] * b           # host mirror: values index `order`
        em_np = [0] * b
        bud_np = [2 ** 30] * b
        born = [tstate is not None] * b   # lane KV holds the prefix rows
        qh_host = 0

        rounds = 0
        busy_slot_rounds = 0
        # parked: (state, ctx, em, bud, qpos, born) — at most one
        parked = None
        preemptions = 0
        cost_skips = 0
        width_switches = 0
        min_width = b
        cap_rounds = 0
        while not all(finished):
            t = now()
            n_arrived = sum(1 for r in order if arrivals_s[r] <= t)
            # all lanes idle, nothing parked, nothing arrived yet: wait for
            # the next arrival instead of spinning empty dispatches
            if (parked is None and n_arrived <= qh_host
                    and all(l < 0 for l in lane_np)):
                nxt = min((arrivals_s[r] for r in order
                           if arrivals_s[r] > t), default=None)
                if nxt is None:
                    break
                if clock is None:
                    _time.sleep(max(0.0, nxt - now()))
                continue
            # admission-aware budget scheduling: reorder the pending
            # (arrived, position >= qh_host) queue segment by policy;
            # future arrivals keep arrival order behind it
            if queue_order != "fifo" and n_arrived > qh_host:
                pend = [r for r in order[qh_host:] if arrivals_s[r] <= t]
                fut = [r for r in order[qh_host:] if arrivals_s[r] > t]
                if starvation_cap is not None:
                    promoted = [r for r in pend
                                if bypass_count[r] >= starvation_cap]
                    promoted.sort(key=lambda r: (arrivals_s[r], r))
                    rest = [r for r in pend
                            if bypass_count[r] < starvation_cap]
                    sched = promoted + self._queue_schedule(
                        rest, budgets, queue_order)
                    # a pending request is bypassed this boundary when a
                    # LATER arrival is scheduled ahead of it
                    for i, r in enumerate(sched):
                        if any((arrivals_s[x], x) > (arrivals_s[r], r)
                               for x in sched[:i]):
                            bypass_count[r] += 1
                else:
                    sched = self._queue_schedule(pend, budgets, queue_order)
                new_tail = sched + fut
                if new_tail != order[qh_host:]:
                    order[qh_host:] = new_tail
                    q_prompts, q_lens, q_budgets = _write_queue_rows(
                        qh_host)
            # cold prefix template landed?
            if pfx_thread is not None and not pfx_thread.is_alive():
                pfx_thread.join()
                if "err" in pfx_box:
                    raise pfx_box["err"]
                tstate, pfx_len = pfx_box["t"]
                pfx_thread = None

            # ---- dynamic batch width (dynamic_batch): re-bucket the
            # dispatch to the lanes this moment needs — active + pending
            # + a reserve slot for a parked resume; active lanes permute
            # to the front, grown lanes are deactivated placeholders
            if self.dynamic_batch:
                n_act = sum(1 for l in lane_np if l >= 0)
                want = (n_act + max(0, n_arrived - qh_host)
                        + (1 if parked is not None else 0))
                w = self._serve_width(want)
                cur = len(lane_np)
                if w != cur:
                    src = ([s for s in range(cur) if lane_np[s] >= 0]
                           + [s for s in range(cur) if lane_np[s] < 0])
                    perm = (src + [0] * max(0, w - len(src)))[:w]
                    keep = [i < min(len(src), w) for i in range(w)]
                    batched, bctx, emitted, lane_budget = \
                        self._resize_lanes(batched, bctx, emitted,
                                           lane_budget, perm, keep)
                    rm = lambda xs, fill: [
                        xs[perm[i]] if keep[i] else fill for i in range(w)]
                    lane_np = rm(lane_np, -1)
                    em_np = rm(em_np, 0)
                    bud_np = rm(bud_np, 2 ** 30)
                    born = rm(born, False)
                    width_switches += 1
            wb = len(lane_np)
            min_width = min(min_width, wb)

            # ---- boundary plan: ONE fused dispatch for all surgery ----
            use_tpl = tstate is not None
            src_sel = [0] * wb
            fresh_qpos, fresh_sfx = [-1] * wb, [-1] * wb
            fresh_seed, fresh_pos = [0] * wb, [0] * wb
            pause_idx, plan_parked, parked_meta = -1, None, None
            changed = False
            if parked is not None:
                free = [s for s in range(wb) if lane_np[s] == -1]
                if free:
                    s = free[0]
                    src_sel[s] = 1
                    plan_parked = parked[:4]
                    lane_np[s], em_np[s], bud_np[s] = (
                        parked[4], parked[2], parked[3])
                    born[s] = parked[5]
                    parked = None
                    changed = True
            for s in range(wb):
                if lane_np[s] != -1 or qh_host >= n_arrived:
                    continue
                r = order[qh_host]
                pr = np.asarray(prompts[r], np.int32).reshape(-1)
                src_sel[s] = 2
                fresh_qpos[s] = qh_host
                fresh_sfx[s] = int(pr[pfx_len]) if use_tpl else -1
                fresh_seed[s] = seed + qh_host
                fresh_pos[s] = pfx_len if use_tpl else 0
                born[s] = use_tpl
                lane_np[s], em_np[s], bud_np[s] = qh_host, 0, budgets[r]
                qh_host += 1
                changed = True
            # preemption: every lane busy, work pending, nothing parked,
            # trigger + cost model both pass
            victims = [s for s in range(wb) if src_sel[s] == 0]
            if (preempt_factor is not None and parked is None
                    and qh_host < n_arrived and victims
                    and all(l >= 0 for l in lane_np)):
                accept_est = max(
                    sum(new_tokens) / busy_slot_rounds, 0.5) \
                    if busy_slot_rounds else 1.0
                remaining = [bud_np[s] - em_np[s] for s in range(wb)]
                # only lanes untouched by this boundary are eligible: a
                # lane being resumed/filled this very call would snapshot
                # its STALE pre-boundary content
                v = max(victims, key=lambda s: remaining[s])
                r = order[qh_host]
                suffix = max(len(np.asarray(prompts[r]).reshape(-1))
                             - (pfx_len if use_tpl else 0), 1)
                d_cap = self.cfg.tree.depth_cap
                service = (math.ceil(suffix / d_cap)
                           + math.ceil(budgets[r] / accept_est)
                           + OVERHEAD_ROUNDS)
                rounds_to_free = min(remaining) / accept_est
                if budgets[r] * preempt_factor <= remaining[v]:
                    if rounds_to_free > service:
                        pause_idx = v
                        parked_meta = (lane_np[v], em_np[v], bud_np[v],
                                       born[v])
                        pr = np.asarray(prompts[r], np.int32).reshape(-1)
                        src_sel[v] = 2
                        fresh_qpos[v] = qh_host
                        fresh_sfx[v] = int(pr[pfx_len]) if use_tpl else -1
                        fresh_seed[v] = seed + qh_host
                        fresh_pos[v] = pfx_len if use_tpl else 0
                        born[v] = use_tpl
                        lane_np[v], em_np[v], bud_np[v] = (
                            qh_host, 0, budgets[r])
                        qh_host += 1
                        preemptions += 1
                        changed = True
                    else:
                        cost_skips += 1
            if changed:
                (batched, bctx, emitted, lane_budget,
                 snap) = self._run_boundary(
                    batched, bctx, emitted, lane_budget,
                    dict(src_sel=src_sel, fresh_qpos=fresh_qpos,
                         fresh_sfx=fresh_sfx, fresh_seed=fresh_seed,
                         fresh_pos=fresh_pos, pause_idx=pause_idx,
                         parked=plan_parked,
                         tstate=tstate if use_tpl else None),
                    q_prompts, q_lens, q_budgets)
                if snap is not None:
                    parked = (snap[0], snap[1], parked_meta[1],
                              parked_meta[2], parked_meta[0],
                              parked_meta[3])
            for qpos in range(qh_host):
                r = order[qpos]
                if admit_round[r] < 0:
                    admit_round[r] = rounds
                    admit_s[r] = now()

            # while parked, the device queue is capped at the current head
            # so freed lanes are reserved for the resume
            n_q_pass = qh_host if parked is not None else n_arrived
            n_active = sum(1 for l in lane_np if l >= 0)
            scan_k = self._get_serve_scan(k, self._serve_tree(n_active))
            all_born = use_tpl and all(born)
            tmpl = self._template_consts(tstate if all_born else None)
            pre_lane = list(lane_np)
            (batched, bctx, lane_req, emitted, lane_budget, qhead,
             packed) = scan_k(
                batched, self.params, self.draft, self.beam_head, bctx,
                jnp.asarray(lane_np, jnp.int32), emitted, lane_budget,
                jnp.asarray(qh_host, jnp.int32),
                q_prompts, q_lens, q_budgets,
                jnp.asarray(n_q_pass, jnp.int32),
                jnp.asarray(eos_token_id, jnp.int32),
                jnp.asarray(seed, jnp.int32),
                jnp.asarray(False), *tmpl)
            packed = np.asarray(packed)          # ONE device->host fetch
            n_exec = int(packed[-1, 0, 0])
            lane_np = [int(x) for x in packed[-1, :, 1]]
            em_np = [int(x) for x in packed[-1, :, 2]]
            bud_np = [int(x) for x in packed[-1, :, 3]]
            qh_host = int(packed[-1, 0, 4])
            if not all_born:
                # in-program refills ran with the zero template: any lane
                # the device touched no longer holds the prefix rows
                for s in range(wb):
                    if lane_np[s] != pre_lane[s]:
                        born[s] = False
            accs = packed[:-1, :, :-2]
            naccs = packed[:-1, :, -2]
            reqs = packed[:-1, :, -1]
            t_end = now()
            cap_rounds += n_exec * wb
            for j in range(n_exec):
                for s in range(wb):
                    qpos = int(reqs[j, s])
                    if qpos < 0:
                        continue
                    r = order[qpos]
                    if finished[r]:
                        continue
                    if admit_round[r] < 0:     # admitted in-device
                        admit_round[r] = rounds + j
                        admit_s[r] = t_end
                    busy_slot_rounds += 1
                    for tk in accs[j, s][:naccs[j, s]]:
                        outs[r].append(int(tk))
                        new_tokens[r] += 1
                        if on_token is not None:
                            on_token(r, int(tk))
                        if int(tk) == eos_token_id or \
                                new_tokens[r] >= budgets[r]:
                            finished[r] = True
                            finish_round[r] = rounds + j + 1
                            finish_s[r] = t_end
                            break
            rounds += max(n_exec, 0)
            if n_exec == 0 and clock is not None:
                # fake clock with nothing runnable: let the test advance it
                continue
        lat_admit = [admit_s[r] - arrivals_s[r] for r in range(n_req)]
        lat_total = [finish_s[r] - arrivals_s[r] for r in range(n_req)]
        q = lambda xs, p_: float(np.percentile(np.asarray(xs), p_))
        total = sum(new_tokens)
        return outs, {
            "new_tokens": total, "rounds": rounds,
            "per_request": new_tokens,
            "latency_rounds": [finish_round[r] - admit_round[r]
                               for r in range(n_req)],
            "admit_rounds": admit_round,
            "admission_s": lat_admit,
            "completion_s": lat_total,
            "preemptions": preemptions,
            "preempt_cost_skips": cost_skips,
            "width_switches": width_switches,
            "min_width": min_width,
            "accept_per_round": total / max(busy_slot_rounds, 1),
            "admission_p50_s": q(lat_admit, 50),
            "admission_p95_s": q(lat_admit, 95),
            "completion_p50_s": q(lat_total, 50),
            "completion_p95_s": q(lat_total, 95),
            "slot_utilization": busy_slot_rounds / max(cap_rounds, 1)}
