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


class BatchedSpecEngine(SpecEngine):
    """SpecEngine plus vmapped multi-request decoding over B slots."""

    def __init__(self, params: LlamaParams, draft: EagleParams,
                 cfg: EngineConfig, batch_size: int = 4,
                 adapt_tree: bool = True):
        """`adapt_tree` (default on) applies the measured batch->tree-size
        table (see adapt_tree_for_batch); pass False to pin the configured
        tree (e.g. for exact-output parity tests against SpecEngine under
        stochastic sampling, where tree shape affects the sampled path)."""
        if adapt_tree:
            import dataclasses
            cfg = dataclasses.replace(
                cfg, tree=adapt_tree_for_batch(cfg.tree, batch_size))
        super().__init__(params, draft, cfg)
        self.batch_size = batch_size
        cfg = self.cfg    # SpecEngine clamps the tree caps; stay consistent
        self._vround = jax.jit(jax.vmap(
            functools.partial(_spec_round, cfg=cfg.model, tree_cfg=cfg.tree,
                              sampling=cfg.sampling,
                              force_accept=cfg.force_accept),
            in_axes=(0, None, None, None)), donate_argnums=(0,))
        self._vloops = {}
        # serve dispatch programs (mixed prefill/decode lanes, ServeCtx
        # vmapped along 0), keyed by rounds-per-dispatch
        self._serve_scans = {}
        # shared-prefix templates keyed by the prefix tokens (a template
        # holds a full KV allocation — a few hundred MB at 7B — so keep
        # only the most recent two)
        self._prefix_templates = {}
        self._lanes_jit = None
        self._lane_jit = None
        self._write_slot_jit = None
        self._read_slot_jit = None

    def _get_serve_scan(self, k_rounds: int):
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
        never clamp-write over valid KV rows."""
        if k_rounds not in self._serve_scans:
            cfg = self.cfg
            vround = jax.vmap(
                functools.partial(_spec_round, cfg=cfg.model,
                                  tree_cfg=cfg.tree, sampling=cfg.sampling,
                                  force_accept=cfg.force_accept),
                in_axes=(0, None, None, None, 0))
            seq_limit = cfg.max_seq_len - cfg.tree.depth_cap - 1
            d_cap = cfg.tree.depth_cap
            k = k_rounds
            big = jnp.int32(2 ** 30)

            def run_k(batched, params, draft, beam_head, bctx,
                      lane_req, emitted, lane_budget, qhead,
                      q_prompts, q_lens, q_budgets, n_q, eos_id, seed,
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
                Returns the carried lane arrays plus one packed buffer:
                packed[j, s, :d_cap]  = accepted tokens of round j, slot s
                packed[j, s,  d_cap]  = n_accepted
                packed[j, s,  d_cap+1]= request id the slot served
                packed[k, 0, 0]       = executed round count."""
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
                    # a lane is refillable when its request just finished OR
                    # it was already idle (streaming arrivals can repopulate
                    # the queue after a lane drained it — serve_stream)
                    free = fin | ((req < 0) & ~ctx3.active)

                    # record BEFORE refill: this round's tokens belong to
                    # the finishing request
                    row = jnp.concatenate(
                        [res.accepted, n_j[:, None], req[:, None]], axis=1)
                    accs2 = accs.at[i].set(row)

                    # ---- device-side refill ------------------------------
                    qidx = qh + jnp.cumsum(free.astype(jnp.int32)) - 1
                    has = free & (qidx < n_q)
                    qsafe = jnp.clip(qidx, 0, n_pad - 1)
                    req2 = jnp.where(free, jnp.where(has, qidx, -1), req)
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
                        active=jnp.where(free, has, ctx3.active))
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
                tail = jnp.zeros((1, b, d_cap + 2),
                                 jnp.int32).at[0, 0, 0].set(n)
                packed = jnp.concatenate([accs, tail], axis=0)
                return st, ctx, req, em, bud, qh, packed

            self._serve_scans[k_rounds] = jax.jit(
                run_k, donate_argnums=(0, 4, 5, 6, 7, 8))
        return self._serve_scans[k_rounds]

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

    def _lane_from_template(self, tstate, first_sfx, key_seed: int):
        """A lane EngineState resuming from the prefix template for a
        request whose first post-prefix token is `first_sfx` — one jitted
        dispatch (this sits on the streaming admission path)."""
        if self._lane_jit is None:
            import dataclasses as dc

            def one(t, s, sd):
                pt = t.pending_tokens.at[t.n_pending - 1].set(s)
                return dc.replace(t, pending_tokens=pt, root_token=s,
                                  key=jax.random.key(sd))
            self._lane_jit = jax.jit(one)
        return self._lane_jit(tstate, jnp.asarray(int(first_sfx), jnp.int32),
                              jnp.asarray(key_seed, jnp.int32))

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
              on_token=None):
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
        sooner at more dispatch overhead, the same tradeoff as
        admission."""
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
        scan_k = self._get_serve_scan(k)
        outs: List[list] = [list(np.asarray(p, np.int64)) for p in prompts]
        new_tokens = [0] * n_req
        finished = [False] * n_req
        admit_round = [0] * n_req    # round index when the slot was filled
        finish_round = [0] * n_req

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

        # initial fill: slots 0..b-1 take queue entries 0..b-1 on host (the
        # device path only refills on completion). Seeds are keyed by queue
        # position to match the device refill's jax.random.key(seed + qpos).
        slot_q = [s if s < n_req else -1 for s in range(b)]
        ctxs, sfx, kseeds = [], [], []
        for s in range(b):
            qp = slot_q[s]
            kseeds.append(seed + (qp if qp >= 0 else 1000 + s))
            pr = (np.asarray(prompts[order[qp]], np.int32).reshape(-1)
                  if qp >= 0 else None)
            sfx.append(int(pr[pfx_len]) if pr is not None else -1)
            ctxs.append(self._serve_ctx(pr, prompt_pos=pfx_len))
        if tstate is None:
            batched = self._stack_states(
                [self.init_state(ks) for ks in kseeds])
        else:
            batched = self._lanes_from_template(tstate, sfx, kseeds)
        bctx = self._stack_states(ctxs)
        lane_req = jnp.asarray(slot_q, jnp.int32)
        emitted = jnp.zeros((b,), jnp.int32)
        lane_budget = jnp.asarray(
            [budgets[order[qp]] if qp >= 0 else 2 ** 30 for qp in slot_q],
            jnp.int32)
        qhead = jnp.asarray(min(b, n_req), jnp.int32)

        rounds = 0
        busy_slot_rounds = 0
        first_seen = [-1] * n_req
        for qp in range(min(b, n_req)):
            first_seen[order[qp]] = 0
        tmpl = self._template_consts(tstate)
        while not all(finished):
            (batched, bctx, lane_req, emitted, lane_budget, qhead,
             packed) = scan_k(
                batched, self.params, self.draft, self.beam_head, bctx,
                lane_req, emitted, lane_budget, qhead,
                q_prompts, q_lens, q_budgets,
                jnp.asarray(n_req, jnp.int32),
                jnp.asarray(eos_token_id, jnp.int32),
                jnp.asarray(seed, jnp.int32), *tmpl)
            packed = np.asarray(packed)          # ONE device->host fetch
            n_exec = int(packed[-1, 0, 0])
            assert n_exec > 0, "serve scan made no progress"
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
        total = sum(new_tokens)
        return outs, {"new_tokens": total, "rounds": rounds,
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

    # ------------------------------------------------------------------
    def serve_stream(self, prompts: Sequence, arrivals_s: Sequence[float],
                     max_new_tokens=None, eos_token_id: int = 2,
                     seed: int = 0, rounds_per_dispatch: int = 8,
                     clock=None, queue_order: str = "fifo",
                     starvation_cap: int | None = None,
                     shared_prefix=None,
                     preempt_factor: float | None = None,
                     on_token=None):
        """Streaming-arrival continuous batching: request r only becomes
        admittable `arrivals_s[r]` seconds after serving starts. Between
        device dispatches the host appends newly-arrived requests to the
        device-resident queue (the dispatch donates lane state but not the
        queue arrays) and fills any fully-idle batch; lanes that free up
        mid-dispatch pick arrivals up in-program (see _get_serve_scan's
        idle-lane refill). `rounds_per_dispatch` is therefore the admission
        granularity — small K admits sooner, large K amortizes dispatch RTT
        (the tradeoff EngineConfig documents for serve()).

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
        prefilled once, every lane (and every in-program refill) resumes
        from it, and arrivals consume only their suffix.

        `preempt_factor` enables PREEMPTIVE lane migration: at a host
        boundary where every lane is busy and a request is pending, the
        lane with the most remaining budget is PAUSED — its exact engine
        state (KV, queued pairs, RNG key) is lifted off the lane — when
        `pending_budget * preempt_factor <= remaining`, and the pending
        request takes the lane. The paused request resumes, state intact
        and with priority over new admissions, at the first host boundary
        with an idle lane; zero tokens are recomputed, so its stream is
        exactly what it would have produced uninterrupted. At most one
        request is paused at a time (a snapshot holds a full lane KV
        allocation). None (default) disables preemption.

        `on_token(request_index, token)` streams tokens per dispatch as
        in serve()."""
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
        if shared_prefix is not None:
            self._check_shared_prefix(prompts, shared_prefix)
            tstate, pfx_len = self._prefix_template(shared_prefix, seed)
        tmpl = self._template_consts(tstate)
        # arrival order is the initial queue order (the device consumes the
        # queue front-to-back); non-fifo policies reorder the pending
        # segment at host boundaries below
        order = sorted(range(n_req), key=lambda r: arrivals_s[r])
        self._queue_schedule([], [], queue_order)    # validate policy name
        scan_k = self._get_serve_scan(k)
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
        ctxs = [self._serve_ctx(None) for _ in range(b)]
        if tstate is None:
            batched = self._stack_states(
                [self.init_state(seed + 1000 + s) for s in range(b)])
        else:
            batched = self._lanes_from_template(
                tstate, [-1] * b, [seed + 1000 + s for s in range(b)])
        bctx = self._stack_states(ctxs)
        lane_req = jnp.full((b,), -1, jnp.int32)   # values index `order`
        emitted = jnp.zeros((b,), jnp.int32)
        lane_budget = jnp.full((b,), 2 ** 30, jnp.int32)
        qhead = jnp.asarray(0, jnp.int32)

        rounds = 0
        busy_slot_rounds = 0
        paused = {}     # qpos -> (EngineState, ServeCtx, emitted) snapshots
        preemptions = 0
        while not all(finished):
            t = now()
            n_arrived = sum(1 for r in order if arrivals_s[r] <= t)
            # all lanes idle, nothing paused, nothing arrived yet: wait for
            # the next arrival instead of spinning empty dispatches
            if (not paused and n_arrived <= int(qhead)
                    and not np.any(np.asarray(lane_req) >= 0)):
                nxt = min((arrivals_s[r] for r in order
                           if arrivals_s[r] > t), default=None)
                if nxt is None:
                    break
                if clock is None:
                    _time.sleep(max(0.0, nxt - now()))
                continue
            # admission-aware budget scheduling: reorder the pending
            # (arrived, position >= qhead) queue segment by policy; future
            # arrivals keep arrival order behind it
            qh0 = int(qhead)
            if queue_order != "fifo" and n_arrived > qh0:
                pend = [r for r in order[qh0:] if arrivals_s[r] <= t]
                fut = [r for r in order[qh0:] if arrivals_s[r] > t]
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
                if new_tail != order[qh0:]:
                    order[qh0:] = new_tail
                    q_prompts, q_lens, q_budgets = _write_queue_rows(qh0)
            lane_np = np.array(lane_req)       # writable copy
            qh = int(qhead)
            # preemption: every lane busy, work pending, nothing paused yet
            # -> pause the lane with the most remaining budget if the head
            # pending request is preempt_factor-times shorter
            fresh_pause = None
            if (preempt_factor is not None and not paused
                    and qh < n_arrived and np.all(lane_np >= 0)):
                em_np = np.asarray(emitted)
                bud_np = np.asarray(lane_budget)
                remaining = bud_np - em_np
                v = int(np.argmax(remaining))
                p_next = order[qh]
                if budgets[p_next] * preempt_factor <= remaining[v]:
                    fresh_pause = int(lane_np[v])
                    paused[fresh_pause] = (
                        self._read_slot(batched, v),
                        self._read_slot(bctx, v), int(em_np[v]))
                    lane_np[v] = -1
                    preemptions += 1
            # host fill: idle lanes resume paused requests first (their
            # state is restored exactly — zero recompute), then take
            # arrived queue entries (the device path needs >= 1 active
            # lane to run rounds)
            for s in range(b):
                if lane_np[s] >= 0:
                    continue
                resumable = sorted(q_ for q_ in paused if q_ != fresh_pause)
                if resumable:
                    qpos = resumable[0]
                    st, ctx, em = paused.pop(qpos)
                    batched = self._write_slot(batched, st, s)
                    bctx = self._write_slot(bctx, ctx, s)
                    lane_np[s] = qpos
                    emitted = emitted.at[s].set(em)
                    lane_budget = lane_budget.at[s].set(
                        budgets[order[qpos]])
                elif qh < n_arrived:
                    r = order[qh]
                    # PRNG keyed by QUEUE POSITION (seed + qh), matching the
                    # in-program device refill (jax.random.key(seed + qidx))
                    # and serve()'s host fill — keying by request id made a
                    # stochastic stream depend on which path admitted it and
                    # could collide with a position-keyed lane (advisor r3)
                    if tstate is None:
                        st = self.init_state(seed + qh)
                    else:
                        pr = np.asarray(prompts[r], np.int32).reshape(-1)
                        st = self._lane_from_template(
                            tstate, int(pr[pfx_len]), seed + qh)
                    batched = self._write_slot(batched, st, s)
                    bctx = self._write_slot(bctx, self._serve_ctx(
                        prompts[r], prompt_pos=pfx_len), s)
                    lane_np[s] = qh
                    emitted = emitted.at[s].set(0)
                    lane_budget = lane_budget.at[s].set(budgets[r])
                    qh += 1
            lane_req = jnp.asarray(lane_np)
            qhead = jnp.asarray(qh, jnp.int32)
            for qpos in range(qh):
                r = order[qpos]
                if admit_round[r] < 0:
                    admit_round[r] = rounds
                    admit_s[r] = now()

            (batched, bctx, lane_req, emitted, lane_budget, qhead,
             packed) = scan_k(
                batched, self.params, self.draft, self.beam_head, bctx,
                lane_req, emitted, lane_budget, qhead,
                q_prompts, q_lens, q_budgets,
                jnp.asarray(n_arrived, jnp.int32),
                jnp.asarray(eos_token_id, jnp.int32),
                jnp.asarray(seed, jnp.int32), *tmpl)
            packed = np.asarray(packed)
            n_exec = int(packed[-1, 0, 0])
            accs = packed[:-1, :, :-2]
            naccs = packed[:-1, :, -2]
            reqs = packed[:-1, :, -1]
            t_end = now()
            for j in range(n_exec):
                for s in range(b):
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
            "accept_per_round": total / max(busy_slot_rounds, 1),
            "admission_p50_s": q(lat_admit, 50),
            "admission_p95_s": q(lat_admit, 95),
            "completion_p50_s": q(lat_total, 50),
            "completion_p95_s": q(lat_total, 95),
            "slot_utilization": busy_slot_rounds / max(rounds * b, 1)}
