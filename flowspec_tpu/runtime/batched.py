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
from flowspec_tpu.models.llama import LlamaParams
from flowspec_tpu.runtime.engine import (
    ServeCtx, SpecEngine, _spec_decode_loop, _spec_round,
)


class BatchedSpecEngine(SpecEngine):
    """SpecEngine plus vmapped multi-request decoding over B slots."""

    def __init__(self, params: LlamaParams, draft: EagleParams,
                 cfg: EngineConfig, batch_size: int = 4):
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

    def _get_serve_scan(self, k_rounds: int):
        """Up to K serve-rounds fused into one device program: the host
        dispatches once per K rounds instead of once per round, amortizing
        the per-call dispatch RTT (~70ms through the tunneled backend — at
        ~30ms rounds, K=1 serve ran at ~30% of device throughput). The
        while_loop exits EARLY the moment any lane completes its request
        (budget reached or eos emitted), so a freed slot is refilled at the
        very next dispatch and never idles — the round-level refill
        semantics (and slot utilization) of the K=1 loop are preserved
        exactly. Lanes whose commit_len is out of budget-headroom are
        frozen (old state selected back) so garbage rounds past a finished
        request can never clamp-write over valid KV rows."""
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

            def run_k(batched, params, draft, beam_head, bctx, remaining,
                      eos_id):
                """remaining: (B,) tokens left per slot (inactive lanes pass
                a sentinel that can't be reached). Returns the executed
                round count `n` and the per-round token rows [:n]."""
                b = remaining.shape[0]
                accs0 = jnp.zeros((k, b, d_cap), jnp.int32)
                naccs0 = jnp.zeros((k, b), jnp.int32)
                emitted0 = jnp.zeros((b,), jnp.int32)
                lane_done0 = jnp.zeros((b,), bool)
                i0 = jnp.zeros((), jnp.int32)

                def cond(c):
                    st, ctx, accs, naccs, emitted, lane_done, i = c
                    return (i < k) & ~jnp.any(lane_done)

                # lanes with no live request pass a sentinel budget; their
                # garbage tokens must not trip the early exit (an empty
                # tail-wave slot would otherwise force K=1 dispatches)
                lane_live = remaining < jnp.int32(2 ** 30)

                def body(c):
                    st, ctx, accs, naccs, emitted, lane_done, i = c
                    ok = st.commit_len <= seq_limit          # (B,)
                    st2, res, ctx2 = vround(st, params, draft, beam_head,
                                            ctx)
                    sel = lambda a, b_: jnp.where(
                        jnp.reshape(ok, ok.shape + (1,) * (a.ndim - 1)),
                        a, b_)
                    # (a lax.cond skipping this select when all lanes are
                    # in budget was tried and abandoned un-measured — the
                    # tunneled backend went UNAVAILABLE under it; the plain
                    # select is also what the fixed-batch fused loop pays,
                    # which still reaches 62.6 tok/s)
                    st3 = jax.tree_util.tree_map(sel, st2, st)
                    ctx3 = jax.tree_util.tree_map(sel, ctx2, ctx)
                    n_j = jnp.where(ok, res.n_accepted, 0)   # (B,)
                    valid = jnp.arange(d_cap)[None, :] < n_j[:, None]
                    eos_hit = lane_live & jnp.any(
                        valid & (res.accepted == eos_id) & (eos_id >= 0),
                        axis=1)
                    emitted2 = emitted + n_j
                    done2 = lane_done | eos_hit | (emitted2 >= remaining)
                    return (st3, ctx3, accs.at[i].set(res.accepted),
                            naccs.at[i].set(n_j), emitted2, done2, i + 1)

                st, ctx, accs, naccs, _, _, n = jax.lax.while_loop(
                    cond, body,
                    (batched, bctx, accs0, naccs0, emitted0, lane_done0,
                     i0))
                # pack everything the host reads into ONE buffer: each
                # fetched leaf costs a device->host round trip (~70ms
                # through the tunnel), so (accs, naccs, n) as separate
                # arrays tripled the per-dispatch fetch cost.
                # packed[j, s, :d_cap] = accepted tokens of round j, slot s
                # packed[j, s,  d_cap] = n_accepted
                # packed[k, 0, 0]      = executed round count
                packed = jnp.concatenate(
                    [accs, naccs[..., None]], axis=-1)      # (K, B, D+1)
                tail = jnp.zeros((1, b, d_cap + 1),
                                 jnp.int32).at[0, 0, 0].set(n)
                return st, ctx, jnp.concatenate([packed, tail], axis=0)

            self._serve_scans[k_rounds] = jax.jit(run_k,
                                                  donate_argnums=(0, 4))
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

    def _write_slot(self, batched, state, b: int):
        return jax.tree_util.tree_map(
            lambda bx, x: bx.at[b].set(x), batched, state)

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
    def _serve_ctx(self, prompt=None):
        """ServeCtx for one slot; empty (inactive) when prompt is None."""
        p_cap = self.cfg.max_seq_len
        buf = np.zeros((p_cap,), np.int32)
        n = 0
        if prompt is not None:
            pr = np.asarray(prompt, np.int32).reshape(-1)
            n = len(pr)
            buf[:n] = pr
        return ServeCtx(prompt_buf=jnp.asarray(buf),
                        prompt_len=jnp.asarray(n, jnp.int32),
                        prompt_pos=jnp.zeros((), jnp.int32),
                        active=jnp.asarray(prompt is not None))

    def serve(self, prompts: Sequence, max_new_tokens=None,
              eos_token_id: int = 2, seed: int = 0,
              rounds_per_dispatch: int = 8):
        """TOKEN-LEVEL continuous batching: up to `batch_size` slots run
        synchronized rounds; a slot whose request finishes is refilled from
        the queue and spends its next rounds consuming prompt-chain chunks
        (emitting nothing) while the other slots keep decoding — a refill
        never stalls the batch (the reference cannot serve at all: batch
        size 1 is asserted at eagle/kv_cache.py:91). Returns outputs in
        `prompts` order plus utilization stats.

        Up to `rounds_per_dispatch` rounds run fused in one device program
        per host dispatch (the device loop exits early when any lane
        finishes, so refills still land on the exact finishing round);
        dispatch overhead drops to ~1/K without losing slot utilization.

        `max_new_tokens` may be a single budget or one per request."""
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
        scan_k = self._get_serve_scan(k)
        queue = list(range(n_req))
        outs: List[list] = [list(np.asarray(p, np.int64)) for p in prompts]
        new_tokens = [0] * n_req
        finished = [False] * n_req
        admit_round = [0] * n_req    # round index when the slot was filled
        finish_round = [0] * n_req

        slot_req = [-1] * b          # which request occupies each slot
        states, ctxs = [], []
        for s in range(b):
            r = queue.pop(0) if queue else -1
            slot_req[s] = r
            states.append(self.init_state(seed + (r if r >= 0 else 1000 + s)))
            ctxs.append(self._serve_ctx(prompts[r] if r >= 0 else None))
        batched = self._stack_states(states)
        bctx = self._stack_states(ctxs)

        rounds = 0
        busy_slot_rounds = 0
        sentinel = np.int32(2**30)   # inactive lanes can never reach it
        while any(r >= 0 for r in slot_req):
            remaining = jnp.asarray(
                [budgets[r] - new_tokens[r] if r >= 0 else sentinel
                 for r in slot_req], jnp.int32)
            batched, bctx, packed = scan_k(
                batched, self.params, self.draft, self.beam_head, bctx,
                remaining, jnp.asarray(eos_token_id, jnp.int32))
            packed = np.asarray(packed)          # ONE device->host fetch
            n_exec = int(packed[-1, 0, 0])
            accs = packed[:-1, :, :-1]           # (K, B, depth_cap)
            naccs = packed[:-1, :, -1]           # (K, B)
            refill = [False] * b
            for s in range(b):
                r = slot_req[s]
                if r < 0:
                    continue
                for j in range(n_exec):
                    if finished[r]:
                        break
                    busy_slot_rounds += 1
                    for t in accs[j, s][:naccs[j, s]]:
                        outs[r].append(int(t))
                        new_tokens[r] += 1
                        if int(t) == eos_token_id or \
                                new_tokens[r] >= budgets[r]:
                            finished[r] = True
                            finish_round[r] = rounds + j + 1
                            break
                refill[s] = finished[r]
            rounds += n_exec
            for s in range(b):
                if not refill[s]:
                    continue
                # refill with a fresh state + prompt context: the new
                # request prefills chain-wise inside subsequent rounds
                nr = queue.pop(0) if queue else -1
                slot_req[s] = nr
                batched = self._write_slot(
                    batched, self.init_state(seed + max(nr, 0)), s)
                bctx = self._write_slot(
                    bctx, self._serve_ctx(
                        prompts[nr] if nr >= 0 else None), s)
                if nr >= 0:
                    admit_round[nr] = rounds
        total = sum(new_tokens)
        return outs, {"new_tokens": total, "rounds": rounds,
                      "per_request": new_tokens,
                      # per-request latency in rounds, admission->finish
                      # (admission = slot fill; includes prompt-chain
                      # prefill rounds)
                      "latency_rounds": [finish_round[r] - admit_round[r]
                                         for r in range(n_req)],
                      "slot_utilization": busy_slot_rounds
                      / max(rounds * b, 1)}
