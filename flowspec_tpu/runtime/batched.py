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

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flowspec_tpu.config import EngineConfig
from flowspec_tpu.draft.eagle import EagleParams
from flowspec_tpu.models.llama import LlamaParams
from flowspec_tpu.runtime.engine import (
    SpecEngine, _spec_decode_loop, _spec_round,
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
                              sampling=cfg.sampling),
            in_axes=(0, None, None, None)), donate_argnums=(0,))
        self._vloops = {}

    def _get_vloop(self, max_out: int):
        """max_out is static to the loop body, so each budget gets its own
        jitted vmapped program (cached)."""
        if max_out not in self._vloops:
            cfg = self.cfg
            f = functools.partial(
                _spec_decode_loop, cfg=cfg.model, tree_cfg=cfg.tree,
                sampling=cfg.sampling, max_out=max_out)
            self._vloops[max_out] = jax.jit(
                jax.vmap(f, in_axes=(0, None, None, None, None, None)))
        return self._vloops[max_out]

    # ------------------------------------------------------------------
    def _stack_states(self, states):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

    def _write_slot(self, batched, state, b: int):
        return jax.tree_util.tree_map(
            lambda bx, x: bx.at[b].set(x), batched, state)

    def _prefill_one(self, prompt, seed):
        st = self.init_state(seed)
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
        while_loop); finished lanes idle until the slowest request is done."""
        import jax.numpy as jnp
        max_new = max_new_tokens or self.cfg.max_new_tokens
        states = [self._prefill_one(p, seed + i)
                  for i, p in enumerate(prompts)]
        batched = self._stack_states(states)
        out_buf, n_out, rounds = self._get_vloop(int(max_new))(
            batched, self.params, self.draft, self.beam_head,
            jnp.asarray(eos_token_id, jnp.int32),
            jnp.asarray(max_new, jnp.int32))
        outs = []
        new_tokens = []
        for i, p in enumerate(prompts):
            out = list(np.asarray(p, np.int64))
            n = 0
            for t in np.asarray(out_buf[i])[:int(n_out[i])]:
                out.append(int(t))
                n += 1
                if int(t) == eos_token_id or n >= max_new:
                    break
            outs.append(out)
            new_tokens.append(n)
        total = sum(new_tokens)
        return outs, {"new_tokens": total, "rounds": int(np.max(rounds)),
                      "per_request": new_tokens}

    # ------------------------------------------------------------------
    def serve(self, prompts: Sequence, max_new_tokens=None,
              eos_token_id: int = 2, seed: int = 0):
        """Continuous batching: up to `batch_size` slots decode concurrently;
        a finished slot is refilled from the queue the same round. Returns
        outputs in the order of `prompts` plus utilization stats."""
        max_new = max_new_tokens or self.cfg.max_new_tokens
        b = self.batch_size
        queue = list(range(len(prompts)))
        outs: List[list] = [list(np.asarray(p, np.int64)) for p in prompts]
        new_tokens = [0] * len(prompts)
        finished = [False] * len(prompts)

        slot_req = [-1] * b          # which request occupies each slot
        states = []
        for s in range(b):
            if queue:
                r = queue.pop(0)
                slot_req[s] = r
                states.append(self._prefill_one(prompts[r], seed + r))
            else:
                states.append(self.init_state(seed + 1000 + s))
        batched = self._stack_states(states)

        rounds = 0
        busy_slot_rounds = 0
        while any(r >= 0 for r in slot_req):
            batched, res = self._vround(batched, self.params, self.draft,
                                        self.beam_head)
            rounds += 1
            n_acc = np.asarray(res.n_accepted)
            acc = np.asarray(res.accepted)
            for s in range(b):
                r = slot_req[s]
                if r < 0:
                    continue
                busy_slot_rounds += 1
                for t in acc[s][:n_acc[s]]:
                    outs[r].append(int(t))
                    new_tokens[r] += 1
                    if int(t) == eos_token_id or new_tokens[r] >= max_new:
                        finished[r] = True
                        break
                if finished[r]:
                    if queue:                      # refill the slot
                        nr = queue.pop(0)
                        slot_req[s] = nr
                        st = self._prefill_one(prompts[nr], seed + nr)
                        batched = self._write_slot(batched, st, s)
                    else:
                        slot_req[s] = -1
        total = sum(new_tokens)
        return outs, {"new_tokens": total, "rounds": rounds,
                      "per_request": new_tokens,
                      "slot_utilization": busy_slot_rounds
                      / max(rounds * b, 1)}
