"""Single-chip tree-speculative decoding engine.

Reference: `EaModel.eagenerate` (eagle/ea_model.py:190-297) — the
non-pipelined EAGLE loop the distributed schedules build on:
prefill -> [draft tree -> verify whole tree -> accept -> compact KV] -> ...

Everything per-round runs inside one jitted function with static shapes; the
python loop only checks the stop condition and collects the (tiny) accepted
token vector each round.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from flowspec_tpu.config import EngineConfig, ModelConfig, SamplingConfig, TreeConfig
from flowspec_tpu.draft.beam import topk_generate


from flowspec_tpu.draft.eagle import EagleParams, draft_context_forward
from flowspec_tpu.models.bias import prefill_bias, tree_bias
from flowspec_tpu.models.kv_cache import KVCache, init_kv_cache
from flowspec_tpu.models import model_forward
from flowspec_tpu.models.llama import (
    LlamaParams, embed_tokens, final_hidden, lm_head_logits,
)
from flowspec_tpu.tree.posterior import (
    evaluate_posterior_greedy, evaluate_posterior_stochastic,
)
from flowspec_tpu.tree.sampling import sample_token
from flowspec_tpu.tree.types import TokenTree, tree_attention_bias


def make_beam_head(params, draft, cfg: EngineConfig):
    """The lm_head copy the draft beam scores proposals with (see
    EngineConfig.beam_head_quant)."""
    from flowspec_tpu.ops.quant import Int8Tensor, NF4Tensor, quantize_int8
    mode = cfg.beam_head_quant
    if mode == "auto":
        mode = ("int8" if isinstance(draft.wq, (Int8Tensor, NF4Tensor))
                else "none")
    if mode == "int8":
        return quantize_int8(params.lm_head)
    assert mode == "none", mode
    return params.lm_head


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EngineState:
    base_cache: KVCache
    draft_cache: KVCache
    commit_len: jax.Array       # () int32 — committed tokens (== base KV len)
    root_token: jax.Array       # () int32 — current speculation root
    pending_tokens: jax.Array   # (CTX,) int32 — draft pairs not yet consumed
    pending_hidden: jax.Array   # (1, CTX, H)
    n_pending: jax.Array        # () int32
    root_hidden: jax.Array      # (H,) — draft output hidden for the root
                                #   pair, used when n_pending == 0 (the
                                #   prefill drain already consumed the pairs)
    key: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RoundResult:
    accepted: jax.Array     # (D_cap,) int32 — tokens committed this round, -1 pad
    n_accepted: jax.Array   # () int32  (== accept_len + 1, incl. old root)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ServeCtx:
    """Per-slot request context for token-level continuous batching: while
    prompt_pos < prompt_len the slot's round consumes the next chain of
    prompt tokens instead of verifying a drafted tree (the chain IS a
    degenerate tree — a root->leaf path — so the verify/commit machinery is
    shared; see _spec_round). Replaces the reference's batch-1-only serving
    (eagle/kv_cache.py:91) AND round-level refill, where a new request's
    synchronous prefill stalled every other slot for its full duration."""
    prompt_buf: jax.Array   # (P,) int32 — the slot's full prompt, 0-padded
    prompt_len: jax.Array   # () int32
    prompt_pos: jax.Array   # () int32 — tokens already chained into the KV
    active: jax.Array       # () bool — slot holds a live request


def negotiate_round_formats(cfg: EngineConfig):
    """AOT-negotiate XLA's preferred weight layouts for the decode round
    from SHAPE AVALS ONLY — call before building any weight buffer, then
    construct each leaf directly into its format (jit out_shardings=fmt, or
    device_put(host_tensor, fmt) at load) and pass the formats to
    SpecEngine(formats=...).

    Why: at 7B bf16 XLA wants the stacked wq/wk/wv stored transposed
    (major-to-minor (0, 2, 1)); fed default-layout weights it materializes
    ~3GB of transposed copies inside the decode program and OOMs the 16GB
    chip. Negotiating first means the transposed buffer is the ONLY copy
    that ever exists. Returns (p_fmt, d_fmt) Format pytrees."""
    import functools as ft
    from jax.experimental.layout import Format, Layout
    from flowspec_tpu.draft.eagle import init_eagle_params
    from flowspec_tpu.models.llama import init_llama_params

    mc, tc = cfg.model, cfg.tree
    tc = dataclasses.replace(
        tc, node_cap=min(tc.node_cap, tc.total_tokens + 1),
        leaf_cap=min(tc.leaf_cap, tc.total_tokens + 1),
        depth_cap=min(tc.depth_cap, tc.depth + 1))
    p_aval = jax.eval_shape(ft.partial(init_llama_params, cfg=mc),
                            jax.random.key(0))
    d_aval = jax.eval_shape(lambda k: init_eagle_params(k, mc),
                            jax.random.key(1))

    dt = jnp.dtype(mc.dtype)
    max_levels = tc.depth + tc.expand_depth

    def kv_aval(layers, rows):
        return KVCache(
            k=jax.ShapeDtypeStruct(
                (layers, 1, mc.num_key_value_heads, rows, mc.head_dim_), dt),
            v=jax.ShapeDtypeStruct(
                (layers, 1, mc.num_key_value_heads, rows, mc.head_dim_), dt),
            length=jax.ShapeDtypeStruct((), jnp.int32))

    s32 = jax.ShapeDtypeStruct((), jnp.int32)
    st_aval = EngineState(
        base_cache=kv_aval(mc.num_hidden_layers,
                           cfg.max_seq_len + tc.node_cap),
        draft_cache=kv_aval(1, cfg.max_seq_len + max_levels * tc.top_k),
        commit_len=s32, root_token=s32,
        pending_tokens=jax.ShapeDtypeStruct((tc.depth_cap + 1,), jnp.int32),
        pending_hidden=jax.ShapeDtypeStruct(
            (1, tc.depth_cap + 1, mc.hidden_size), dt),
        n_pending=s32,
        root_hidden=jax.ShapeDtypeStruct((mc.hidden_size,), dt),
        key=jax.eval_shape(jax.random.key, 0),
    )
    fn = ft.partial(_spec_round, cfg=mc, tree_cfg=tc, sampling=cfg.sampling)
    auto = (jax.tree_util.tree_map(lambda _: None, st_aval),
            jax.tree_util.tree_map(lambda _: Format(Layout.AUTO), p_aval),
            jax.tree_util.tree_map(lambda _: Format(Layout.AUTO), d_aval))
    compiled = jax.jit(fn, in_shardings=auto,
                       donate_argnums=(0,)).lower(
        st_aval, p_aval, d_aval).compile()
    _, p_fmt, d_fmt = compiled.input_formats[0]
    return p_fmt, d_fmt


class SpecEngine:
    """Owns params + jitted step functions for one (base, draft) model pair."""

    def __init__(self, params: LlamaParams, draft: EagleParams,
                 cfg: EngineConfig, formats=None, forward_fn=None):
        """`formats`, if given, is (p_fmt, d_fmt) — jax.experimental.layout
        Format pytrees matching (params, draft), normally obtained from
        `negotiate_round_formats`. The step functions are then compiled with
        their weight inputs PINNED to those layouts, so weights built
        directly into the negotiated formats (XLA wants the 7B bf16
        wq/wk/wv stacks stored transposed, major-to-minor (0, 2, 1)) flow
        through prefill and decode without the ~3GB of call-site transposed
        copies that OOMed the 16GB chip (ROADMAP r1 #2).

        `forward_fn` swaps the base-model forward (model_forward signature);
        used by TPEngine(galaxy=True) to route verify/prefill through the
        sequence-sharded ring-collective path (parallel/galaxy.py)."""
        self.params = params
        self.draft = draft
        from flowspec_tpu.draft.eagle import draft_view
        self.dcfg = draft_view(draft, cfg.model)
        tc = cfg.tree
        # The single-chip engine verifies freshly drafted trees only (it
        # never merges), and a fresh top-N beam tree always holds exactly
        # total_tokens+1 nodes, depth <= depth. The default static caps are
        # sized for the pipeline's merge headroom (node_cap 192), so without
        # clamping every verify forward would run node_cap padded rows —
        # 2.4x the real tree's matmul FLOPs at the default config. Clamp to
        # the fresh-tree envelope; PipelineEngine keeps the full caps.
        tc = dataclasses.replace(
            tc,
            node_cap=min(tc.node_cap, tc.total_tokens + 1),
            leaf_cap=min(tc.leaf_cap, tc.total_tokens + 1),
            depth_cap=min(tc.depth_cap, tc.depth + 1))
        cfg = dataclasses.replace(cfg, tree=tc)
        self.cfg = cfg
        self.beam_head = make_beam_head(params, draft, cfg)
        mc = cfg.model
        # Pending draft-pair buffers must hold a full prefill chunk: the last
        # prompt chunk's (next_token, hidden) pairs stay queued until the
        # first spec round drains them (and the sampled root is patched into
        # the final slot). Sizing them to depth_cap+1 alone silently dropped
        # pairs for prompts longer than depth_cap+1 (advisor finding r1-high).
        self.ctx_pad = max(tc.depth_cap + 1, cfg.prefill_chunk)
        max_levels = tc.depth + tc.expand_depth
        # KV buffers round up to 256 rows: the fused tree-attention kernel
        # streams the cache in 256/512-row blocks (ops/tree_attention.py) and
        # its gate requires s_max % 256 == 0; the tail rows are masked by the
        # bias either way, and the cost is <=255 extra rows per layer.
        self._max_levels = max_levels
        self.draft_kv_len, self.base_kv_len = self._kv_rows(cfg.max_seq_len)

        fwd = forward_fn if forward_fn is not None else model_forward

        # in_shardings pins weight-arg layouts when formats are supplied
        # (None = unconstrained). Positions follow each function's args.
        p_fmt, d_fmt = formats if formats is not None else (None, None)

        def _shard(*slots):
            """kwargs pinning 'p'/'d' arg slots to the supplied formats
            (None slots stay unconstrained); empty without formats."""
            if formats is None:
                return {}
            return {"in_shardings": tuple(
                {"p": p_fmt, "d": d_fmt, None: None}[s] for s in slots)}

        # donate_argnums=0: callers never reuse the pre-call state, and
        # donation lets XLA update the KV caches in place instead of
        # copying them every invocation
        self._prefill = jax.jit(functools.partial(_prefill_chunk, cfg=mc,
                                                  fwd=fwd),
                                donate_argnums=(0,),
                                **_shard(None, "p", "d", None, None, None))
        # Post-prefill drain + pending-buffer shrink: decode rounds queue at
        # most depth_cap+1 pairs, so carrying the prefill_chunk-sized (64)
        # buffers through every round makes the per-round drain forward ~8x
        # wider than needed (~2.6ms of the 28ms round at 7B int8). Drain the
        # final prompt chunk's pairs once here, stash the root's draft
        # hidden, and hand the decode loop depth_cap+1-row buffers.
        self._finish_prefill = jax.jit(functools.partial(
            _finish_prefill, cfg=mc, ctx_small=tc.depth_cap + 1,
            sampling=cfg.sampling),
            donate_argnums=(0,), **_shard(None, "d", None))
        self._round = jax.jit(functools.partial(
            _spec_round, cfg=mc, tree_cfg=tc, sampling=cfg.sampling,
            fwd=fwd, force_accept=cfg.force_accept),
            donate_argnums=(0,),
            **_shard(None, "p", "d", None))
        self._ar_step = jax.jit(functools.partial(
            _ar_step, cfg=mc, sampling=cfg.sampling, fwd=fwd),
            donate_argnums=(0,),
            **_shard(None, "p"))
        # the fused loops return only token buffers (state stays on device
        # inside the while carry), so input donation has nothing to alias.
        # max_out is static: one cached jit per token budget (in_shardings
        # forbids kwargs, so static_argnames can't be used here).
        self._spec_loops, self._ar_loops = {}, {}

        def _spec_loop(*args, max_out):
            if max_out not in self._spec_loops:
                self._spec_loops[max_out] = jax.jit(functools.partial(
                    _spec_decode_loop, cfg=mc, tree_cfg=tc,
                    sampling=cfg.sampling, max_out=max_out, fwd=fwd,
                    gate_lanes=False, force_accept=cfg.force_accept),
                    **_shard(None, "p", "d", None, None, None, None))
            return self._spec_loops[max_out](*args)

        def _ar_loop(*args, max_out):
            if max_out not in self._ar_loops:
                self._ar_loops[max_out] = jax.jit(functools.partial(
                    _ar_decode_loop, cfg=mc, sampling=cfg.sampling,
                    max_out=max_out, fwd=fwd), **_shard(None, "p", None))
            return self._ar_loops[max_out](*args)

        self._spec_loop = _spec_loop
        self._ar_loop = _ar_loop

    # ---- state setup -----------------------------------------------------
    def _kv_rows(self, max_seq: int):
        """(draft_rows, base_rows) KV allocation for a max_seq budget."""
        tc = self.cfg.tree
        rnd = lambda n: -(-n // 256) * 256
        return (rnd(max_seq + self._max_levels * tc.top_k),
                rnd(max_seq + tc.node_cap))

    def _plan_buckets(self, prompt_len: int, max_new: int):
        """Ascending max_seq bucket schedule for one request; [max_seq_len]
        when bucket growth is off. Buckets too small to fit the prompt plus
        one round are dropped, and the list is cut at the first bucket that
        covers the full request (later buckets can never engage)."""
        tc = self.cfg.tree
        full = self.cfg.max_seq_len
        if not self.cfg.kv_buckets:
            return [full]
        need = prompt_len + max_new + tc.depth_cap + 1
        out = []
        for s in sorted(set(self.cfg.kv_buckets) | {full}):
            if s > full:
                continue
            if s < prompt_len + tc.depth_cap + 1:
                continue
            out.append(s)
            if s >= need:
                break
        return out or [full]

    def init_state(self, seed: int = 0, max_seq: int = None) -> EngineState:
        mc = self.cfg.model
        dt = jnp.dtype(mc.dtype)
        draft_rows, base_rows = (
            self._kv_rows(max_seq) if max_seq is not None
            else (self.draft_kv_len, self.base_kv_len))
        return EngineState(
            base_cache=init_kv_cache(mc.num_hidden_layers, 1,
                                     mc.num_key_value_heads,
                                     base_rows, mc.head_dim_, dt),
            # draft KV geometry follows the draft's own (possibly thin)
            # head layout, not the base's
            draft_cache=init_kv_cache(1, 1, self.dcfg.num_key_value_heads,
                                      draft_rows, self.dcfg.head_dim_, dt),
            commit_len=jnp.zeros((), jnp.int32),
            root_token=jnp.zeros((), jnp.int32),
            pending_tokens=jnp.zeros((self.ctx_pad,), jnp.int32),
            pending_hidden=jnp.zeros(
                (1, self.ctx_pad, mc.hidden_size), dt),
            n_pending=jnp.zeros((), jnp.int32),
            root_hidden=jnp.zeros((mc.hidden_size,), dt),
            key=jax.random.key(seed),
        )

    # ---- prefill ---------------------------------------------------------
    def _prefill_chunks(self, state: EngineState, prompt):
        """The chunked-forward half of prefill: consume `prompt` through
        `_prefill_chunk` calls, leaving the LAST chunk's draft pairs queued
        (pending) with a placeholder in the final slot. `prefill` finishes
        by sampling the root and draining; the serve prefix template stops
        here so the per-request first-suffix-token can be patched into that
        slot instead (see BatchedSpecEngine._prefix_template)."""
        c = self.cfg.prefill_chunk
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        p = len(prompt)
        assert c <= self.ctx_pad, (c, self.ctx_pad)
        n_chunks = max(1, -(-p // c))
        padded = np.full((n_chunks * c,), 0, np.int32)
        padded[:p] = prompt
        # next-token stream for draft pairs; last pair needs the sampled root,
        # patched after the last chunk.
        nxt = np.roll(padded, -1)

        for i in range(n_chunks):
            n_valid = jnp.asarray(min(c, p - i * c), jnp.int32)
            state, last_logits = self._prefill(
                state, self.params, self.draft,
                jnp.asarray(padded[i * c:(i + 1) * c]),
                jnp.asarray(nxt[i * c:(i + 1) * c]),
                n_valid)
        return state, last_logits

    def prefill(self, state: EngineState, prompt: np.ndarray) -> EngineState:
        """Chunked prefill (ref pipeline_prefill, pipeline_utils.py:183-288).
        Chunks are padded to `prefill_chunk`; the draft context advances in
        lockstep with pairs (token_{i+1}, base_hidden_i)."""
        state, last_logits = self._prefill_chunks(state, prompt)
        # root sampling + pair patching + drain happen inside the single
        # jitted _finish_prefill call: each eager op here would cost one
        # ~70ms dispatch RTT through the tunneled backend.
        return self._finish_prefill(state, self.draft, last_logits)

    def _check_budget(self, prompt, max_new: int):
        """The KV allocation is max_seq_len + node_cap rows; tree chunks are
        written at [commit, commit + node_cap), so commit may never exceed
        max_seq_len — dynamic_update_slice would silently clamp the write
        start and overwrite the newest valid rows (advisor finding r1-low).
        commit can overshoot max_new by up to depth_cap in the final round."""
        tc = self.cfg.tree
        limit = self.cfg.max_seq_len
        need = len(np.asarray(prompt).reshape(-1)) + max_new + tc.depth_cap + 1
        if need > limit:
            raise ValueError(
                f"prompt+max_new+depth_cap = {need} exceeds max_seq_len "
                f"{limit}; raise EngineConfig.max_seq_len or shorten the "
                "request")

    # ---- decoding --------------------------------------------------------
    def generate(self, prompt, max_new_tokens: Optional[int] = None,
                 eos_token_id: int = 2, seed: int = 0,
                 return_state: bool = False):
        """Returns (tokens list incl prompt, stats dict[, final state])."""
        max_new = max_new_tokens or self.cfg.max_new_tokens
        self._check_budget(prompt, max_new)
        state = self.init_state(seed)
        state = self.prefill(state, prompt)
        out = list(np.asarray(prompt, np.int64))
        return self._decode_rounds(state, out, max_new, eos_token_id,
                                   return_state)

    def _decode_rounds(self, state, out, max_new, eos_token_id,
                       return_state):
        new_tokens = 0
        rounds = 0
        while new_tokens < max_new:
            state, res = self._round(state, self.params, self.draft,
                                     self.beam_head)
            rounds += 1
            acc = np.asarray(res.accepted)[:int(res.n_accepted)]
            stop = False
            for t in acc:
                out.append(int(t))
                new_tokens += 1
                if int(t) == eos_token_id or new_tokens >= max_new:
                    stop = True
                    break
            if stop:
                break
        stats = {"new_tokens": new_tokens, "rounds": rounds,
                 "accept_per_round": new_tokens / max(rounds, 1)}
        if return_state:
            return out, stats, state
        return out, stats

    def resume_and_generate(self, state, history, extra_prompt,
                            max_new_tokens: Optional[int] = None,
                            eos_token_id: int = 2,
                            return_state: bool = False):
        """Multi-turn continuation with KV reuse: append `extra_prompt`
        (the next user turn) to a finished generation and keep decoding,
        prefilling ONLY the new tokens. The reference re-prefills the whole
        conversation every turn (eval/run_pipe_eval.py rebuilds the full
        conv string and calls stage_generate on it); here turn N's prefill
        cost is O(new turn) instead of O(entire history).

        `history` must be exactly the token list returned by the previous
        generate/resume_and_generate call on this `state` (pass
        return_state=True there). The engine may have committed PAST the
        returned stream (a budget/eos stop can fall mid-round, and the
        next root token is always sampled ahead), so the state is rolled
        back to len(history)-1 committed tokens — committed KV row i holds
        token history[i] by construction (prefill and round commits append
        in stream order) — and the boundary token history[-1] is
        re-forwarded as the first token of the continuation chunk: its
        base KV row is recomputed identically, and its draft pair re-fuses
        with the continuation's first token (the old pair encoded the
        now-discarded overshoot token). The draft cache length likewise
        tracks commits 1:1, so it rolls back to the same watermark."""
        max_new = max_new_tokens or self.cfg.max_new_tokens
        history = list(np.asarray(history, np.int64).reshape(-1))
        extra = list(np.asarray(extra_prompt, np.int64).reshape(-1))
        keep = len(history) - 1
        assert keep >= 0 and extra, (len(history), len(extra))
        tc = self.cfg.tree
        limit = min(self.cfg.max_seq_len,
                    state.base_cache.max_len - tc.node_cap,
                    state.draft_cache.max_len
                    - self._max_levels * tc.top_k)
        need = len(history) + len(extra) + max_new + tc.depth_cap + 1
        if need > limit:
            raise ValueError(
                f"history+extra+max_new+depth_cap = {need} exceeds this "
                f"state's budget {limit}; raise EngineConfig.max_seq_len")

        # three DISTINCT buffers: prefill donates the state, and donation
        # rejects the same buffer appearing in multiple argument slots
        mk32 = lambda v: jnp.asarray(np.int32(v))
        h = state.pending_hidden.shape[-1]
        state = dataclasses.replace(
            state,
            base_cache=dataclasses.replace(state.base_cache,
                                           length=mk32(keep)),
            draft_cache=dataclasses.replace(state.draft_cache,
                                            length=mk32(keep)),
            commit_len=mk32(keep),
            n_pending=jnp.zeros((), jnp.int32),
            # decode states carry depth_cap+1-row pair buffers
            # (_finish_prefill shrinks them); prefill chunks queue up to
            # prefill_chunk pairs, so re-widen to ctx_pad — narrow buffers
            # would silently truncate the continuation's draft pairs
            pending_tokens=jnp.zeros((self.ctx_pad,), jnp.int32),
            pending_hidden=jnp.zeros((1, self.ctx_pad, h),
                                     state.pending_hidden.dtype),
        )
        state = self.prefill(state, [history[-1]] + [int(t) for t in extra])
        return self._decode_rounds(state, history + extra, max_new,
                                   eos_token_id, return_state)

    def generate_fused(self, prompt, max_new_tokens: Optional[int] = None,
                       eos_token_id: int = 2, seed: int = 0):
        """Like generate(), but the whole multi-round decode loop runs in ONE
        device program (lax.while_loop over rounds) — no host round-trips.
        This is the production path: per-round host dispatch costs one RPC
        to the accelerator, which dominates at small round times.

        With cfg.kv_buckets set, the decode runs as a chain of fused
        segments: the KV caches start in the smallest bucket that fits the
        prompt, and when commit_len approaches the bucket's budget the loop
        exits, the caches are zero-padded to the next bucket, and the next
        segment continues — early rounds never pay the full-allocation
        attention-read tax (see EngineConfig.kv_buckets)."""
        max_new = max_new_tokens or self.cfg.max_new_tokens
        self._check_budget(prompt, max_new)
        p_len = len(np.asarray(prompt).reshape(-1))
        buckets = self._plan_buckets(p_len, max_new)
        state = self.init_state(seed, max_seq=buckets[0])
        state = self.prefill(state, prompt)

        out = list(np.asarray(prompt, np.int64))
        new_tokens = 0
        rounds = 0
        for i, seq in enumerate(buckets):
            if i:
                state = _grow_kv(state, *self._kv_rows(seq))
            out_buf, n_out, seg_rounds, done, state = self._spec_loop(
                state, self.params, self.draft, self.beam_head,
                jnp.asarray(eos_token_id, jnp.int32),
                jnp.asarray(max_new - new_tokens, jnp.int32),
                jnp.asarray(seq, jnp.int32), max_out=int(max_new))
            rounds += int(seg_rounds)
            # trim past eos / budget like the reference's outer loop
            stop = False
            for t in np.asarray(out_buf)[:int(n_out)]:
                out.append(int(t))
                new_tokens += 1
                if int(t) == eos_token_id or new_tokens >= max_new:
                    stop = True
                    break
            if stop or bool(done) or new_tokens >= max_new:
                break
        return out, {"new_tokens": new_tokens, "rounds": rounds,
                     "accept_per_round": new_tokens / max(rounds, 1),
                     "kv_buckets_used": i + 1}

    def generate_ar_fused(self, prompt, max_new_tokens: Optional[int] = None,
                          eos_token_id: int = 2, seed: int = 0):
        max_new = max_new_tokens or self.cfg.max_new_tokens
        self._check_budget(prompt, max_new)
        state = self.init_state(seed)
        state = self.prefill(state, prompt)
        out_buf, n_out = self._ar_loop(
            state, self.params, jnp.asarray(eos_token_id, jnp.int32),
            max_out=int(max_new))
        out = list(np.asarray(prompt, np.int64)) + \
            [int(t) for t in np.asarray(out_buf)[:int(n_out)]]
        return out, {"new_tokens": int(n_out)}

    def generate_ar(self, prompt, max_new_tokens: Optional[int] = None,
                    eos_token_id: int = 2, seed: int = 0):
        """Plain autoregressive baseline (ref `ar` schedule,
        stage_ea_model.py:558-601)."""
        max_new = max_new_tokens or self.cfg.max_new_tokens
        self._check_budget(prompt, max_new)
        state = self.init_state(seed)
        state = self.prefill(state, prompt)
        out = list(np.asarray(prompt, np.int64))
        tok = state.root_token
        new_tokens = 0
        while new_tokens < max_new:
            out.append(int(tok))
            new_tokens += 1
            if int(tok) == eos_token_id:
                break
            state, tok = self._ar_step(state, self.params)
        return out, {"new_tokens": new_tokens}


# ---- jitted bodies -------------------------------------------------------

def _prefill_chunk(state: EngineState, params: LlamaParams,
                   draft: EagleParams, tokens, next_tokens, n_valid, *,
                   cfg: ModelConfig, fwd=model_forward):
    c = tokens.shape[0]
    start = state.commit_len
    s_max = state.base_cache.max_len
    hidden = embed_tokens(params, tokens[None])
    bias = prefill_bias(start, c, s_max)
    positions = start + jnp.arange(c, dtype=jnp.int32)
    out, cache = fwd(params, state.base_cache, hidden, positions,
                     bias, start, cfg)
    cache = cache.with_length(start + n_valid)
    normed = final_hidden(params, out, cfg)

    # consume the *previous* pending pairs, then queue this chunk's pairs
    dstate = _drain_pending(state, draft, cfg)
    last_logits = lm_head_logits(
        params, normed[0, jnp.clip(n_valid - 1, 0, c - 1)])
    new_state = dataclasses.replace(
        dstate,
        base_cache=cache,
        commit_len=start + n_valid,
        pending_tokens=_pad_to(next_tokens, state.pending_tokens.shape[0]),
        pending_hidden=_pad_rows(normed, state.pending_hidden.shape[1]),
        n_pending=n_valid,
    )
    return new_state, last_logits


def _finish_prefill(state: EngineState, draft: EagleParams, last_logits, *,
                    cfg: ModelConfig, ctx_small: int,
                    sampling: SamplingConfig):
    """Sample the first root token from `last_logits`, patch it into the
    final pending draft pair (which held a placeholder), drain the final
    prompt chunk's (token, hidden) pairs, and shrink the pending buffers to
    the decode-round envelope (depth_cap+1 rows; a round commits at most
    depth_cap tokens). The root's draft output hidden is stashed in
    `root_hidden` for the first round, whose drain then sees n_pending == 0."""
    key, sub = jax.random.split(state.key)
    root = sample_token(sub, last_logits, sampling, is_probs=False)
    pt = state.pending_tokens.at[state.n_pending - 1].set(root)
    state = dataclasses.replace(state, key=key, root_token=root,
                                pending_tokens=pt)
    out, dcache = draft_context_forward(
        draft, state.draft_cache, state.pending_tokens, state.pending_hidden,
        state.draft_cache.length, state.n_pending, cfg)
    rh = out[0, jnp.clip(state.n_pending - 1, 0, out.shape[1] - 1)]
    h = state.pending_hidden.shape[-1]
    return dataclasses.replace(
        state, draft_cache=dcache, root_hidden=rh,
        pending_tokens=jnp.zeros((ctx_small,), jnp.int32),
        pending_hidden=jnp.zeros((1, ctx_small, h),
                                 state.pending_hidden.dtype),
        n_pending=jnp.zeros((), jnp.int32))


def _drain_pending(state: EngineState, draft: EagleParams, cfg: ModelConfig):
    """Advance the draft context KV over the queued (token, hidden) pairs."""
    _, dcache = draft_context_forward(
        draft, state.draft_cache, state.pending_tokens, state.pending_hidden,
        state.draft_cache.length, state.n_pending, cfg)
    return dataclasses.replace(state, draft_cache=dcache)


def _pad_to(x, n):
    c = x.shape[0]
    if c == n:
        return x.astype(jnp.int32)
    if c > n:
        return x[:n].astype(jnp.int32)
    return jnp.concatenate([x, jnp.zeros((n - c,), x.dtype)]).astype(jnp.int32)


def _pad_rows(h, n):
    b, c, d = h.shape
    if c == n:
        return h
    if c > n:
        return h[:, :n]
    return jnp.concatenate([h, jnp.zeros((b, n - c, d), h.dtype)], axis=1)


def _chain_tree(serve: ServeCtx, tree_cfg: TreeConfig):
    """Next prompt chunk as a degenerate TokenTree: a root->leaf chain of
    up to depth_cap tokens (node i's parent is i-1, one retrieve row).
    Verifying it through the standard round machinery appends its KV,
    produces its hiddens for the draft context, and yields the last node's
    logits — i.e. exactly a prefill step, batched alongside decode lanes."""
    cl = tree_cfg.depth_cap
    n_cap, l_cap = tree_cfg.node_cap, tree_cfg.leaf_cap
    p_cap = serve.prompt_buf.shape[0]
    pos = serve.prompt_pos
    n_chain = jnp.clip(serve.prompt_len - pos, 1, cl)
    i_n = jnp.arange(n_cap, dtype=jnp.int32)
    toks = serve.prompt_buf[jnp.clip(pos + i_n, 0, p_cap - 1)]
    row0 = jnp.where(jnp.arange(tree_cfg.depth_cap) < n_chain,
                     jnp.arange(tree_cfg.depth_cap, dtype=jnp.int32), -1)
    retrieve = jnp.full((l_cap, tree_cfg.depth_cap), -1,
                        jnp.int32).at[0].set(row0)
    return TokenTree(
        tokens=jnp.where(i_n < n_chain, toks, -1),
        parents=jnp.where((i_n > 0) & (i_n < n_chain), i_n - 1, -1),
        depth=jnp.where(i_n < n_chain, i_n, 0),
        scores=jnp.zeros((n_cap,), jnp.float32),
        retrieve=retrieve,
        n_nodes=n_chain,
        n_leaves=jnp.ones((), jnp.int32)), n_chain


def _spec_round(state: EngineState, params: LlamaParams, draft: EagleParams,
                beam_head=None, serve: ServeCtx | None = None, *,
                cfg: ModelConfig, tree_cfg: TreeConfig,
                sampling: SamplingConfig, fwd=model_forward,
                force_accept: int = 0):
    """One draft->verify->accept round (ref eagle/ea_model.py:236-297).

    With `serve`, a slot whose prompt is not fully consumed runs the round
    over a prompt-chain tree instead (see _chain_tree) and emits no tokens;
    returns (state, result, serve') instead of (state, result)."""
    n_cap = tree_cfg.node_cap
    s_max = state.base_cache.max_len

    # 1. draft context + tree generation
    out, dcache = draft_context_forward(
        draft, state.draft_cache, state.pending_tokens, state.pending_hidden,
        state.draft_cache.length, state.n_pending, cfg)
    drained_rh = out[0, jnp.clip(state.n_pending - 1, 0, out.shape[1] - 1)]
    # n_pending == 0 only on the first round after prefill (the prefill
    # drain consumed the pairs and stashed the root's hidden)
    root_hidden = jnp.where(state.n_pending > 0, drained_rh,
                            state.root_hidden)
    head = params.lm_head if beam_head is None else beam_head
    tree, beam_state, dcache = topk_generate(
        draft, head, dcache, state.root_token, root_hidden,
        tree_cfg, cfg, force_deep_path=force_accept > 0)

    if serve is not None:
        chain, n_chain = _chain_tree(serve, tree_cfg)
        in_pref = serve.active & (serve.prompt_pos < serve.prompt_len)
        tree = jax.tree_util.tree_map(
            lambda c, t: jnp.where(
                jnp.reshape(in_pref, (1,) * c.ndim), c, t), chain, tree)

    # 2. verify the whole tree in one chunk of node_cap tokens
    commit = state.commit_len
    anc_bias = tree_attention_bias(tree.parents, tree_cfg.depth_cap,
                                   tree.valid())
    bias = tree_bias(anc_bias, commit, jnp.zeros((), jnp.int32), s_max)
    toks = jnp.where(tree.tokens >= 0, tree.tokens, 0)
    hidden = embed_tokens(params, toks[None])
    positions = commit + tree.depth
    b_out, bcache = fwd(params, state.base_cache, hidden, positions,
                        bias, commit, cfg)
    normed = final_hidden(params, b_out, cfg)          # (1, N, H)
    node_logits = lm_head_logits(params, normed[0])    # (N, V) f32

    # 3. accept
    key, k1, k2 = jax.random.split(state.key, 3)
    if sampling.is_greedy:
        res = evaluate_posterior_greedy(node_logits, tree)
    else:
        res = evaluate_posterior_stochastic(
            node_logits, tree, sampling, k1,
            # single-chip trees are always freshly drafted (never merged), so
            # a node has at most top_k distinct children; 2x is headroom
            max_trials=min(2 * tree_cfg.top_k, tree_cfg.leaf_cap))
    new_root = sample_token(k2, res.sample_p, sampling, is_probs=True)
    best_leaf, accept_len = res.best_leaf, res.accept_len

    if force_accept:
        # SYNTHETIC-ACCEPTANCE BENCH MODE (EngineConfig.force_accept): take
        # the deepest drafted path and accept min(force_accept, its length)
        # nodes, regardless of the real verdict. Every downstream stage
        # (commit, KV compaction, pair drain) does exactly the work a real
        # acceptance of that length would — tokens are garbage, timing is
        # representative. Measurement only.
        path_len = (tree.retrieve >= 0).sum(axis=1)            # (L,)
        path_len = jnp.where(tree.leaf_valid(), path_len, 0)
        best_leaf = jnp.argmax(path_len).astype(jnp.int32)
        accept_len = jnp.minimum(jnp.asarray(force_accept, jnp.int32),
                                 path_len[best_leaf] - 1)
        last = jnp.clip(tree.retrieve[best_leaf, accept_len], 0, n_cap - 1)
        new_root = sample_token(k2, jax.nn.softmax(
            node_logits[last].astype(jnp.float32)), sampling, is_probs=True)

    if serve is not None:
        # Prefill lanes: the whole chain is "accepted" by construction; the
        # next root is the next prompt token, or — once the prompt is
        # exhausted — a sample from the last chain node's logits (the same
        # sampling prefill() does after its final chunk).
        pos = serve.prompt_pos
        p_cap = serve.prompt_buf.shape[0]
        pref_done = pos + n_chain >= serve.prompt_len
        sampled = sample_token(k2, node_logits[jnp.clip(n_chain - 1, 0,
                                                        n_cap - 1)],
                               sampling, is_probs=False)
        next_prompt = serve.prompt_buf[jnp.clip(pos + n_chain, 0, p_cap - 1)]
        best_leaf = jnp.where(in_pref, 0, best_leaf)
        accept_len = jnp.where(in_pref, n_chain - 1, accept_len)
        new_root = jnp.where(in_pref,
                             jnp.where(pref_done, sampled, next_prompt),
                             new_root)

    # 4. commit: path nodes [root, a_1..a_k]
    d_cap = tree_cfg.depth_cap
    path = tree.retrieve[best_leaf]                    # (D,)
    n_acc = accept_len + 1
    d_idx = jnp.arange(d_cap, dtype=jnp.int32)
    path_valid = d_idx < n_acc
    safe_path = jnp.clip(path, 0, n_cap - 1)
    accepted_tokens = jnp.where(path_valid, tree.tokens[safe_path], -1)

    # 5. base KV compaction: keep accepted node rows right after commit_len
    src = jnp.where(path_valid, commit + safe_path, 0)
    bcache = bcache.compact(src, n_acc, commit)

    # 6. next round's draft pairs: (a_1..a_k, new_root) with hiddens of
    # (a_0..a_k)
    ctx = state.pending_tokens.shape[0]
    # pair d: (token a_{d+1}, hidden of a_d); the last pair carries new_root.
    shifted = jnp.roll(accepted_tokens, -1)
    pair_tok = jnp.where(d_idx + 1 < n_acc, shifted, 0)
    pair_tok = jnp.where(d_idx + 1 == n_acc, new_root, pair_tok)
    pair_hidden = normed[:, safe_path]                 # (1, D, H)
    pair_hidden = jnp.where(path_valid[None, :, None], pair_hidden, 0.0)

    new_state = EngineState(
        base_cache=bcache,
        draft_cache=dcache,
        commit_len=commit + n_acc,
        root_token=new_root,
        pending_tokens=_pad_to(pair_tok, ctx),
        pending_hidden=_pad_rows(pair_hidden, ctx),
        n_pending=n_acc,
        root_hidden=root_hidden,
        key=key,
    )
    if serve is None:
        return new_state, RoundResult(accepted=accepted_tokens,
                                      n_accepted=n_acc)
    # idle slots are no-ops; prefill lanes commit but emit nothing
    new_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(jnp.reshape(serve.active, (1,) * a.ndim),
                               a, b), new_state, state)
    serve2 = dataclasses.replace(
        serve, prompt_pos=serve.prompt_pos +
        jnp.where(in_pref, n_chain, 0))
    n_emit = jnp.where(serve.active & ~in_pref, n_acc, 0)
    return new_state, RoundResult(accepted=accepted_tokens,
                                  n_accepted=n_emit), serve2


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(0,))
def _grow_kv(state: EngineState, draft_rows: int,
             base_rows: int) -> EngineState:
    """Migrate a request's KV caches to a larger bucket by zero-padding the
    seq axis (axis -2 — works on single (L,B,H,S,D) and batch-stacked
    (B,L,1,H,S,D) states alike); lengths and all other state carry over
    unchanged. One liveness copy per migration — amortized over the whole
    next segment."""
    def pad(c: KVCache, rows: int) -> KVCache:
        p = rows - c.k.shape[-2]
        w = ((0, 0),) * (c.k.ndim - 2) + ((0, p), (0, 0))
        return KVCache(k=jnp.pad(c.k, w), v=jnp.pad(c.v, w),
                       length=c.length)
    return dataclasses.replace(
        state,
        base_cache=pad(state.base_cache, base_rows),
        draft_cache=pad(state.draft_cache, draft_rows))


def _spec_decode_loop(state: EngineState, params: LlamaParams,
                      draft: EagleParams, beam_head, eos_id, budget,
                      commit_cap, *, max_out: int, cfg: ModelConfig,
                      tree_cfg: TreeConfig, sampling: SamplingConfig,
                      fwd=model_forward, gate_lanes: bool = True,
                      force_accept: int = 0):
    """On-device multi-round loop: while tokens remain, run _spec_round and
    append its accepted tokens to a fixed buffer.

    `commit_cap` (dynamic) bounds commit_len so rounds only start while the
    KV allocation has node_cap headroom; callers with a single full-size
    allocation pass cfg.max_seq_len (then _check_budget guarantees it never
    binds), bucketed callers pass the current bucket's max_seq and grow the
    caches when the loop exits early (done=False, tokens left).

    `gate_lanes` (static) selects the vmap-safe body: under vmap the while
    runs until EVERY lane finishes, so finished lanes must select the old
    state back in. Single-lane callers pass False — the loop cond already
    guarantees `active` at body entry, and skipping the select lets XLA keep
    the KV-cache updates in place instead of holding old+new buffers live
    across a ~670MB-per-cache dynamic select every round (~2ms/round at 7B).

    Returns (out_buf, n_out, rounds, done, state) — state comes back so
    bucketed callers can migrate it and continue.
    """
    d_cap = tree_cfg.depth_cap
    buf_cap = max_out + d_cap + 1   # one round may overshoot by <= d_cap

    def cond(carry):
        st, out, n_out, done, rounds = carry
        return ~done & (n_out < budget) & (st.commit_len <= commit_cap)

    def body(carry):
        st, out, n_out, done, rounds = carry
        st2, res = _spec_round(st, params, draft, beam_head, cfg=cfg,
                               tree_cfg=tree_cfg, sampling=sampling, fwd=fwd,
                               force_accept=force_accept)
        # `active` gates all updates (vmap: finished lanes must be no-ops).
        active = (~done & (n_out < budget)
                  & (st.commit_len <= commit_cap)) if gate_lanes \
            else jnp.asarray(True)
        d_idx = jnp.arange(d_cap, dtype=jnp.int32)
        pv = active & (d_idx < res.n_accepted)
        wpos = jnp.where(pv, n_out + d_idx, buf_cap)
        out2 = out.at[wpos].set(jnp.where(pv, res.accepted, 0), mode="drop")
        n2 = n_out + jnp.where(active, res.n_accepted, 0)
        eos_hit = jnp.any(pv & (res.accepted == eos_id) & (eos_id >= 0))
        if gate_lanes:
            st3 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(active, a, b) if a.ndim == 0
                else jnp.where(
                    jnp.reshape(active, (1,) * a.ndim), a, b), st2, st)
        else:
            st3 = st2
        return st3, out2, n2, done | eos_hit, rounds + jnp.where(active, 1, 0)

    init = (state, jnp.zeros((buf_cap,), jnp.int32),
            jnp.zeros((), jnp.int32), jnp.asarray(False),
            jnp.zeros((), jnp.int32))
    st, out, n_out, done, rounds = jax.lax.while_loop(cond, body, init)
    return out, n_out, rounds, done, st


def _ar_decode_loop(state: EngineState, params: LlamaParams, eos_id, *,
                    max_out: int, cfg: ModelConfig,
                    sampling: SamplingConfig, fwd=model_forward):
    def cond(carry):
        _, _, n_out, done = carry
        return ~done & (n_out < max_out)

    def body(carry):
        st, out, n_out, done = carry
        tok = st.root_token
        out2 = out.at[n_out].set(tok)
        st2, nxt = _ar_step(st, params, cfg=cfg, sampling=sampling, fwd=fwd)
        return st2, out2, n_out + 1, done | ((tok == eos_id) & (eos_id >= 0))

    init = (state, jnp.zeros((max_out,), jnp.int32),
            jnp.zeros((), jnp.int32), jnp.asarray(False))
    _, out, n_out, _ = jax.lax.while_loop(cond, body, init)
    return out, n_out


def _ar_step(state: EngineState, params: LlamaParams, *, cfg: ModelConfig,
             sampling: SamplingConfig, fwd=model_forward):
    """Decode one token autoregressively (baseline)."""
    s_max = state.base_cache.max_len
    commit = state.commit_len
    hidden = embed_tokens(params, state.root_token[None][None])
    bias = prefill_bias(commit, 1, s_max)
    out, cache = fwd(params, state.base_cache, hidden,
                     commit[None], bias, commit, cfg)
    cache = cache.with_length(commit + 1)
    logits = lm_head_logits(params, final_hidden(params, out, cfg))[0, 0]
    key, sub = jax.random.split(state.key)
    tok = sample_token(sub, logits, sampling, is_probs=False)
    new_state = dataclasses.replace(state, base_cache=cache,
                                    commit_len=commit + 1, root_token=tok,
                                    key=key)
    return new_state, tok
