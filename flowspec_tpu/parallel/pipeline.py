"""SPMD pipelined tree-speculative decoding over a `stage` mesh axis.

Reference: the schedule methods of `StageEaModel`
(stage_ea_model.py:369-1791) and their comm layer (comm/comm_handler.py).
The reference runs 5 asymmetric processes — 1 draft rank + 4 verify ranks —
exchanging dynamically-shaped CPU tensors over gloo with broadcast control
messages. Here the whole round is ONE jitted SPMD program:

- base-model layers are stacked and sharded over the `stage` axis; each
  device's `lax.scan` covers its own layer block;
- activation chunks hop stages via `lax.ppermute`; the completed chunk
  reaches everyone via `all_gather` (100KB-class transfers on ICI);
- the draft model, lm_head, embeddings and all tree algebra are *replicated*:
  every device computes the verdict/pruning identically, which deletes the
  reference's entire broadcast control plane (comm_handler.py:211-234) and
  its async send/recv threads;
- dynamic chunk lengths become fixed-capacity buffers with validity counts;
  the `while True` turn loop is a `lax.while_loop`.

One deliberate improvement over the reference: verified node logits persist
in a replicated (node_cap, V) buffer that is remapped on every prune, so a
verdict can accept through *previously verified* surviving nodes. The
reference indexes only the just-completed chunk's logits
(stage_ea_model.py:1160-1178), which silently mis-indexes when the re-rooted
tree retains verified descendants; the buffer makes the verdict exact and
strictly deeper.

Schedules (ref stage_ea_model.py):
  naive      — stream all chunks, one verdict per round        (:704-780)
  pruned     — per-completion verdict + in-flight pruning      (:782-1056)
  continuous — pruned + per-turn tree expansion & merge        (:1058-1446)
  serial     — naive with one whole-tree chunk                 (:603-701)
  ar         — degenerate 1-node tree                          (:558-601)
  pipedec    — depth-synchronous one-level-per-turn growth     (:1448-1791)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flowspec_tpu.config import EngineConfig
from flowspec_tpu.parallel.mesh import put_global as _put_global
from flowspec_tpu.draft.beam import (
    BeamState, expand_tree, head_logits, topk_generate,
)
from flowspec_tpu.draft.eagle import (
    EagleParams, draft_context_forward, draft_view, eagle_layer, fuse,
    project_out,
)
from flowspec_tpu.tree.build import finalize_tree
from flowspec_tpu.models.bias import prefill_bias, tree_bias
from flowspec_tpu.models.kv_cache import KVCache, init_kv_cache
from flowspec_tpu.models import model_forward
from flowspec_tpu.models.llama import (
    LlamaParams, embed_tokens, final_hidden, lm_head_logits,
)
from flowspec_tpu.tree.partition import partition_lengths, rebucket_lengths
from flowspec_tpu.tree.posterior import (
    evaluate_posterior_greedy, evaluate_posterior_stochastic,
)
from flowspec_tpu.tree.prune import (
    compute_pruning_info, kv_keep_positions, prune_tree,
)
from flowspec_tpu.tree.merge import merge_trees
from flowspec_tpu.tree.sampling import sample_token
from flowspec_tpu.tree.types import TokenTree, ancestor_matrix, NEG_INF


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PipeState:
    """Cross-round state. `kv` is stage-sharded; everything else replicated."""
    kv: KVCache                # (L, B, H, S, D) sharded over stage on axis 0
    draft_cache: KVCache       # replicated
    commit_len: jax.Array
    root_token: jax.Array
    pend_tok: jax.Array        # (CTX,) draft pairs pending
    pend_hid: jax.Array        # (1, CTX, H)
    pend_n: jax.Array
    key: jax.Array


class Flight(NamedTuple):
    """A chunk in the pipeline: contiguous node ids [start, start+n)."""
    h: jax.Array       # (C, H)
    start: jax.Array   # () int32 — first node id
    n: jax.Array       # () int32


class RoundOut(NamedTuple):
    out_tokens: jax.Array   # (OUT_CAP,)
    n_out: jax.Array
    turns: jax.Array
    skips: jax.Array        # bubble turns (no chunk completed) — ref
                            # skip_count, stage_ea_model.py:454-455
    ne_fires: jax.Array     # none_expand expansions taken on bubble turns
    rounds: jax.Array       # speculative rounds executed (1 per
                            # _pipeline_round; accumulated by the fused
                            # loop) — the denominator of the reference's
                            # headline accept-length metric
                            # (eval/run_pipe_eval.py:348-349)


def _right_perm(p):
    return [(i, (i + 1) % p) for i in range(p)]


def _ppermute_flight(fl: Flight, p: int) -> Flight:
    perm = _right_perm(p)
    return Flight(h=jax.lax.ppermute(fl.h, "stage", perm),
                  start=jax.lax.ppermute(fl.start, "stage", perm),
                  n=jax.lax.ppermute(fl.n, "stage", perm))


def _last_stage_flight(fl: Flight, p: int) -> Flight:
    return Flight(h=jax.lax.all_gather(fl.h, "stage")[p - 1],
                  start=jax.lax.all_gather(fl.start, "stage")[p - 1],
                  n=jax.lax.all_gather(fl.n, "stage")[p - 1])


def _pad_layer_stack(params, split, per):
    """Re-stack the (L, ...) layer pytree onto p * per slots so stage s's
    contiguous slot block [s*per, (s+1)*per) holds its `split[s]` layers
    (global order preserved), with the remaining slots ALL-ZERO layers.

    A zero layer is an exact identity on the hidden stream: wo == 0 zeroes
    the attention branch and w_down == 0 zeroes the MLP branch, so both
    residual adds contribute nothing (models/llama.py:decoder_layer). Zeroed
    quantized containers dequantize to zero (q == 0, scale == 0). The padded
    slots still burn one layer-forward of FLOPs, but turn time is the max
    over stages, so under-filled stages pay nothing extra in wall clock.

    Ref: uneven splits 0+8+8+8+8 via tools/split_and_save_models.py:33-57.
    """
    offsets = np.concatenate([[0], np.cumsum(split)])
    idx = np.zeros(per * len(split), np.int32)
    active = np.zeros(per * len(split), bool)
    for s, n_s in enumerate(split):
        idx[s * per:s * per + n_s] = offsets[s] + np.arange(n_s)
        active[s * per:s * per + n_s] = True
    idx_j = jnp.asarray(idx)
    act_j = jnp.asarray(active)

    def pad(leaf):
        taken = jnp.take(leaf, idx_j, axis=0)
        mask = act_j.reshape((-1,) + (1,) * (taken.ndim - 1))
        return jnp.where(mask, taken, jnp.zeros_like(taken))

    lp = jax.tree.map(pad, params.layers)
    return dataclasses.replace(params, layers=lp)


class _Carry(NamedTuple):
    # replicated
    tree: TokenTree
    lens: jax.Array          # (S_CAP,) in-flight + queued chunk lengths
    n_chunks: jax.Array
    next_inject: jax.Array
    verified: jax.Array      # nodes [0, verified) have logits in vlogits
    commit: jax.Array
    key: jax.Array
    draft_cache: KVCache
    vhidden: jax.Array       # (N, H) post-norm hidden of verified nodes
    vlogits: jax.Array       # (N, V) float32
    dhidden: jax.Array       # (N, H) draft-layer output hidden per node (pipedec)
    dh_valid: jax.Array      # (N,) bool — dhidden[i] computed
    out_tokens: jax.Array    # (OUT,) committed this round
    n_out: jax.Array
    truncate: jax.Array      # bool
    sampled_root: jax.Array  # next round's root (valid when truncate)
    pend_tok: jax.Array
    pend_hid: jax.Array
    pend_n: jax.Array
    turn: jax.Array
    skips: jax.Array
    ne_fires: jax.Array
    alive: jax.Array
    # saved draft beam for no-completion expansion (ref none_expand,
    # stage_ea_model.py:1347-1382): refreshed by every re-draft, deepened by
    # expand_tree on bubble turns
    beam: BeamState
    beam_ok: jax.Array       # bool — beam matches the current tree root
    # per-stage local
    kv: KVCache
    kv_tree_len: jax.Array   # tree nodes this stage has written to its kv
    out: Flight              # my forward output (ppermuted next turn)


class PipelineEngine:
    """Multi-stage engine mirroring SpecEngine's API over a stage mesh."""

    def __init__(self, params: LlamaParams, draft: EagleParams,
                 cfg: EngineConfig, mesh: Mesh | None = None,
                 schedule: str = "continuous"):
        assert schedule in ("naive", "pruned", "continuous", "serial", "ar",
                            "pipedec")
        self.cfg = cfg
        self.schedule = schedule
        mc, tc = cfg.model, cfg.tree
        p_stages = cfg.topology.num_stages
        if mesh is None:
            from flowspec_tpu.parallel.mesh import stage_mesh
            mesh = stage_mesh(p_stages)
        self.mesh = mesh
        self.p = p_stages
        # Layer-to-stage assignment (ref splits 0+8+8+8+8 via
        # tools/split_and_save_models.py:33-57; config/run_config.py:120).
        # Uneven splits pad the stacked layer axis to p * max(split) with
        # all-zero layers: wo == 0 and w_down == 0 make both residual
        # branches exact zero-contributions, so a padded slot is an identity
        # layer — no gating in the scan body, no dynamic shapes.
        topo = cfg.topology
        if topo.layers_per_stage and topo.total_layers == mc.num_hidden_layers \
                and len(topo.layers_per_stage) == p_stages:
            split = tuple(topo.layers_per_stage)
        else:
            from flowspec_tpu.config import StageTopology
            split = StageTopology.even(mc.num_hidden_layers,
                                       p_stages).layers_per_stage
        self.layer_split = split
        per = max(split)
        self.n_slots = per * p_stages
        if self.n_slots != mc.num_hidden_layers:
            params = _pad_layer_stack(params, split, per)
        # Combined PP x TP over a (stage, tp) mesh (parallel/mesh.py:
        # stage_tp_mesh): the round stays MANUAL over `stage` (ppermute ring,
        # replicated control flow) while `tp` is left to GSPMD as an auto
        # axis — base-layer weights/KV carry megatron specs on tp and XLA
        # partitions the layer matmuls + inserts the psums within each
        # stage's TP group. The reference has no PP x TP composition at all
        # (SURVEY.md section 2.4).
        self.tp = int(mesh.shape["tp"]) if "tp" in mesh.axis_names else 1
        if self.tp > 1:
            assert mc.num_attention_heads % self.tp == 0
            assert mc.num_key_value_heads % self.tp == 0
            if mc.num_local_experts:
                # MoE: expert-parallel over tp (each TP rank holds E/tp
                # experts; the mixture einsums psum via GSPMD)
                assert mc.num_local_experts % self.tp == 0

        # static capacities
        if schedule == "serial":
            self.c_buf = tc.node_cap
        else:
            n0 = tc.total_tokens + 1
            if n0 // p_stages <= tc.chunk_len:
                mx = -(-n0 // p_stages)
            else:
                mx = max(tc.chunk_len, n0 - tc.chunk_len * p_stages)
            # appended chunks after a merge can reach the append cap (or the
            # whole expand when uncapped) — the flight buffer must hold them
            app_max = 0
            if schedule == "continuous":
                if tc.expand_chunk_len > 0:
                    app_max = tc.expand_chunk_len
                else:
                    app_max = max(tc.expand_tokens,
                                  tc.none_expand_tokens if tc.none_expand
                                  else 0)
            self.c_buf = max(mx, tc.chunk_len, app_max) + 1
        self.ctx = tc.depth_cap + 1
        self.out_cap = 4 * tc.node_cap
        self.max_turns = 64
        self.force_turn = self.max_turns - tc.chunk_cap - p_stages - 4
        self.max_levels = tc.depth + tc.expand_depth

        self.params = self._shard_params(params)
        self.draft = _put_global(draft, NamedSharding(mesh, P()))
        from flowspec_tpu.runtime.engine import make_beam_head
        self.beam_head = make_beam_head(self.params, self.draft, cfg)

        pspec, dspec, sspec = self._specs()
        fspec = Flight(h=P(), start=P(), n=P())
        bhspec = jax.tree_util.tree_map(lambda _: P(), self.beam_head)

        # Partial-manual shard_map for PP x TP: the round is MANUAL over
        # `stage` (specs below name only stage axes); `tp`, when present, is
        # an AUTO axis — GSPMD propagates the megatron weight shardings into
        # the layer matmuls and inserts the TP collectives.
        sm_kw = dict(mesh=mesh, check_vma=False)
        if self.tp > 1:
            sm_kw["axis_names"] = {"stage"}

        # fused whole-prefill programs, one per n_chunks value (the chunk
        # count is a static trip count; prompts of the same chunked length
        # share a program)
        self._prefill_jits = {}
        self._prefill_specs = (pspec, dspec, sspec)
        self._sm_kw = sm_kw

        round_kw = dict(mc=mc, tc=tc, sampling=cfg.sampling,
                        p=p_stages, c_buf=self.c_buf, out_cap=self.out_cap,
                        max_turns=self.max_turns, force_turn=self.force_turn,
                        schedule=schedule, max_levels=self.max_levels)
        self._round = jax.jit(jax.shard_map(
            functools.partial(_pipeline_round, **round_kw),
            in_specs=(pspec, dspec, sspec, P(), P(), bhspec),
            out_specs=(sspec, RoundOut(out_tokens=P(), n_out=P(), turns=P(),
                                       skips=P(), ne_fires=P(), rounds=P())),
            **sm_kw), donate_argnums=(2,))
        self._decode_loop = jax.jit(jax.shard_map(
            functools.partial(_pipeline_decode_loop, **round_kw),
            in_specs=(pspec, dspec, sspec, P(), P(), bhspec),
            out_specs=(sspec, RoundOut(out_tokens=P(), n_out=P(), turns=P(),
                                       skips=P(), ne_fires=P(), rounds=P())),
            **sm_kw), donate_argnums=(2,))

    # ------------------------------------------------------------------
    _TP_COL = ("wq", "wk", "wv", "w_gate", "w_up")      # shard Out
    _TP_ROW = ("wo", "w_down")                          # shard In
    _TP_VEC = ("bq", "bk", "bv")                        # (L, Out)

    def _tp_put(self, name, w):
        """Megatron spec on top of the leading stage axis (parallel/tp.py
        uses the same layout without the layer axis). Quantized containers:
        int8 scale follows Out; nf4/int4 scale blocks follow In."""
        from flowspec_tpu.ops.quant import Int4Tensor, Int8Tensor, NF4Tensor
        m = self.mesh
        put = lambda x, spec: _put_global(x, NamedSharding(m, spec))
        if (name in self._TP_COL or name in self._TP_ROW) and \
                not isinstance(w, (Int8Tensor, NF4Tensor, Int4Tensor)) \
                and w.ndim == 4:
            # Mixtral stacked experts (L, E, In, Out): expert parallelism
            return put(w, P("stage", "tp", None, None))
        if name in self._TP_COL:
            if isinstance(w, Int8Tensor):
                return Int8Tensor(q=put(w.q, P("stage", None, "tp")),
                                  scale=put(w.scale, P("stage", "tp")))
            if isinstance(w, (NF4Tensor, Int4Tensor)):
                return type(w)(q=put(w.q, P("stage", None, "tp")),
                               scale=put(w.scale, P("stage", None, "tp")))
            return put(w, P("stage", None, "tp"))
        if name in self._TP_ROW:
            if isinstance(w, Int8Tensor):
                return Int8Tensor(q=put(w.q, P("stage", "tp", None)),
                                  scale=put(w.scale, P("stage")))
            if isinstance(w, (NF4Tensor, Int4Tensor)):
                return type(w)(q=put(w.q, P("stage", "tp", None)),
                               scale=put(w.scale, P("stage", "tp", None)))
            return put(w, P("stage", "tp", None))
        if name in self._TP_VEC:
            return put(w, P("stage", "tp"))
        return put(w, P("stage"))

    def _shard_params(self, params):
        """Stage-shard the stacked layer axis; replicate the rest. Works for
        any model family whose params expose (embed, layers, final_norm,
        lm_head) with a leading layer axis on every `layers` leaf (llama,
        qwen2, mixtral — incl. quantized containers). With a (stage, tp)
        mesh the llama-family layer weights additionally carry megatron tp
        shardings (GSPMD partitions the matmuls within each stage)."""
        m = self.mesh
        lp = params.layers
        if self.tp > 1:
            lp = dataclasses.replace(lp, **{
                f.name: self._tp_put(f.name, getattr(lp, f.name))
                for f in dataclasses.fields(lp)})
        else:
            lp = dataclasses.replace(lp, **{
                f.name: _put_global(getattr(lp, f.name),
                                    NamedSharding(m, P("stage")))
                for f in dataclasses.fields(lp)})
        rep = lambda x: _put_global(x, NamedSharding(m, P()))
        return dataclasses.replace(params, layers=lp,
                                   embed=rep(params.embed),
                                   final_norm=rep(params.final_norm),
                                   lm_head=rep(params.lm_head))

    def _specs(self):
        layer_cls = type(self.params.layers)
        lspec = layer_cls(**{
            f.name: P("stage") for f in dataclasses.fields(layer_cls)})
        pspec = type(self.params)(embed=P(), layers=lspec, final_norm=P(),
                                  lm_head=P())
        dspec = EagleParams(**{
            f.name: P() for f in dataclasses.fields(EagleParams)})
        sspec = PipeState(
            kv=KVCache(k=P("stage"), v=P("stage"), length=P()),
            draft_cache=KVCache(k=P(), v=P(), length=P()),
            commit_len=P(), root_token=P(), pend_tok=P(), pend_hid=P(),
            pend_n=P(), key=P())
        return pspec, dspec, sspec

    # ------------------------------------------------------------------
    def init_state(self, seed: int = 0) -> PipeState:
        mc, tc = self.cfg.model, self.cfg.tree
        dt = jnp.dtype(mc.dtype)
        mesh = self.mesh
        # Margin beyond max_seq: the tree region + the compaction window
        # (dynamic_update_slice clamps starts, so writes must always fit).
        kv_len = self.cfg.max_seq_len + 2 * tc.node_cap + tc.depth_cap
        kv = init_kv_cache(self.n_slots, 1, mc.num_key_value_heads,
                           kv_len, mc.head_dim_, dt)
        kv_spec = (P("stage", None, "tp") if self.tp > 1 else P("stage"))
        kv = KVCache(
            k=_put_global(kv.k, NamedSharding(mesh, kv_spec)),
            v=_put_global(kv.v, NamedSharding(mesh, kv_spec)),
            length=_put_global(kv.length, NamedSharding(mesh, P())))
        draft_margin = max(self.max_levels * tc.top_k,
                           2 * tc.node_cap + tc.depth_cap + self.ctx)
        from flowspec_tpu.draft.eagle import draft_view
        dcfg = draft_view(self.draft, mc)
        dc = init_kv_cache(1, 1, dcfg.num_key_value_heads,
                           self.cfg.max_seq_len + draft_margin,
                           dcfg.head_dim_, dt)
        rep = lambda x: _put_global(x, NamedSharding(mesh, P()))
        return PipeState(
            kv=kv,
            draft_cache=KVCache(k=rep(dc.k), v=rep(dc.v),
                                length=rep(dc.length)),
            commit_len=rep(jnp.zeros((), jnp.int32)),
            root_token=rep(jnp.zeros((), jnp.int32)),
            pend_tok=rep(jnp.zeros((self.ctx,), jnp.int32)),
            pend_hid=rep(jnp.zeros((1, self.ctx, mc.hidden_size), dt)),
            pend_n=rep(jnp.zeros((), jnp.int32)),
            key=rep(jax.random.key(seed)),
        )

    # ------------------------------------------------------------------
    def _get_prefill(self, n_chunks: int):
        if n_chunks not in self._prefill_jits:
            pspec, dspec, sspec = self._prefill_specs
            self._prefill_jits[n_chunks] = jax.jit(jax.shard_map(
                functools.partial(_prefill_all, mc=self.cfg.model,
                                  p=self.p, pc=self.cfg.prefill_chunk,
                                  n_chunks=n_chunks,
                                  sampling=self.cfg.sampling),
                in_specs=(pspec, dspec, sspec, P(), P(), P()),
                out_specs=sspec, **self._sm_kw), donate_argnums=(2,))
        return self._prefill_jits[n_chunks]

    def prefill(self, state: PipeState, prompt, start: int = 0) -> PipeState:
        """Pipelined chunked prefill (ref pipeline_prefill,
        pipeline_utils.py:183-288), then the draft context catches up over
        the collected (next_token, hidden) pairs — the WHOLE thing one
        fused device program with ZERO host fetches. The r4 host loop paid
        2 tunnel RTTs (np.asarray(comp_h) + int(comp_n)) per turn ≈ 45
        avoidable RTTs (~3s) on a 2560-token prompt (VERDICT r4 weak #3).
        `start` > 0 appends the prompt at an existing committed position
        (multi-turn resume): the caller must have rolled the KV/draft
        lengths back to `start`."""
        pc = self.cfg.prefill_chunk
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        n = len(prompt)
        n_chunks = max(1, -(-n // pc))
        padded = np.zeros((n_chunks * pc,), np.int32)
        padded[:n] = prompt
        return self._get_prefill(n_chunks)(
            self.params, self.draft, state, jnp.asarray(padded),
            jnp.asarray(n, jnp.int32), jnp.asarray(start, jnp.int32))

    # ------------------------------------------------------------------
    def generate_fused(self, prompt, max_new_tokens=None, eos_token_id=2,
                       seed: int = 0, return_state: bool = False):
        """Whole multi-round decode in ONE device program (no host
        round-trips between rounds) — the multi-chip production path."""
        max_new = max_new_tokens or self.cfg.max_new_tokens
        assert max_new <= self.out_cap, (max_new, self.out_cap)
        state = self.init_state(seed)
        state = self.prefill(state, prompt)
        state, res = self._decode_loop(
            self.params, self.draft, state,
            jnp.asarray(eos_token_id, jnp.int32),
            jnp.asarray(max_new, jnp.int32), self.beam_head)
        out = list(np.asarray(prompt, np.int64))
        new_tokens = 0
        for t in np.asarray(res.out_tokens)[:int(res.n_out)]:
            out.append(int(t))
            new_tokens += 1
            if int(t) == eos_token_id or new_tokens >= max_new:
                break
        rounds = int(res.rounds)
        stats = {"new_tokens": new_tokens, "turns": int(res.turns),
                 "rounds": rounds, "skips": int(res.skips),
                 "ne_fires": int(res.ne_fires),
                 "accept_per_round": new_tokens / max(rounds, 1)}
        if return_state:
            return out, stats, state
        return out, stats

    def generate(self, prompt, max_new_tokens=None, eos_token_id=2,
                 seed: int = 0, return_state: bool = False):
        max_new = max_new_tokens or self.cfg.max_new_tokens
        state = self.init_state(seed)
        state = self.prefill(state, prompt)
        out = list(np.asarray(prompt, np.int64))
        return self._decode_host(state, out, max_new, eos_token_id,
                                 return_state)

    def _decode_host(self, state, out, max_new, eos_token_id,
                     return_state: bool = False):
        new_tokens = 0
        rounds = 0
        turns_total = 0
        skips_total = 0
        ne_total = 0
        while new_tokens < max_new:
            state, res = self._round(
                self.params, self.draft, state,
                jnp.asarray(eos_token_id, jnp.int32),
                jnp.asarray(max_new - new_tokens, jnp.int32),
                self.beam_head)
            rounds += 1
            turns_total += int(res.turns)
            skips_total += int(res.skips)
            ne_total += int(res.ne_fires)
            acc = np.asarray(res.out_tokens)[:int(res.n_out)]
            stop = False
            for t in acc:
                out.append(int(t))
                new_tokens += 1
                if int(t) == eos_token_id or new_tokens >= max_new:
                    stop = True
                    break
            if stop or int(res.n_out) == 0:
                break
        stats = {"new_tokens": new_tokens, "rounds": rounds,
                 "turns": turns_total, "skips": skips_total,
                 "ne_fires": ne_total,
                 "accept_per_round": new_tokens / max(rounds, 1)}
        if return_state:
            return out, stats, state
        return out, stats

    def resume_and_generate(self, state: PipeState, history, extra_prompt,
                            max_new_tokens=None, eos_token_id: int = 2,
                            return_state: bool = False):
        """Multi-turn continuation with KV reuse on the PIPELINE engine:
        append `extra_prompt` (the next user turn) to a finished generation
        and keep decoding, prefilling ONLY the new tokens through the ring.
        Same contract and rollback rule as SpecEngine.resume_and_generate
        (runtime/engine.py): `history` is the exact token stream the
        previous generate/resume call on this `state` returned; the state
        rolls back to len(history)-1 commits (the engine may have committed
        past the stream — budget stops fall mid-round and the next root is
        sampled ahead) and the boundary token history[-1] re-forwards as
        the first token of the continuation chunk. The reference instead
        re-prefills the whole conversation every turn
        (eval/run_pipe_eval.py:200-320)."""
        max_new = max_new_tokens or self.cfg.max_new_tokens
        history = list(np.asarray(history, np.int64).reshape(-1))
        extra = list(np.asarray(extra_prompt, np.int64).reshape(-1))
        keep = len(history) - 1
        assert keep >= 0 and extra, (len(history), len(extra))
        tc = self.cfg.tree
        need = len(history) + len(extra) + max_new + tc.depth_cap + 1
        if need > self.cfg.max_seq_len:
            raise ValueError(
                f"history+extra+max_new+depth_cap = {need} exceeds "
                f"max_seq_len {self.cfg.max_seq_len}")
        mk32 = lambda v: jnp.asarray(np.int32(v))
        state = dataclasses.replace(
            state,
            kv=dataclasses.replace(state.kv, length=mk32(keep)),
            draft_cache=dataclasses.replace(state.draft_cache,
                                            length=mk32(keep)),
            commit_len=mk32(keep),
            pend_tok=jnp.zeros_like(state.pend_tok),
            pend_hid=jnp.zeros_like(state.pend_hid),
            pend_n=jnp.zeros((), jnp.int32))
        state = self.prefill(state, [history[-1]] + [int(t) for t in extra],
                             start=keep)
        return self._decode_host(state, history + extra, max_new,
                                 eos_token_id, return_state)


# ======================================================================
# shard_map bodies
# ======================================================================

def _prefill_turn(params, state: PipeState, out: Flight, chunk_tok, n_valid,
                  chunk_start, *, mc, p, pc):
    """One lockstep prefill turn: ring-hop, stage-0 injects a fresh prompt
    chunk, everyone forwards its chunk through its layer shard."""
    idx = jax.lax.axis_index("stage")
    s_max = state.kv.max_len

    inc = _ppermute_flight(out, p)
    comp = _last_stage_flight(out, p)
    comp_normed = final_hidden(params, comp.h[None], mc)[0]

    my = Flight(
        h=jnp.where(idx == 0, embed_tokens(params, chunk_tok[None])[0], inc.h),
        start=jnp.where(idx == 0, chunk_start, inc.start),
        n=jnp.where(idx == 0, n_valid, inc.n))

    def fwd(kv):
        bias = prefill_bias(my.start, pc, s_max)
        positions = my.start + jnp.arange(pc, dtype=jnp.int32)
        h, kv2 = model_forward(params, kv, my.h[None], positions, bias,
                               my.start, mc)
        return h[0].astype(my.h.dtype), kv2

    h_out, kv = jax.lax.cond(my.n > 0, fwd,
                             lambda kv: (jnp.zeros_like(my.h), kv), state.kv)
    kv = kv.with_length(jnp.maximum(kv.length, my.start + my.n))
    new_state = dataclasses.replace(state, kv=kv)
    return new_state, Flight(h=h_out, start=my.start, n=my.n), \
        comp_normed, comp.n, comp.start


def _prefill_all(params, draft, state: PipeState, padded_tok, n, start, *,
                 mc, p, pc, n_chunks, sampling):
    """The whole chunked pipelined prefill as one program: scan the
    injection ring over (n_chunks + p) turns accumulating completed-chunk
    normed hiddens into a device buffer, sample the root token, then scan
    the draft-context drain over the (token_{i+1}, hidden_i) pairs. No
    intermediate crosses the host boundary (cf. ref pipeline_prefill,
    pipeline_utils.py:183-288, which is host-driven per chunk)."""
    dt = jnp.dtype(mc.dtype)
    h_dim = mc.hidden_size
    tok_chunks = jnp.concatenate(
        [padded_tok.reshape(n_chunks, pc),
         jnp.zeros((p, pc), jnp.int32)], axis=0)

    out0 = Flight(h=jnp.zeros((pc, h_dim), dt),
                  start=jnp.zeros((), jnp.int32),
                  n=jnp.zeros((), jnp.int32))
    buf0 = jnp.zeros((n_chunks * pc, h_dim), dt)

    def turn(carry, xs):
        st, out, buf = carry
        t, ct = xs
        nv = jnp.where(t < n_chunks, jnp.clip(n - t * pc, 0, pc),
                       0).astype(jnp.int32)
        cs = (start + t * pc).astype(jnp.int32)
        st, out, comp_h, comp_n, comp_start = _prefill_turn(
            params, st, out, ct, nv, cs, mc=mc, p=p, pc=pc)
        # completed chunks arrive in order at pc-aligned offsets; the
        # final (partial) chunk's padding rows land in the buffer's pad
        # region and are never read
        off = jnp.clip(comp_start - start, 0, None)
        buf = jnp.where(comp_n > 0,
                        jax.lax.dynamic_update_slice(buf, comp_h, (off, 0)),
                        buf)
        return (st, out, buf), None

    (state, _, buf), _ = jax.lax.scan(
        turn, (state, out0, buf0),
        (jnp.arange(n_chunks + p, dtype=jnp.int32), tok_chunks))

    h_last = buf[jnp.clip(n - 1, 0, n_chunks * pc - 1)]
    key, sub = jax.random.split(state.key)
    root = sample_token(sub, lm_head_logits(params, h_last), sampling,
                        is_probs=False)

    # draft context pairs (prompt[i+1], h_i), i < n-1; the root pair
    # (root, h_last) stays pending for round 1
    pair_chunks = jnp.concatenate(
        [padded_tok[1:], jnp.zeros((1,), jnp.int32)]).reshape(n_chunks, pc)
    hid_chunks = buf.reshape(n_chunks, pc, h_dim)

    def drain(dc, c):
        nv = jnp.clip(n - 1 - c * pc, 0, pc)
        _, dc2 = draft_context_forward(draft, dc, pair_chunks[c],
                                       hid_chunks[c][None], dc.length, nv,
                                       mc)
        return dc2, None

    dcache, _ = jax.lax.scan(drain, state.draft_cache,
                             jnp.arange(n_chunks, dtype=jnp.int32))

    ctx = state.pend_tok.shape[0]
    return dataclasses.replace(
        state, draft_cache=dcache, key=key, root_token=root,
        commit_len=(start + n).astype(jnp.int32),
        pend_tok=jnp.zeros((ctx,), jnp.int32).at[0].set(root),
        pend_hid=jnp.zeros_like(state.pend_hid).at[0, 0].set(h_last),
        pend_n=jnp.ones((), jnp.int32))


def _queue_appended(lens, n_chunks, n_app, cap: int, s_cap: int):
    """Queue `n_app` appended nodes as pipeline chunks. With cap <= 0 (the
    reference's expand_subseq_token = -1 default) they form one chunk;
    otherwise they split into ceil(n_app / cap) entries of <= cap nodes each
    (ref stage_ea_model.py:1380-1385 caps the sent chunk and carries the
    remainder as waiting draft — here the remainder entries queue directly
    and stage 0 injects them one per turn). Returns (lens', n_chunks', ok):
    ok=False (queue would overflow, or nothing to append) leaves the queue
    untouched — the caller must then also skip the merge."""
    q = jnp.arange(lens.shape[0], dtype=jnp.int32)
    k = q - n_chunks
    if cap > 0:
        n_new = -(-n_app // cap)
        entry = jnp.clip(n_app - k * cap, 0, cap)
    else:
        n_new = jnp.where(n_app > 0, 1, 0).astype(jnp.int32)
        entry = jnp.where(k == 0, n_app, 0)
    ok = (n_app > 0) & (n_chunks + n_new <= s_cap)
    lens2 = jnp.where(ok & (k >= 0) & (k < n_new), entry, lens)
    nch2 = jnp.where(ok, n_chunks + n_new, n_chunks)
    return lens2, nch2, ok


def _forward_chunk(params, kv, tree: TokenTree, fl: Flight, commit, c_buf,
                   mc):
    """Run my layer shard over an in-flight chunk (contiguous node ids)."""
    s_max = kv.max_len
    n_cap = tree.node_cap
    ids = fl.start + jnp.arange(c_buf, dtype=jnp.int32)
    safe = jnp.clip(ids, 0, n_cap - 1)
    anc = ancestor_matrix(tree.parents, tree.depth_cap, tree.valid())
    rows = anc[safe]                                        # (C, N)
    rows = rows & (jnp.arange(c_buf)[:, None] < fl.n)
    row_bias = jnp.where(rows, 0.0, NEG_INF).astype(jnp.float32)
    bias = tree_bias(row_bias, commit, jnp.zeros((), jnp.int32), s_max)
    positions = commit + tree.depth[safe]
    h, kv2 = model_forward(params, kv, fl.h[None], positions, bias,
                           commit + fl.start, mc)
    return h[0].astype(fl.h.dtype), kv2


def _pipeline_round(params, draft, state: PipeState, eos_id, budget,
                    beam_head=None, *,
                    mc, tc, sampling, p, c_buf, out_cap, max_turns,
                    force_turn, schedule, max_levels):
    """One speculation round: draft a tree, stream/verify/prune/expand until
    truncate, return committed tokens + next-round state."""
    n_cap, d_cap = tc.node_cap, tc.depth_cap
    s_cap = tc.chunk_cap
    vocab = params.embed.shape[0]
    h_dim = params.embed.shape[1]
    dt = state.pend_hid.dtype
    ctx = state.pend_tok.shape[0]
    do_inflight_verdict = schedule in ("pruned", "continuous", "pipedec")
    do_expand = schedule == "continuous"
    pipedec = schedule == "pipedec"
    bhead = params.lm_head if beam_head is None else beam_head

    # ---- 1. draft the initial tree (replicated) ----
    d_out, dcache = draft_context_forward(
        draft, state.draft_cache, state.pend_tok, state.pend_hid,
        state.draft_cache.length, state.pend_n, mc)
    root_hidden = d_out[0, jnp.clip(state.pend_n - 1, 0, ctx - 1)]
    if pipedec:
        # depth-synchronous growth: start with a single level (ref
        # draft_init_pipedec, stage_ea_model.py:254-366 grows one level per
        # turn; here the expansion block adds levels in-loop)
        tree, beam0, dcache = topk_generate(
            draft, bhead, dcache, state.root_token, root_hidden,
            tc, mc, num_select=tc.top_k, depth=0, max_levels=max_levels)
    else:
        tree, beam0, dcache = topk_generate(
            draft, bhead, dcache, state.root_token, root_hidden,
            tc, mc, num_select=0 if schedule == "ar" else None,
            max_levels=max_levels)

    if schedule == "serial":
        lens = jnp.zeros((s_cap,), jnp.int32).at[0].set(tree.n_nodes)
        n_chunks = jnp.asarray(1, jnp.int32)
    else:
        lens, n_chunks = partition_lengths(tree.n_nodes, p, tc.chunk_len,
                                           s_cap)

    empty_flight = Flight(h=jnp.zeros((c_buf, h_dim), dt),
                          start=jnp.zeros((), jnp.int32),
                          n=jnp.zeros((), jnp.int32))

    carry = _Carry(
        tree=tree, lens=lens, n_chunks=n_chunks,
        next_inject=jnp.zeros((), jnp.int32),
        verified=jnp.zeros((), jnp.int32),
        commit=state.commit_len, key=state.key, draft_cache=dcache,
        vhidden=jnp.zeros((n_cap, h_dim), dt),
        vlogits=jnp.zeros((n_cap, vocab), jnp.float32),
        dhidden=jnp.zeros((n_cap, h_dim), dt).at[0].set(
            root_hidden.astype(dt)),
        dh_valid=jnp.zeros((n_cap,), jnp.bool_).at[0].set(True),
        out_tokens=jnp.zeros((out_cap,), jnp.int32),
        n_out=jnp.zeros((), jnp.int32),
        truncate=jnp.asarray(False),
        sampled_root=jnp.zeros((), jnp.int32),
        pend_tok=jnp.zeros((ctx,), jnp.int32),
        pend_hid=jnp.zeros((1, ctx, h_dim), dt),
        pend_n=jnp.zeros((), jnp.int32),
        turn=jnp.zeros((), jnp.int32),
        skips=jnp.zeros((), jnp.int32),
        ne_fires=jnp.zeros((), jnp.int32),
        alive=jnp.asarray(True),
        beam=beam0,
        beam_ok=jnp.asarray(do_expand and tc.none_expand),
        kv=state.kv, kv_tree_len=jnp.zeros((), jnp.int32),
        out=empty_flight)

    def cond(c: _Carry):
        return c.alive & (c.turn < max_turns)

    def body(c: _Carry) -> _Carry:
        idx = jax.lax.axis_index("stage")
        inc = _ppermute_flight(c.out, p)
        comp = _last_stage_flight(c.out, p)

        # ---- collect the completed chunk into the verified buffers ----
        comp_normed = final_hidden(params, comp.h[None], mc)[0]  # (C, H)
        comp_logits = lm_head_logits(params, comp_normed)        # (C, V) f32
        rows = comp.start + jnp.arange(c_buf, dtype=jnp.int32)
        rows_ok = jnp.arange(c_buf) < comp.n
        wrows = jnp.where(rows_ok, rows, n_cap)    # OOB writes dropped
        vhidden = c.vhidden.at[wrows].set(
            comp_normed.astype(dt), mode="drop")
        vlogits = c.vlogits.at[wrows].set(comp_logits, mode="drop")
        verified = c.verified + comp.n
        # Retire the completed chunk from the queue, together with any
        # leading zero-length chunks (fully-pruned or degenerate chunks
        # travel the pipe as empty flights and complete invisibly).
        lead = jnp.argmax(c.lens > 0).astype(jnp.int32)
        r = jnp.where(comp.n > 0, lead + 1, 0)
        sh = jnp.arange(s_cap, dtype=jnp.int32) + r
        lens = jnp.where(sh < s_cap, c.lens[jnp.clip(sh, 0, s_cap - 1)], 0)
        n_chunks = c.n_chunks - r
        next_inject = c.next_inject - r

        # ---- decide whether to verdict this turn ----
        all_verified = verified >= c.tree.n_nodes
        # Zero-length chunk entries (fully pruned) hold no tokens: the queue
        # is drained when nothing remains, even if n_chunks still counts
        # empties (they only retire when a real completion passes them).
        drained = (n_chunks <= 0) | (jnp.sum(lens) <= 0)
        if do_inflight_verdict:
            do_verdict = (comp.n > 0) | (drained & all_verified)
        else:
            do_verdict = all_verified & (c.tree.n_nodes > 0)

        force = (c.turn >= force_turn) | (c.n_out + d_cap >= out_cap)

        def verdict_branch(c, lens, n_chunks, next_inject, verified,
                           vhidden, vlogits):
            # subtree view: only entries with logits
            sub_retrieve = jnp.where(
                (c.tree.retrieve >= 0) & (c.tree.retrieve < verified),
                c.tree.retrieve, -1)
            vtree = dataclasses.replace(c.tree, retrieve=sub_retrieve)
            key, k1, k2 = jax.random.split(c.key, 3)
            if sampling.is_greedy:
                res = evaluate_posterior_greedy(vlogits, vtree)
            else:
                res = evaluate_posterior_stochastic(
                    vlogits, vtree, sampling, k1,
                    # exact sibling-trial bound: merged continuous trees can
                    # give a node more than 4*top_k distinct children across
                    # merge generations, and silently skipped siblings would
                    # bias the sampling law (advisor finding r1-low)
                    max_trials=tc.leaf_cap)
            new_root_tok = sample_token(k2, res.sample_p, sampling,
                                        is_probs=True)
            n_acc = res.accept_len + 1
            info = compute_pruning_info(c.tree, res.best_leaf, n_acc,
                                        new_root_tok)
            truncate = info.truncate | force
            if not do_inflight_verdict:
                # naive/serial/ar: single verdict per round, always re-draft
                truncate = jnp.asarray(True)

            # commit accepted tokens
            path = c.tree.retrieve[res.best_leaf]
            d_idx = jnp.arange(d_cap, dtype=jnp.int32)
            pv = d_idx < n_acc
            safe_path = jnp.clip(path, 0, n_cap - 1)
            acc_tokens = jnp.where(pv, c.tree.tokens[safe_path], 0)
            wpos = jnp.where(pv, c.n_out + d_idx, out_cap)
            out_tokens = c.out_tokens.at[wpos].set(acc_tokens, mode="drop")
            n_out = c.n_out + n_acc
            eos_hit = jnp.any(pv & (acc_tokens == eos_id) & (eos_id >= 0))
            over_budget = n_out >= budget
            truncate = truncate | eos_hit | over_budget

            # ---- per-stage kv compaction ----
            pos_cap = n_cap + d_cap
            src, n_src = kv_keep_positions(info, c.commit, c.kv_tree_len,
                                           pos_cap)
            # on truncate keep only the accepted path
            n_src = jnp.where(truncate, n_acc, n_src)
            kv = c.kv.compact(src, n_src, c.commit)
            kept_in_my_kv = jnp.sum(
                (info.kept_old_ids >= 0) &
                (info.kept_old_ids < c.kv_tree_len)).astype(jnp.int32)
            kv_tree_len = jnp.where(truncate, 0, kept_in_my_kv)

            # ---- replicated: prune tree + remap buffers ----
            new_tree = prune_tree(c.tree, info)
            old2new = jnp.full((n_cap,), -1, jnp.int32)
            kk = jnp.clip(info.kept_old_ids, 0, n_cap - 1)
            in_r = jnp.arange(n_cap, dtype=jnp.int32) < info.n_kept
            old2new = old2new.at[kk].set(
                jnp.where(in_r, jnp.arange(n_cap, dtype=jnp.int32), -1))

            gather_src = jnp.clip(kk, 0, n_cap - 1)
            vhid2 = jnp.where(in_r[:, None], vhidden[gather_src], 0)
            vlog2 = jnp.where(in_r[:, None], vlogits[gather_src], 0.0)
            dhid2 = jnp.where(in_r[:, None], c.dhidden[gather_src], 0)
            dhv2 = in_r & c.dh_valid[gather_src]
            verified2 = jnp.sum(
                in_r & (info.kept_old_ids < verified)).astype(jnp.int32)

            # Rebucket remaining chunk lengths: lens chunk q covers old node
            # ids [verified + cum_{q-1}, verified + cum_q), so shift kept ids
            # down by `verified` before bucketing.
            shifted = jnp.where(info.kept_old_ids >= 0,
                                info.kept_old_ids - verified, -1)
            lens2 = rebucket_lengths(lens, shifted, info.n_kept)
            commit2 = c.commit + n_acc

            # ---- in-flight chunk pruning (per stage) ----
            def remap_flight(fl: Flight) -> Flight:
                ids = fl.start + jnp.arange(c_buf, dtype=jnp.int32)
                ok = (jnp.arange(c_buf) < fl.n)
                nid = jnp.where(ok, old2new[jnp.clip(ids, 0, n_cap - 1)], -1)
                keep_row = nid >= 0
                order = jnp.argsort(~keep_row, stable=True)
                h2 = fl.h[order]
                nid2 = nid[order]
                n2 = jnp.sum(keep_row).astype(jnp.int32)
                start2 = jnp.where(n2 > 0, nid2[0], 0)
                return Flight(h=h2, start=start2, n=jnp.where(truncate, 0, n2))

            inc2 = remap_flight(inc)

            # ---- draft pairs: accepted + new root ----
            shifted_tok = jnp.roll(acc_tokens, -1)
            pair_tok = jnp.where(d_idx + 1 < n_acc, shifted_tok, 0)
            pair_tok = jnp.where(d_idx + 1 == n_acc, new_root_tok, pair_tok)
            pair_tok = jnp.where(d_idx < n_acc, pair_tok, 0)
            # hiddens of accepted nodes (all verified)
            ph = vhidden[jnp.clip(safe_path, 0, n_cap - 1)]
            ph = jnp.where(pv[:, None], ph, 0).astype(dt)
            pair_tok_p = jnp.zeros((ctx,), jnp.int32).at[:d_cap].set(pair_tok)
            pair_hid_p = jnp.zeros((1, ctx, h_dim), dt).at[0, :d_cap].set(ph)

            # ---- drain pairs (+ expansion) — skipped on truncate so the
            # pairs stay pending for the next round's initial draft ----
            def with_expand(args):
                (dcache, tree2_in, lens_in, n_chunks_in, beam_in, bok_in) = args
                d_out2, dc2 = draft_context_forward(
                    draft, dcache, pair_tok_p, pair_hid_p, dcache.length,
                    n_acc, mc)
                rh = d_out2[0, jnp.clip(n_acc - 1, 0, ctx - 1)]
                # re-draft size follows the reference's expand_total_token=64
                # (run_config.py:131), not the chunk length — the appended
                # set is then re-split into <= expand_chunk_len chunks below
                fresh, beam2, dc2 = topk_generate(
                    draft, bhead, dc2, new_root_tok, rh, tc, mc,
                    num_select=tc.expand_tokens, depth=tc.expand_depth,
                    max_levels=max_levels)
                mr = merge_trees(tree2_in, fresh)
                lens3, nch3, can_queue = _queue_appended(
                    lens_in, jnp.maximum(n_chunks_in, 0), mr.n_appended,
                    tc.expand_chunk_len, s_cap)
                t3 = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(can_queue, a, b), mr.tree,
                    tree2_in)
                # the fresh beam is rooted at the new root whether or not
                # its appended nodes fit the queue this turn
                return dc2, t3, lens3, nch3, beam2, \
                    jnp.asarray(tc.none_expand)

            def drain_only(args):
                (dcache, tree2_in, lens_in, n_chunks_in, beam_in, bok_in) = args
                _, dc2 = draft_context_forward(
                    draft, dcache, pair_tok_p, pair_hid_p, dcache.length,
                    n_acc, mc)
                return dc2, tree2_in, lens_in, n_chunks_in, beam_in, bok_in

            def pipedec_drain(args):
                # The draft KV mirrors the base layout for pipedec: ctx pairs
                # then tree nodes at dctx+node_id. Order matters: the ctx
                # drain writes a full padded block (ctx rows) at dctx, so the
                # kept-tree rows are gathered FIRST, the accepted pairs are
                # drained (their exact ctx-pair K/V overwriting the
                # tree-drafted versions), and the kept rows are then written
                # at dctx+n_acc — over the drain's padding, never under it.
                (dcache, tree2_in, lens_in, n_chunks_in, beam_in, bok_in) = args
                dctx = dcache.length
                keep_src = jnp.clip(info.kept_old_ids, 0, n_cap - 1) + dctx
                kk_ = jnp.take(dcache.k, keep_src, axis=3)
                kv_ = jnp.take(dcache.v, keep_src, axis=3)
                _, dc2 = draft_context_forward(
                    draft, dcache, pair_tok_p, pair_hid_p, dctx, n_acc, mc)
                new_k = jax.lax.dynamic_update_slice(
                    dc2.k, kk_, (0, 0, 0, dctx + n_acc, 0))
                new_v = jax.lax.dynamic_update_slice(
                    dc2.v, kv_, (0, 0, 0, dctx + n_acc, 0))
                dc2 = KVCache(k=new_k, v=new_v, length=dctx + n_acc)
                return dc2, tree2_in, lens_in, n_chunks_in, beam_in, bok_in

            def no_drain(args):
                return args

            args = (c.draft_cache, new_tree, lens2,
                    jnp.maximum(n_chunks, 0), c.beam, c.beam_ok)
            live_fn = (with_expand if do_expand
                       else (pipedec_drain if pipedec else drain_only))
            dcache2, tree3, lens3, nch3, beam3, bok3 = jax.lax.cond(
                truncate, no_drain, live_fn, args)
            vh3, vl3, vc3 = vhid2, vlog2, verified2

            # pending pairs for next round (only meaningful on truncate)
            return c._replace(
                tree=tree3, lens=lens3, n_chunks=nch3,
                next_inject=jnp.maximum(next_inject, 0),
                verified=vc3, commit=commit2, key=key, draft_cache=dcache2,
                vhidden=vh3, vlogits=vl3, dhidden=dhid2, dh_valid=dhv2,
                out_tokens=out_tokens, n_out=n_out,
                truncate=truncate, sampled_root=new_root_tok,
                pend_tok=pair_tok_p, pend_hid=pair_hid_p,
                pend_n=jnp.where(truncate, n_acc, jnp.zeros((), jnp.int32)),
                beam=beam3, beam_ok=bok3,
                kv=kv, kv_tree_len=kv_tree_len,
                out=c.out), inc2

        def skip_branch(c, lens, n_chunks, next_inject, verified, vhidden,
                        vlogits):
            c2 = c._replace(lens=lens, n_chunks=n_chunks,
                            next_inject=next_inject, verified=verified,
                            vhidden=vhidden, vlogits=vlogits)
            return c2, inc

        c2, inc2 = jax.lax.cond(
            do_verdict, verdict_branch, skip_branch,
            c, lens, n_chunks, next_inject, verified, vhidden, vlogits)

        if do_expand and tc.none_expand:
            # ---- no-completion expansion (ref none_expand,
            # stage_ea_model.py:1347-1382 + eagle/cnets.py:1439-1708): on a
            # bubble turn the draft stage deepens the saved beam by
            # none_expand_depth levels, force-includes the previous node set
            # and tops up with the best none_expand_tokens NEW candidates;
            # the merge then appends exactly those new nodes. Gated on
            # commit growth (>= one verdict happened this round) — in the
            # reference, fill-phase turns never reach the expansion branch
            # (fill happens before the loop), so the first expansion can
            # only follow the first verdict.
            def ne_expand(c2):
                tree_x, beam2, dc2 = expand_tree(
                    draft, bhead, c2.draft_cache, c2.beam,
                    c2.tree.tokens[0], tc, mc,
                    extra_depth=tc.none_expand_depth,
                    expand_size=tc.none_expand_tokens,
                    max_levels=max_levels)
                mr = merge_trees(c2.tree, tree_x)
                lens_, nch_, okq = _queue_appended(
                    c2.lens, jnp.maximum(c2.n_chunks, 0), mr.n_appended,
                    tc.expand_chunk_len, s_cap)
                sel = lambda a, b: jnp.where(okq, a, b)
                return c2._replace(
                    tree=jax.tree_util.tree_map(sel, mr.tree, c2.tree),
                    lens=lens_, n_chunks=nch_,
                    draft_cache=jax.tree_util.tree_map(
                        sel, dc2, c2.draft_cache),
                    beam=jax.tree_util.tree_map(sel, beam2, c2.beam))

            can_ne = (~do_verdict & ~c2.truncate & c2.beam_ok &
                      (c2.commit > state.commit_len) &
                      (c2.beam.level + tc.none_expand_depth <= max_levels) &
                      (c2.tree.n_nodes < n_cap))
            c2 = jax.lax.cond(can_ne, ne_expand, lambda c_: c_, c2)
            c2 = c2._replace(ne_fires=c2.ne_fires +
                             jnp.where(can_ne, 1, 0))

        if pipedec:
            # ---- depth-synchronous expansion: grow ONE level per turn ----
            # (ref Model.expand_pipedec, eagle/cnets.py:1711-1957 — there by
            # re-embedding the pruned tree each turn; here the per-node draft
            # hiddens persist in `dhidden` and only the frontier is forwarded)
            k_pd = tc.top_k

            def pd_expand(c2):
                t = c2.tree
                dc = c2.draft_cache
                valid = t.valid()
                maxd = jnp.max(jnp.where(valid, t.depth, 0))
                isf = valid & (t.depth == maxd)
                n_f = jnp.sum(isf).astype(jnp.int32)
                # frontier == trailing contiguous id block (levels stay
                # id-ordered: BFS build + order-preserving prune/append)
                f_start = t.n_nodes - n_f
                fi = jnp.arange(k_pd, dtype=jnp.int32)
                f_ids = f_start + fi
                fv = fi < n_f
                sf = jnp.clip(f_ids, 0, n_cap - 1)
                dctx = dc.length

                par = t.parents[sf]
                par_h = c2.dhidden[jnp.clip(par, 0, n_cap - 1)]
                x = fuse(draft, t.tokens[sf][None],
                         par_h[None].astype(c2.dhidden.dtype))
                positions = dctx + jnp.maximum(t.depth[sf] - 1, 0)
                s_draft = dc.max_len
                jd = jnp.arange(s_draft, dtype=jnp.int32)[None, :]
                anc = ancestor_matrix(t.parents, t.depth_cap, valid)
                rowsb = anc[sf] & fv[:, None]
                tree_col = jnp.clip(jd - dctx, 0, n_cap - 1)
                tree_ok = jnp.take_along_axis(
                    rowsb, jnp.broadcast_to(tree_col, (k_pd, s_draft)),
                    axis=1)
                # tree column 0 (the root) is excluded: its K/V lives in the
                # ctx region (last drained pair) — slot dctx+0 is either
                # unwritten (round start) or a duplicate copy (after drains)
                okb = jnp.where(jd < dctx, True, tree_ok & (jd > dctx))
                biasb = jnp.where(okb, 0.0, NEG_INF).astype(jnp.float32)
                out_h, dk, dv = eagle_layer(
                    x, draft, dc.k[0], dc.v[0], positions, biasb,
                    dctx + f_start, draft_view(draft, mc))
                out_h = project_out(draft, out_h,
                                    par_h[None])[0]           # (k_pd, H)
                dh2 = c2.dhidden.at[jnp.where(fv, sf, n_cap)].set(
                    out_h.astype(c2.dhidden.dtype), mode="drop")
                dhv2 = c2.dh_valid.at[jnp.where(fv, sf, n_cap)].set(
                    True, mode="drop")

                # score_temperature: same sharpened scoring as the beam
                # (logits linear in the hidden; see TreeConfig)
                logits = head_logits(out_h / tc.score_temperature, bhead)
                logp = jax.nn.log_softmax(logits, axis=-1)
                row_logp, row_tok = jax.lax.approx_max_k(
                    logp, k_pd, recall_target=1.0)
                cu = row_logp + jnp.where(fv, t.scores[sf], -jnp.inf)[:, None]
                top_sc, sel = jax.lax.top_k(cu.reshape(-1), k_pd)
                b = sel // k_pd
                new_tok = row_tok.reshape(-1)[sel].astype(jnp.int32)
                new_par = f_ids[b]
                n0 = t.n_nodes
                wpos = jnp.where(top_sc > -jnp.inf, n0 + fi, n_cap)
                tokens2 = t.tokens.at[wpos].set(new_tok, mode="drop")
                parents2 = t.parents.at[wpos].set(new_par, mode="drop")
                scores2 = t.scores.at[wpos].set(top_sc, mode="drop")
                n_new = jnp.sum(top_sc > -jnp.inf).astype(jnp.int32)
                t2 = finalize_tree(tokens2, parents2, scores2, n0 + n_new,
                                   t.leaf_cap, t.depth_cap)
                lens_ = c2.lens.at[jnp.clip(c2.n_chunks, 0, s_cap - 1)].set(
                    n_new)
                return c2._replace(
                    tree=t2, lens=lens_, n_chunks=c2.n_chunks + 1,
                    dhidden=dh2, dh_valid=dhv2,
                    draft_cache=KVCache(k=dk[None], v=dv[None], length=dctx))

            t_ = c2.tree
            maxd_ = jnp.max(jnp.where(t_.valid(), t_.depth, 0))
            can_expand = (~c2.truncate &
                          (t_.n_nodes + k_pd <= n_cap) &
                          (maxd_ + 2 < d_cap) &
                          (c2.n_chunks < s_cap))
            c2 = jax.lax.cond(can_expand, pd_expand, lambda c_: c_, c2)

        # ---- set my in-flight chunk: stage 0 injects, others take ring ----
        cum = jnp.cumsum(c2.lens)
        q = jnp.clip(c2.next_inject, 0, s_cap - 1)
        inj_start = c2.verified + jnp.where(q > 0, cum[q - 1], 0)
        inj_len = jnp.where(
            (c2.next_inject >= 0) & (c2.next_inject < c2.n_chunks),
            c2.lens[q], 0)
        inj_ids = inj_start + jnp.arange(c_buf, dtype=jnp.int32)
        inj_tok = jnp.where(jnp.arange(c_buf) < inj_len,
                            c2.tree.tokens[jnp.clip(inj_ids, 0, n_cap - 1)], 0)
        inj_h = embed_tokens(params, inj_tok[None])[0].astype(dt)
        idx0 = idx == 0
        my = Flight(
            h=jnp.where(idx0, inj_h, inc2.h),
            start=jnp.where(idx0, inj_start, inc2.start),
            n=jnp.where(idx0, jnp.where(c2.truncate, 0, inj_len), inc2.n))
        # next_inject is replicated state: all stages advance it identically.
        # Zero-length entries are consumed too (they travel as empty flights).
        next_inject2 = jnp.where(
            (c2.next_inject < c2.n_chunks) & ~c2.truncate,
            c2.next_inject + 1, c2.next_inject)

        # ---- forward ----
        def fwd(kv):
            return _forward_chunk(params, kv, c2.tree, my, c2.commit, c_buf,
                                  mc)
        h_out, kv2 = jax.lax.cond(
            (my.n > 0) & ~c2.truncate, fwd,
            lambda kv: (jnp.zeros_like(my.h), kv), c2.kv)
        out_fl = Flight(h=h_out, start=my.start,
                        n=jnp.where(c2.truncate, 0, my.n))
        kv_tree_len2 = jnp.where(
            out_fl.n > 0, jnp.maximum(c2.kv_tree_len,
                                      out_fl.start + out_fl.n),
            c2.kv_tree_len)

        # ---- aliveness ----
        in_flight = jax.lax.psum(out_fl.n, "stage")
        more_to_inject = next_inject2 < c2.n_chunks
        unverified_left = c2.verified < c2.tree.n_nodes
        alive = ~c2.truncate & (
            (in_flight > 0) | more_to_inject | unverified_left)

        return c2._replace(
            next_inject=next_inject2,
            turn=c.turn + 1,
            skips=c.skips + jnp.where(do_verdict, 0, 1),
            alive=alive,
            kv=kv2, kv_tree_len=kv_tree_len2,
            out=out_fl)

    final = jax.lax.while_loop(cond, body, carry)

    # On rounds that end without a natural truncate (shouldn't happen given
    # force_turn, but guard): keep the previous root.
    new_root = jnp.where(final.truncate, final.sampled_root,
                         state.root_token)
    new_state = PipeState(
        kv=final.kv.with_length(final.commit),
        draft_cache=final.draft_cache,
        commit_len=final.commit,
        root_token=new_root,
        pend_tok=final.pend_tok,
        pend_hid=final.pend_hid,
        pend_n=final.pend_n,
        key=final.key)
    return new_state, RoundOut(out_tokens=final.out_tokens,
                               n_out=final.n_out, turns=final.turn,
                               skips=final.skips, ne_fires=final.ne_fires,
                               rounds=jnp.ones((), jnp.int32))


def _pipeline_decode_loop(params, draft, state: PipeState, eos_id, budget,
                          beam_head=None, *,
                          mc, tc, sampling, p, c_buf, out_cap, max_turns,
                          force_turn, schedule, max_levels):
    """On-device multi-round loop around _pipeline_round: rounds repeat until
    eos or the token budget, accumulating committed tokens."""
    buf_cap = out_cap * 4

    def round_fn(st, remaining):
        return _pipeline_round(
            params, draft, st, eos_id, remaining, beam_head, mc=mc, tc=tc,
            sampling=sampling, p=p, c_buf=c_buf, out_cap=out_cap,
            max_turns=max_turns, force_turn=force_turn, schedule=schedule,
            max_levels=max_levels)

    def cond(carry):
        _, _, n_out, done, _, _, _, _ = carry
        return ~done & (n_out < budget)

    def body(carry):
        st, out, n_out, done, turns, skips, ne, rounds = carry
        st2, res = round_fn(st, budget - n_out)
        i = jnp.arange(out_cap, dtype=jnp.int32)
        pv = i < res.n_out
        wpos = jnp.where(pv, n_out + i, buf_cap)
        toks = jnp.where(pv, res.out_tokens, 0)
        out2 = out.at[wpos].set(toks, mode="drop")
        eos_hit = jnp.any(pv & (res.out_tokens == eos_id) & (eos_id >= 0))
        stalled = res.n_out <= 0
        return (st2, out2, n_out + res.n_out, done | eos_hit | stalled,
                turns + res.turns, skips + res.skips, ne + res.ne_fires,
                rounds + 1)

    init = (state, jnp.zeros((buf_cap,), jnp.int32),
            jnp.zeros((), jnp.int32), jnp.asarray(False),
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    (st, out, n_out, _, turns, skips, ne,
     rounds) = jax.lax.while_loop(cond, body, init)
    return st, RoundOut(out_tokens=out[:out_cap] if buf_cap != out_cap
                        else out, n_out=n_out, turns=turns, skips=skips,
                        ne_fires=ne, rounds=rounds)
