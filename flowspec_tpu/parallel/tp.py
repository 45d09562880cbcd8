"""Tensor-parallel verification path.

Reference: the `tp/` package — `TPEaModel` (tp/tp_ea_model.py),
Column/RowParallel layers (tp/tp_layers.py) and the "galaxy" sequence-sharded
ring-overlap collectives (tp/tp_modeling_llama.py:611-758). The reference
hand-writes isend/irecv rings inside every layer because gloo-over-Ethernet
needs manual overlap; on a TPU mesh the idiomatic equivalent is GSPMD: weights
carry megatron PartitionSpecs (qkv/gate/up column-sharded, o/down
row-sharded, KV cache head-sharded, lm_head vocab-sharded) and XLA inserts +
overlaps the all-reduces on ICI. The engine code is unchanged — TPEngine is
SpecEngine with sharded placement.

The galaxy mode's sequence-sharded ring all-gather/reduce-scatter overlap is
what XLA's latency-hiding scheduler does for these collectives automatically;
a manual Pallas ring variant is a later optimization target.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flowspec_tpu.config import EngineConfig
from flowspec_tpu.draft.eagle import EagleParams
from flowspec_tpu.models.kv_cache import KVCache
from flowspec_tpu.parallel.mesh import put_global
from flowspec_tpu.models.llama import LlamaParams
from flowspec_tpu.runtime.engine import SpecEngine


def shard_params_tp(params, mesh: Mesh):
    """Megatron layout (ref tp/tp_split_and_save_models.py:61-72: chunk dim 0
    for q/k/v/gate/up/embed/lm_head, dim 1 for o/down — HF stores (out, in),
    ours are (in, out), so 'dim 0' becomes our last axis). Mixtral params get
    expert parallelism: the stacked expert weights shard the E axis over
    'tp' (the reference has no EP at all, SURVEY.md section 2.4)."""
    from flowspec_tpu.models.mixtral import MixtralParams
    from flowspec_tpu.ops.quant import Int4Tensor, Int8Tensor, NF4Tensor

    if isinstance(params, MixtralParams):
        return _shard_mixtral_tp(params, mesh)

    def put(x, spec):
        return put_global(x, NamedSharding(mesh, spec))

    def put_w(w, kind):
        """kind 'col' shards Out, 'row' shards In — handles quantized
        containers (int8 scale follows Out; nf4/int4 scale blocks follow
        In)."""
        if isinstance(w, Int8Tensor):
            if kind == "col":
                return Int8Tensor(q=put(w.q, P(None, None, "tp")),
                                  scale=put(w.scale, P(None, "tp")))
            return Int8Tensor(q=put(w.q, P(None, "tp", None)),
                              scale=put(w.scale, P()))
        if isinstance(w, (NF4Tensor, Int4Tensor)):
            if kind == "col":
                return type(w)(q=put(w.q, P(None, None, "tp")),
                               scale=put(w.scale, P(None, None, "tp")))
            return type(w)(q=put(w.q, P(None, "tp", None)),
                           scale=put(w.scale, P(None, "tp", None)))
        return put(w, P(None, None, "tp") if kind == "col"
                   else P(None, "tp", None))

    lp = params.layers
    vec_col = P(None, "tp")
    lp = dataclasses.replace(
        lp,
        wq=put_w(lp.wq, "col"), wk=put_w(lp.wk, "col"),
        wv=put_w(lp.wv, "col"),
        bq=put(lp.bq, vec_col), bk=put(lp.bk, vec_col), bv=put(lp.bv, vec_col),
        wo=put_w(lp.wo, "row"),
        w_gate=put_w(lp.w_gate, "col"), w_up=put_w(lp.w_up, "col"),
        w_down=put_w(lp.w_down, "row"),
        input_ln=put(lp.input_ln, P()), post_ln=put(lp.post_ln, P()),
    )
    return dataclasses.replace(
        params, layers=lp,
        embed=put(params.embed, P()),
        final_norm=put(params.final_norm, P()),
        lm_head=put(params.lm_head, P(None, "tp")),
    )


def _shard_mixtral_tp(params, mesh: Mesh):
    """Attention column/row sharding as for llama; MoE experts sharded over
    'tp' (expert parallelism — each device holds E/tp experts; the mixture
    combine einsum becomes a psum XLA inserts)."""
    def put(x, spec):
        return put_global(x, NamedSharding(mesh, spec))

    lp = params.layers
    col = P(None, None, "tp")
    row = P(None, "tp", None)
    ep = P(None, "tp", None, None)     # (L, E, ., .)
    lp = dataclasses.replace(
        lp,
        wq=put(lp.wq, col), wk=put(lp.wk, col), wv=put(lp.wv, col),
        wo=put(lp.wo, row),
        router=put(lp.router, P()),
        w_gate=put(lp.w_gate, ep), w_up=put(lp.w_up, ep),
        w_down=put(lp.w_down, ep),
        input_ln=put(lp.input_ln, P()), post_ln=put(lp.post_ln, P()),
    )
    return dataclasses.replace(
        params, layers=lp,
        embed=put(params.embed, P()),
        final_norm=put(params.final_norm, P()),
        lm_head=put(params.lm_head, P(None, "tp")),
    )


def shard_draft_tp(draft: EagleParams, mesh: Mesh) -> EagleParams:
    from flowspec_tpu.ops.quant import Int4Tensor, Int8Tensor, NF4Tensor

    def put(x, spec):
        return put_global(x, NamedSharding(mesh, spec))

    def put_w(w, kind):
        # 2-D draft weights (In, Out); same quantized-container handling as
        # shard_params_tp minus the layer axis
        if isinstance(w, Int8Tensor):
            if kind == "col":
                return Int8Tensor(q=put(w.q, P(None, "tp")),
                                  scale=put(w.scale, P("tp")))
            return Int8Tensor(q=put(w.q, P("tp", None)),
                              scale=put(w.scale, P()))
        if isinstance(w, (NF4Tensor, Int4Tensor)):
            if kind == "col":
                return type(w)(q=put(w.q, P(None, "tp")),
                               scale=put(w.scale, P(None, "tp")))
            return type(w)(q=put(w.q, P("tp", None)),
                           scale=put(w.scale, P("tp", None)))
        return put(w, P(None, "tp") if kind == "col" else P("tp", None))

    return dataclasses.replace(
        draft,
        embed=put(draft.embed, P()),
        fc_w=put_w(draft.fc_w, "col"), fc_b=put(draft.fc_b, P("tp")),
        wq=put_w(draft.wq, "col"), wk=put_w(draft.wk, "col"),
        wv=put_w(draft.wv, "col"), wo=put_w(draft.wo, "row"),
        w_gate=put_w(draft.w_gate, "col"),
        w_up=put_w(draft.w_up, "col"),
        w_down=put_w(draft.w_down, "row"),
        post_ln=put(draft.post_ln, P()),
    )


class TPEngine(SpecEngine):
    """SpecEngine with tensor-parallel weight/KV placement.

    Mirrors tp_generate (tp/tp_ea_model.py:155-391): the draft tree is built
    once (replicated compute), the whole tree is verified in a single
    TP-sharded forward, acceptance + KV compaction as usual.

    `galaxy=True` selects the reference's flagship TP variant — sequence-
    sharded activations with explicit ring-overlap collectives
    (tp/tp_modeling_llama.py:611-962) — for the multi-row verify/prefill
    forwards; see parallel/galaxy.py. Weight/KV placement is identical, so
    the two modes produce the same tokens and differ only in collective
    schedule.
    """

    def __init__(self, params: LlamaParams, draft: EagleParams,
                 cfg: EngineConfig, mesh: Mesh | None = None,
                 tp: int | None = None, galaxy: bool = False):
        if mesh is None:
            from flowspec_tpu.parallel.mesh import tp_mesh
            tp = tp or min(4, len(jax.devices()))
            mesh = tp_mesh(tp)
        self.mesh = mesh
        tp_size = mesh.shape["tp"]
        assert cfg.model.num_key_value_heads % tp_size == 0, \
            "kv heads must divide tp"
        if cfg.model.num_local_experts:
            assert cfg.model.num_local_experts % tp_size == 0, \
                "experts must divide tp (expert parallelism)"
        params = shard_params_tp(params, mesh)
        draft = shard_draft_tp(draft, mesh)
        fwd = None
        if galaxy:
            from flowspec_tpu.parallel.galaxy import make_galaxy_forward
            assert cfg.model.num_attention_heads % tp_size == 0, \
                "q heads must divide tp (galaxy)"
            fwd = make_galaxy_forward(mesh)
        super().__init__(params, draft, cfg, forward_fn=fwd)

    def init_state(self, seed: int = 0, max_seq: int = None):
        state = super().init_state(seed, max_seq=max_seq)
        put = lambda x, spec: put_global(
            x, NamedSharding(self.mesh, spec))
        head_sharded = P(None, None, "tp", None, None)
        bc = state.base_cache
        dc = state.draft_cache
        return dataclasses.replace(
            state,
            base_cache=KVCache(k=put(bc.k, head_sharded),
                               v=put(bc.v, head_sharded), length=bc.length),
            draft_cache=KVCache(k=put(dc.k, head_sharded),
                                v=put(dc.v, head_sharded), length=dc.length),
        )
