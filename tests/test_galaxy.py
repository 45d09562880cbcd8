"""Galaxy-mode TP (sequence-sharded ring collectives) losslessness.

The reference's galaxy mode (tp/tp_modeling_llama.py:611-962) is numerically
the same computation as plain megatron TP, re-scheduled; these tests pin that
equivalence: ring collectives == one-shot collectives, and the full engine
over galaxy forwards == the single-chip engine, token for token.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowspec_tpu.config import (
    EngineConfig, ModelConfig, SamplingConfig, TreeConfig,
)


def _mesh(tp):
    from flowspec_tpu.parallel.mesh import tp_mesh
    if len(jax.devices()) < tp:
        pytest.skip(f"needs {tp} devices")
    return tp_mesh(tp)


def test_ring_primitives_match_dense():
    """ring_ag_matmuls == (all_gather @ w); ring_matmul_rs ==
    block-of(sum_r y_r @ w_r)."""
    from jax.sharding import PartitionSpec as P
    from flowspec_tpu.parallel.galaxy import ring_ag_matmuls, ring_matmul_rs

    tp = 4
    mesh = _mesh(tp)
    t, h, o = 8, 16, 12
    k = jax.random.key(0)
    x = jax.random.normal(k, (t, h), jnp.float32)
    w1 = jax.random.normal(jax.random.fold_in(k, 1), (h, o), jnp.float32)
    w2 = jax.random.normal(jax.random.fold_in(k, 2), (h, o), jnp.float32)
    wr = jax.random.normal(jax.random.fold_in(k, 3), (h, o * 2), jnp.float32)

    ag = jax.shard_map(
        lambda xl, a, b: ring_ag_matmuls(xl, [a, b], "tp", tp),
        mesh=mesh, in_specs=(P("tp", None), P(None, "tp"), P(None, "tp")),
        out_specs=[P(None, "tp"), P(None, "tp")], check_vma=False)
    y1, y2 = ag(x, w1, w2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(x @ w1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(x @ w2),
                               rtol=1e-5, atol=1e-5)

    # reduce-scatter: y (t, h) row-sharded over h; w (h, o*2) row-sharded
    rs = jax.shard_map(
        lambda yl, wl: ring_matmul_rs(yl, wl, "tp", tp),
        mesh=mesh, in_specs=(P(None, "tp"), P("tp", None)),
        out_specs=P("tp", None), check_vma=False)
    z = rs(x, wr)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x @ wr),
                               rtol=1e-4, atol=1e-4)


def _tiny_setup(kv_heads=None):
    from flowspec_tpu.draft.eagle import init_eagle_params
    from flowspec_tpu.models.llama import init_llama_params

    import dataclasses
    mc = dataclasses.replace(ModelConfig.tiny(), dtype="float32")
    if kv_heads:
        mc = dataclasses.replace(mc, num_key_value_heads=kv_heads)
    cfg = EngineConfig(
        model=mc,
        tree=TreeConfig(total_tokens=15, top_k=4, depth=3, node_cap=16,
                        leaf_cap=8, depth_cap=6),
        sampling=SamplingConfig(),
        max_new_tokens=24, max_seq_len=160, prefill_chunk=16)
    params = init_llama_params(jax.random.key(3), cfg=mc)
    draft = init_eagle_params(jax.random.key(4), mc, embed=params.embed,
                              dtype=jnp.float32)
    return mc, cfg, params, draft


@pytest.mark.parametrize("tp", [2, 4])
def test_galaxy_spec_lossless(tp):
    """TPEngine(galaxy=True) emits the same greedy tokens as the single-chip
    SpecEngine (which the suite elsewhere pins against AR and HF)."""
    from flowspec_tpu.parallel.tp import TPEngine
    from flowspec_tpu.runtime.engine import SpecEngine

    mesh = _mesh(tp)
    mc, cfg, params, draft = _tiny_setup(kv_heads=tp if tp > 2 else None)
    assert mc.num_key_value_heads % tp == 0

    prompt = list(np.random.default_rng(0).integers(3, 30, 11))
    ref_eng = SpecEngine(params, draft, cfg)
    ref, _ = ref_eng.generate(prompt, max_new_tokens=24, eos_token_id=-1)

    gal = TPEngine(params, draft, cfg, mesh=mesh, galaxy=True)
    out, stats = gal.generate(prompt, max_new_tokens=24, eos_token_id=-1)
    assert out == ref, (out, ref)
    # AR path (T=1 rows fall back to the GSPMD forward) must agree too
    ar, _ = gal.generate_ar(prompt, max_new_tokens=24, eos_token_id=-1)
    assert ar == ref[:len(ar)]
