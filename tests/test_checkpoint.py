"""Parameter + mid-generation state persistence."""

import numpy as np
import jax
import jax.numpy as jnp

from flowspec_tpu.config import (
    EngineConfig, ModelConfig, SamplingConfig, TreeConfig,
)
from flowspec_tpu.draft.eagle import init_eagle_params
from flowspec_tpu.models.checkpoint import (
    load_params, load_state, save_params, save_state,
)
from flowspec_tpu.models.llama import init_llama_params, quantize_llama_params
from flowspec_tpu.runtime import SpecEngine


def _eq(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return (jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
            and all(bool(jnp.array_equal(x, y)) for x, y in zip(la, lb)))


def test_quantized_params_roundtrip(tmp_path):
    mc = ModelConfig.tiny()
    p = init_llama_params(jax.random.key(0), mc)
    for kind in ("int8", "nf4", "int4"):
        q = quantize_llama_params(p, kind)
        d = tmp_path / kind
        save_params(q, str(d))
        assert _eq(q, load_params(str(d)))


def test_generation_state_resume(tmp_path):
    """Checkpoint after 4 rounds, resume from disk, finish — the token
    stream must match an uninterrupted run exactly."""
    mc = ModelConfig.tiny(vocab_size=16, n_layers=2)
    mc = type(mc)(**{**mc.__dict__, "dtype": "float32"})
    tc = TreeConfig(top_k=6, depth=3, total_tokens=16, expand_tokens=12,
                    expand_depth=2, node_cap=32, leaf_cap=32, depth_cap=10,
                    chunk_len=8)
    cfg = EngineConfig(model=mc, tree=tc, sampling=SamplingConfig(),
                       max_seq_len=128, prefill_chunk=16)
    p = init_llama_params(jax.random.key(0), mc, dtype=jnp.float32)
    d = init_eagle_params(jax.random.key(9), mc, embed=p.embed,
                          dtype=jnp.float32)
    eng = SpecEngine(p, d, cfg)
    prompt = list(np.random.default_rng(0).integers(3, 14, 8))
    full, _ = eng.generate(prompt, max_new_tokens=12, eos_token_id=-1)

    st = eng.init_state(0)
    st = eng.prefill(st, prompt)
    out = list(prompt)
    for _ in range(4):
        st, res = eng._round(st, eng.params, eng.draft)
        out += [int(t) for t in
                np.asarray(res.accepted)[:int(res.n_accepted)]]
    save_state(st, str(tmp_path / "st"))
    st2 = load_state(str(tmp_path / "st"))
    while len(out) < len(prompt) + 12:
        st2, res = eng._round(st2, eng.params, eng.draft)
        out += [int(t) for t in
                np.asarray(res.accepted)[:int(res.n_accepted)]]
    assert out[:len(prompt) + 12] == full
