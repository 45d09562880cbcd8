"""Parameter checkpoint save/load (incl. quantized weights).

Replaces the reference's offline weight splitter workflow
(tools/split_and_save_models.py, tp/tp_split_and_save_models.py): there is
nothing to split per-stage here — sharding happens at load — but quantizing a
7B+ model is worth doing once and persisting. Stores the pytree as a
directory of .npy leaves plus a JSON manifest describing structure and
quantized-container boundaries, so reload needs no torch/safetensors.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from flowspec_tpu.models.llama import LlamaLayerParams, LlamaParams
from flowspec_tpu.models.mixtral import MixtralLayerParams, MixtralParams
from flowspec_tpu.models.kv_cache import KVCache
from flowspec_tpu.draft.eagle import EagleParams
from flowspec_tpu.ops.quant import Int4Tensor, Int8Tensor, NF4Tensor


def _engine_classes():
    # imported lazily to avoid a runtime<->models import cycle
    from flowspec_tpu.runtime.engine import EngineState
    from flowspec_tpu.parallel.pipeline import PipeState
    return (EngineState, PipeState)


_CLASSES = {c.__name__: c for c in (
    LlamaParams, LlamaLayerParams, MixtralParams, MixtralLayerParams,
    EagleParams, Int4Tensor, Int8Tensor, NF4Tensor, KVCache)}


def _all_classes():
    out = dict(_CLASSES)
    for c in _engine_classes():
        out[c.__name__] = c
    return out


def _encode(obj, leaves, prefix):
    if obj is None:          # optional fields (EagleParams.w_out)
        return {"__none__": True}
    if isinstance(obj, tuple(_all_classes().values())):
        fields = {}
        for f in dataclasses.fields(obj):
            fields[f.name] = _encode(getattr(obj, f.name), leaves,
                                     f"{prefix}.{f.name}")
        return {"__class__": type(obj).__name__, "fields": fields}
    leaves[prefix] = np.asarray(obj)
    return {"__leaf__": prefix}


def _decode(node, load_leaf):
    if "__none__" in node:
        return None
    if "__leaf__" in node:
        return jnp.asarray(load_leaf(node["__leaf__"]))
    cls = _all_classes()[node["__class__"]]
    return cls(**{k: _decode(v, load_leaf)
                  for k, v in node["fields"].items()})


def save_params(params, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    leaves: dict[str, np.ndarray] = {}
    manifest = _encode(params, leaves, "p")
    for name, arr in leaves.items():
        # bfloat16 has no portable npy dtype; store raw bytes + dtype tag
        if arr.dtype == jnp.bfloat16:
            np.save(os.path.join(out_dir, name + ".bf16.npy"),
                    arr.view(np.uint16))
        else:
            np.save(os.path.join(out_dir, name + ".npy"), arr)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def load_params(out_dir: str):
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)

    def load_leaf(name):
        bf16 = os.path.join(out_dir, name + ".bf16.npy")
        if os.path.exists(bf16):
            return np.load(bf16).view(jnp.bfloat16)
        return np.load(os.path.join(out_dir, name + ".npy"))

    return _decode(manifest, load_leaf)


def save_state(state, out_dir: str) -> None:
    """Persist a mid-generation EngineState / PipeState (KV caches, pending
    draft pairs, RNG key) for resume — a capability the reference lacks
    (SURVEY.md section 5: "No ... mid-generation resume"). PRNG key arrays
    are stored via their raw key data."""
    state = jax.tree_util.tree_map(
        lambda x: jax.random.key_data(x)
        if jnp.issubdtype(getattr(x, "dtype", np.float32), jax.dtypes.prng_key)
        else x, state)
    save_params(state, out_dir)


def load_state(out_dir: str, rewrap_key: bool = True):
    state = load_params(out_dir)
    if rewrap_key and hasattr(state, "key"):
        state = dataclasses.replace(
            state, key=jax.random.wrap_key_data(state.key))
    return state
