"""Logits warpers vs HuggingFace's (the reference composes HF warpers,
pipeline_utils.py:61-77: temperature -> top-p -> top-k in append order)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flowspec_tpu.config import SamplingConfig
from flowspec_tpu.tree.sampling import warp_logits

VOCAB = 64


def _hf_warp(logits_np, temperature, top_p, top_k):
    torch = pytest.importorskip("torch")
    from transformers.generation.logits_process import (
        LogitsProcessorList, TemperatureLogitsWarper, TopKLogitsWarper,
        TopPLogitsWarper,
    )
    pl = LogitsProcessorList()
    if temperature >= 1e-5 and temperature != 1.0:
        pl.append(TemperatureLogitsWarper(temperature))
    if 1e-8 <= top_p < 1.0:
        pl.append(TopPLogitsWarper(top_p))
    if top_k > 0:
        pl.append(TopKLogitsWarper(top_k))
    t = torch.tensor(logits_np)[None]
    return pl(None, t)[0].numpy()


@pytest.mark.parametrize("temperature,top_p,top_k", [
    (0.7, 0.0, 0),
    (1.0, 0.9, 0),
    (1.0, 0.0, 8),
    (0.8, 0.95, 10),
    (1.0, 0.5, 4),
])
def test_warp_matches_hf(temperature, top_p, top_k):
    rng = np.random.default_rng(0)
    for trial in range(5):
        logits = rng.normal(size=(VOCAB,)).astype(np.float32) * 3
        ref = _hf_warp(logits, temperature, top_p, top_k)
        got = np.asarray(warp_logits(
            jnp.asarray(logits),
            SamplingConfig(temperature=temperature, top_p=top_p,
                           top_k=top_k)))
        # compare the kept/filtered masks and the kept values
        ref_mask = np.isfinite(ref)
        got_mask = np.isfinite(got)
        np.testing.assert_array_equal(got_mask, ref_mask, err_msg=str(trial))
        np.testing.assert_allclose(got[got_mask], ref[ref_mask], rtol=1e-5)


def test_greedy_passthrough():
    logits = np.random.default_rng(1).normal(size=(VOCAB,)).astype(np.float32)
    got = np.asarray(warp_logits(jnp.asarray(logits), SamplingConfig()))
    np.testing.assert_array_equal(got, logits)
