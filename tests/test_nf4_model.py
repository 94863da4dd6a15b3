"""NF4 end-to-end: whole model quantized with the NF4 codebook riding the
pair-K LUT fast path (codebook-as-data) — the capability the reference
advertises but silently ignores (its runtime codebook argument is unused,
SURVEY.md §2.4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from torch_bnb_fp4_tpu.models import (
    KVCache,
    ModelConfig,
    forward,
    generate,
    quantize_params,
)
from torch_bnb_fp4_tpu.models import transformer as T

# multi-second scan/compile tests: deselect with -m 'not slow' (<2min fast path)
pytestmark = pytest.mark.slow

CFG = ModelConfig.tiny_test(n_layers=1, quant_type="nf4")


def test_nf4_model_forward_and_generate():
    weights = T.random_weights(CFG, seed=21)
    params = quantize_params(CFG, weights)
    assert params.layers[0].wq.layout == "pairk"
    assert params.layers[0].wq.variant == "lut"
    assert params.layers[0].wq.codebook is not None
    tokens = jnp.asarray([[3, 1, 4]], jnp.int32)
    ref = np.asarray(T.reference_forward(CFG, weights, tokens))
    got, _ = forward(params, CFG, tokens, KVCache.zeros(CFG, 1, 3))
    got = np.asarray(got)
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9, corr  # NF4 tracks the bf16 twin
    out = generate(params, CFG, tokens, max_new_tokens=3)
    assert out.shape == (1, 3)


def test_nf4_error_band_comparable_to_fp4():
    """NF4 weight error should be in the same ballpark as FP4 (it's designed
    for gaussian weights, typically slightly better)."""
    from torch_bnb_fp4_tpu.models import dequantize_weight, quantize_linear

    rng = np.random.default_rng(0)
    w = (rng.standard_normal((256, 1024)) * 0.05).astype(np.float32)
    errs = {}
    for qt in ("fp4", "nf4"):
        q = quantize_linear(w, quant_type=qt)
        wq = np.asarray(dequantize_weight(q, out_dtype=jnp.float32, interpret=True))
        errs[qt] = np.abs(wq - w).mean()
    assert errs["nf4"] < errs["fp4"] * 1.2, errs


def test_nf4_fused_forward():
    """fuse_linears must thread the codebook through (regression: a fused
    lut QuantLinear with codebook=None raised at first forward)."""
    weights = T.random_weights(CFG, seed=22)
    params = quantize_params(CFG, weights, fuse=True)
    assert params.layers[0].wqkv is not None
    assert params.layers[0].wqkv.codebook is not None
    tokens = jnp.asarray([[3, 1, 4]], jnp.int32)
    plain = quantize_params(CFG, weights)
    want, _ = forward(plain, CFG, tokens, KVCache.zeros(CFG, 1, 3))
    got, _ = forward(params, CFG, tokens, KVCache.zeros(CFG, 1, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-2, rtol=5e-2)
