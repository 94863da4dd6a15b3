"""Transformer model tests: twin-model oracle + cache-consistency.

Mirrors the reference's sanity_check.py strategy (SURVEY.md §4): a quantized
model vs an unquantized twin with identical weights; plus what the reference
lacks — KV-cache consistency (prefill+decode == full forward) and greedy
generation determinism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_bnb_fp4_tpu.models import (
    KVCache,
    ModelConfig,
    forward,
    generate,
    quantize_params,
    random_weights,
    reference_forward,
)

# multi-second scan/compile tests: deselect with -m 'not slow' (<2min fast path)
pytestmark = pytest.mark.slow

CFG = ModelConfig.tiny_test()


@pytest.fixture(scope="module")
def setup():
    weights = random_weights(CFG, seed=3)
    params = quantize_params(CFG, weights)
    return weights, params


def test_quantized_vs_reference_logits(setup):
    """Twin-model oracle: quantized logits track bf16 logits closely."""
    weights, params = setup
    tokens = np.arange(12, dtype=np.int32).reshape(1, 12) % CFG.vocab_size
    ref = np.asarray(reference_forward(CFG, weights, jnp.asarray(tokens)))
    cache = KVCache.zeros(CFG, 1, 12)
    got, _ = forward(params, CFG, jnp.asarray(tokens), cache)
    got = np.asarray(got)
    assert got.shape == ref.shape
    # logits correlate strongly; absolute scale here is tiny (random weights),
    # so argmax agreement is NOT a sound oracle (near-tied noise logits) —
    # correlation and bounded relative error are.
    denom = np.abs(ref).mean() + 1e-6
    rel = np.abs(got - ref).mean() / denom
    assert rel < 0.5, rel
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9, corr


def test_qwen2_style_attn_bias(setup):
    """attn_bias=True (Qwen2 family): biased q/k/v flow through quantize,
    fusion (interleaved bias concat) and the forward, tracking the biased
    bf16 reference.  A zero-bias model must NOT match a biased reference
    (guards against biases being silently dropped)."""
    del setup
    cfg = ModelConfig.tiny_test(attn_bias=True)
    weights = random_weights(cfg, seed=11)
    # biases of random_weights are tiny (scale 0.02) next to activations —
    # amplify so dropping them would visibly break the comparison
    for k in list(weights):
        if k.endswith(".bias"):
            weights[k] = weights[k] * 50.0
    tokens = jnp.asarray(np.arange(8, dtype=np.int32).reshape(1, 8) % cfg.vocab_size)
    ref = np.asarray(reference_forward(cfg, weights, tokens))

    def close(params):
        got, _ = forward(params, cfg, tokens, KVCache.zeros(cfg, 1, 8))
        got = np.asarray(got)
        assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.9
        return got

    close(quantize_params(cfg, weights))
    close(quantize_params(cfg, weights, fuse=True))  # fused bias interleave
    dropped = {k: v for k, v in weights.items() if not k.endswith(".bias")}
    got0, _ = forward(quantize_params(cfg, dropped), cfg, tokens, KVCache.zeros(cfg, 1, 8))
    assert np.abs(np.asarray(got0) - ref).mean() > 5 * np.abs(close(quantize_params(cfg, weights)) - ref).mean()


def test_qwen3_style_qk_norm(setup):
    """qk_norm=True (Qwen3 family): per-head q/k RMSNorm applied before RoPE
    flows through quantize and QKV fusion, tracking the bf16 reference.  A
    model that skips the norm (same weights, qk_norm=False) must NOT match —
    guards against the norm being silently dropped (HF equivalence itself is
    pinned in tests/test_hf_oracle.py::test_dense_matches_hf[qwen3])."""
    del setup
    cfg = ModelConfig.tiny_test(qk_norm=True)
    weights = random_weights(cfg, seed=13)
    tokens = jnp.asarray(np.arange(8, dtype=np.int32).reshape(1, 8) % cfg.vocab_size)
    ref = np.asarray(reference_forward(cfg, weights, tokens))

    def run(params, c=cfg):
        got, _ = forward(params, c, tokens, KVCache.zeros(c, 1, 8))
        return np.asarray(got)

    for params in (quantize_params(cfg, weights),
                   quantize_params(cfg, weights, fuse=True)):
        got = run(params)
        assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.9
    # dropping the norm must visibly break the comparison — measured on the
    # DENSE path (FP4 noise at this tiny scale would drown the margin)
    import dataclasses

    from torch_bnb_fp4_tpu.models.transformer import dense_params

    cfg0 = dataclasses.replace(cfg, qk_norm=False)
    dense_err = np.abs(run(dense_params(cfg, weights)) - ref).mean()
    drop_err = np.abs(run(dense_params(cfg0, weights), cfg0) - ref).mean()
    assert drop_err > 5 * max(dense_err, 1e-4), (drop_err, dense_err)


def test_fp8_kv_cache_tracks_bf16(setup):
    """float8_e4m3fn KV storage (halved cache memory): logits stay close to
    the bf16-cache forward — the only difference is the per-element cast at
    cache write (~3 mantissa bits), so the outputs must correlate near-1."""
    _, params = setup
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 10)), jnp.int32)
    ref, _ = forward(params, CFG, tokens, KVCache.zeros(CFG, 2, 10))
    got, c8 = forward(params, CFG, tokens, KVCache.zeros(CFG, 2, 10, dtype=jnp.float8_e4m3fn))
    assert c8.k[0].dtype == jnp.float8_e4m3fn
    ref, got = np.asarray(ref), np.asarray(got)
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.98
    denom = np.abs(ref).mean() + 1e-6
    assert np.abs(got - ref).mean() / denom < 0.25


def test_prefill_then_decode_matches_full_forward(setup):
    """Cache consistency: step-by-step decode == one full forward pass."""
    _, params = setup
    b, l = 2, 6
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (b, l)), jnp.int32)

    full_cache = KVCache.zeros(CFG, b, l)
    full_logits, _ = forward(params, CFG, tokens, full_cache)

    cache = KVCache.zeros(CFG, b, l)
    step_logits = []
    for i in range(l):
        lg, cache = forward(params, CFG, tokens[:, i : i + 1], cache)
        step_logits.append(np.asarray(lg[:, 0]))
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits), rtol=0.05, atol=0.05)


def test_generate_greedy_deterministic(setup):
    _, params = setup
    prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    out1 = np.asarray(generate(params, CFG, prompt, max_new_tokens=5))
    out2 = np.asarray(generate(params, CFG, prompt, max_new_tokens=5))
    assert out1.shape == (1, 5)
    np.testing.assert_array_equal(out1, out2)
    assert (out1 >= 0).all() and (out1 < CFG.vocab_size).all()


def test_sliding_window_masks_old_tokens(setup):
    """With window=4, tokens older than 4 positions must not affect logits."""
    weights, _ = setup
    cfg_sw = ModelConfig.tiny_test(sliding_window=4)
    params_sw = quantize_params(cfg_sw, weights)
    rng = np.random.default_rng(1)
    l = 8
    t1 = rng.integers(0, cfg_sw.vocab_size, (1, l)).astype(np.int32)
    t2 = t1.copy()
    t2[0, 0] = (t2[0, 0] + 7) % cfg_sw.vocab_size  # differs only outside window
    c1 = KVCache.zeros(cfg_sw, 1, l)
    c2 = KVCache.zeros(cfg_sw, 1, l)
    l1, _ = forward(params_sw, cfg_sw, jnp.asarray(t1), c1)
    l2, _ = forward(params_sw, cfg_sw, jnp.asarray(t2), c2)
    # last position attends to positions 4..7 only (> 7-4=3): token 0 invisible
    np.testing.assert_allclose(
        np.asarray(l1[0, -1]), np.asarray(l2[0, -1]), rtol=1e-3, atol=1e-4
    )


def test_gqa_head_counts():
    assert CFG.n_heads % CFG.n_kv_heads == 0
    assert CFG.head_dim * CFG.n_heads == CFG.dim
