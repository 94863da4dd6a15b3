"""Long-prompt prefill: query-chunked attention must equal the dense path
exactly, and a prompt much longer than the chunk must round-trip through
prefill+decode consistently."""

import jax.numpy as jnp
import numpy as np
import pytest

from torch_bnb_fp4_tpu.models import KVCache, ModelConfig, forward, quantize_params
from torch_bnb_fp4_tpu.models import transformer as T

# multi-second scan/compile tests: deselect with -m 'not slow' (<2min fast path)
pytestmark = pytest.mark.slow


def test_chunked_attention_matches_dense(rng):
    b, lq, lk, hq, hk, d = 2, 1100, 1100, 4, 2, 32
    q = jnp.asarray(rng.standard_normal((b, lq, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, lk, hk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, lk, hk, d)), jnp.float32)
    qpos = jnp.broadcast_to(jnp.arange(lq, dtype=jnp.int32), (b, lq))
    kvpos = jnp.broadcast_to(jnp.arange(lk, dtype=jnp.int32), (b, lk))
    kvv = jnp.ones((b, lk), bool)
    chunked = T._attention(q, k, v, qpos, kvv, kvpos, None)  # lq > chunk
    dense = T._attention_dense(q, k, v, qpos, kvv, kvpos, None)
    # same math per query row; XLA reorders f32 reductions across the
    # different block shapes -> last-ulp differences only
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense), rtol=2e-6, atol=2e-6)


def test_long_prompt_prefill_decode_consistency(rng):
    cfg = ModelConfig.tiny_test(n_layers=1)
    params = quantize_params(cfg, T.random_weights(cfg, seed=4))
    lp = 600
    assert lp > T._ATTN_QUERY_CHUNK  # exercises the chunked path
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, lp)), jnp.int32)
    cache = KVCache.zeros(cfg, 1, lp + 2)
    logits, cache = forward(params, cfg, tokens, cache)
    # one decode step after the long prefill
    nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    lg2, cache = forward(params, cfg, nxt, cache)
    assert lg2.shape == (1, 1, cfg.vocab_size)
    assert int(cache.length[0]) == lp + 1
    assert np.isfinite(np.asarray(lg2)).all()
