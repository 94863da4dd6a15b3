"""Pallas flash attention vs the dense reference (interpret mode).

The kernel must reproduce models/transformer._attention_dense over every
masking feature it composes: causality, per-slot validity, sliding windows,
Gemma-2 logit softcaps, custom scales, GQA grouping — and RING-cache key
layouts, where slot order is not position order (the property stock flash
kernels don't handle).  Tolerance 2e-2: the kernel casts the probability
tile to bf16 for the p@v MXU dot (flash-standard trade).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_bnb_fp4_tpu.models.transformer import _attention_dense
from torch_bnb_fp4_tpu.ops.attention import flash_attention


def _mk(rng, b, lq, lk, hq, hk, d=128):
    q = jnp.asarray(rng.standard_normal((b, lq, hq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, lk, hk, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, lk, hk, d)), jnp.bfloat16)
    return q, k, v


def _check(q, k, v, qpos, valid, kpos, window=None, scale=None, softcap=None,
           block_q=8, block_k=128):
    want = _attention_dense(q, k, v, qpos, valid, kpos, window, scale, softcap)
    got = flash_attention(q, k, v, qpos, valid, kpos, window, scale, softcap,
                          block_q=block_q, block_k=block_k, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


def test_flash_causal_prefill():
    rng = np.random.default_rng(0)
    b, lq, lk = 2, 16, 16
    q, k, v = _mk(rng, b, lq, lk, hq=4, hk=2)
    qpos = jnp.broadcast_to(jnp.arange(lq, dtype=jnp.int32), (b, lq))
    kpos = jnp.broadcast_to(jnp.arange(lk, dtype=jnp.int32), (b, lk))
    _check(q, k, v, qpos, jnp.ones((b, lk), bool), kpos)


def test_flash_decode_against_long_cache():
    """Chunk of queries at the end of a longer, partially-valid cache."""
    rng = np.random.default_rng(1)
    b, lq, lk = 1, 8, 384
    q, k, v = _mk(rng, b, lq, lk, hq=8, hk=4)
    # 300 valid positions; queries sit at positions 292..299
    valid = (jnp.arange(lk) < 300)[None, :]
    kpos = jnp.broadcast_to(jnp.arange(lk, dtype=jnp.int32), (b, lk))
    qpos = (292 + jnp.arange(lq, dtype=jnp.int32))[None, :]
    _check(q, k, v, qpos, valid, kpos)


def test_flash_sliding_window_and_softcap():
    rng = np.random.default_rng(2)
    b, lq, lk = 1, 24, 128
    q, k, v = _mk(rng, b, lq, lk, hq=2, hk=2)
    kpos = jnp.broadcast_to(jnp.arange(lk, dtype=jnp.int32), (b, lk))
    qpos = (lk - lq + jnp.arange(lq, dtype=jnp.int32))[None, :]
    valid = jnp.ones((b, lk), bool)
    _check(q, k, v, qpos, valid, kpos, window=40)
    _check(q, k, v, qpos, valid, kpos, softcap=30.0, scale=1.0 / 12.0)


def test_flash_ring_layout():
    """Key slots in RING order: positions are a rotation, not sorted."""
    rng = np.random.default_rng(3)
    b, lq, rows = 1, 8, 256
    total = 391  # ring wrapped: slot s holds the latest p < total, p%rows == s
    q, k, v = _mk(rng, b, lq, rows, hq=4, hk=4)
    last = total - 1
    s = jnp.arange(rows, dtype=jnp.int32)
    kpos = (last - jnp.mod(last - s, rows))[None, :]
    valid = kpos >= 0
    qpos = (total - lq + jnp.arange(lq, dtype=jnp.int32))[None, :]
    _check(q, k, v, qpos, valid, kpos, window=128)


def test_flash_unaligned_lengths_pad():
    """Lq/Lk not block multiples: the wrapper pads and slices, padded keys
    are invalid, padded query rows are dropped."""
    rng = np.random.default_rng(4)
    b, lq, lk = 1, 13, 200
    q, k, v = _mk(rng, b, lq, lk, hq=2, hk=1)
    valid = (jnp.arange(lk) < 180)[None, :]
    kpos = jnp.broadcast_to(jnp.arange(lk, dtype=jnp.int32), (b, lk))
    qpos = (167 + jnp.arange(lq, dtype=jnp.int32))[None, :]
    _check(q, k, v, qpos, valid, kpos, block_q=8, block_k=128)


def test_flash_rows_with_no_visible_keys_are_finite():
    """A query whose mask admits nothing must produce finite output (the
    engine masks such rows downstream; NaN would poison the whole tile)."""
    rng = np.random.default_rng(5)
    b, lq, lk = 1, 8, 128
    q, k, v = _mk(rng, b, lq, lk, hq=1, hk=1)
    kpos = jnp.broadcast_to(jnp.arange(lk, dtype=jnp.int32), (b, lk))
    qpos = jnp.full((b, lq), -5, jnp.int32)  # before every key: all masked
    got = flash_attention(q, k, v, qpos, jnp.ones((b, lk), bool), kpos,
                          block_q=8, block_k=128, interpret=True)
    assert np.isfinite(np.asarray(got, np.float32)).all()
