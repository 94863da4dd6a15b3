"""Pallas TPU flash attention (online softmax) for long-context prefill.

The decoder's default attention (models/transformer._attention_dense)
materializes a (B, Hk, G, Lq, Lk) f32 logits tensor per query chunk; at a
512-query chunk against a 16k-row cache that is >1 GB of HBM traffic per
layer, and jnp.where/softmax make several passes over it.  This kernel
computes the same masked softmax ONLINE (running max / running sum over
key blocks), so the working set is O(block_q x head_dim) per program —
the standard flash-attention recurrence, built here TPU-style with one
twist: the mask is derived from ARBITRARY per-slot key positions
(``kv_positions``), which is exactly what the rolling ring KV cache
produces (slot order is not position order after a wrap).  Stock flash
kernels assume monotone causal layouts; this one only assumes positions
are integers.

The reference has no attention at all (SURVEY.md §5 long-context row: the
library is linear-layers-only); this is north-star serving scope
("Mistral-7B-class serving") beyond it.

Numerics: q@k^T and p@v run on the MXU with f32 accumulation; the
probability tile is cast to bf16 for the second dot (the flash-standard
trade — ~1e-3 relative, inside the FP4 error envelope and far below the
dense path's f32-einsum cost on TPU).  Exactness vs the dense path is
pinned to 2e-2 in tests/test_attention.py over random masks, windows,
softcaps and ring layouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _flash_kernel(qpos_ref, kpos_ref, kval_ref, q_ref, k_ref, v_ref, o_ref,
                  m_ref, l_ref, acc_ref, *, nk, scale, window, softcap, out_dtype):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, D)
    k = k_ref[0]  # (bk, D)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk) f32
    if softcap is not None:  # Gemma-2: cap * tanh(s / cap), before masking
        s = softcap * jnp.tanh(s / softcap)
    qpos = qpos_ref[0][:, None]  # (bq, 1)
    kpos = kpos_ref[0][None, :]  # (1, bk)
    mask = (kpos <= qpos) & (kval_ref[0][None, :] != 0)
    if window is not None:
        mask = mask & (kpos > qpos - window)
    s = jnp.where(mask, s, _NEG)

    m_prev = m_ref[:]  # (bq, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    # masked lanes hold _NEG: exp(_NEG - m_new) underflows to 0 unless the
    # whole row is masked (m_new == _NEG) — zero those explicitly
    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)  # (bq, bk) f32
    alpha = jnp.exp(m_prev - m_new)  # (bq, 1)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, D)
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = m_new

    @pl.when(ik == nk - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sliding_window", "scale", "logit_softcap", "block_q",
                     "block_k", "interpret"),
)
def flash_attention(
    q: jax.Array,  # (B, Lq, Hq, D)
    k: jax.Array,  # (B, Lk, Hk, D)
    v: jax.Array,
    q_positions: jax.Array,  # (B, Lq) i32 absolute query positions
    kv_valid: jax.Array,  # (B, Lk) bool
    kv_positions: jax.Array,  # (B, Lk) i32 absolute position per cache slot
    sliding_window: int | None = None,
    scale: float | None = None,
    logit_softcap: float | None = None,
    *,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """Causal GQA flash attention; drop-in for _attention_dense's contract.

    Grid (B*Hq, Lq/bq, Lk/bk) with the key axis innermost; each (batch,
    q-head) program streams the key blocks of its kv head (``Hq/Hk`` query
    heads share one kv head).  Lq/Lk are padded to block multiples —
    padded keys carry kv_valid=0 (p=0), padded query rows produce garbage
    rows that are sliced off."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, lq, hq, d = q.shape
    lk, hk = k.shape[1], k.shape[2]
    assert hq % hk == 0, (hq, hk)
    g = hq // hk
    if scale is None:
        scale = float(d) ** -0.5
    out_dtype = q.dtype

    block_q = min(block_q, max(8, lq))
    block_k = min(block_k, max(128, lk))
    lq_pad = block_q * pl.cdiv(lq, block_q)
    lk_pad = block_k * pl.cdiv(lk, block_k)
    if lq_pad != lq:
        q = jnp.pad(q, ((0, 0), (0, lq_pad - lq), (0, 0), (0, 0)))
        q_positions = jnp.pad(q_positions, ((0, 0), (0, lq_pad - lq)))
    if lk_pad != lk:
        k = jnp.pad(k, ((0, 0), (0, lk_pad - lk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lk_pad - lk), (0, 0), (0, 0)))
        kv_positions = jnp.pad(kv_positions, ((0, 0), (0, lk_pad - lk)))
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, lk_pad - lk)))  # False pad

    # head-major flattening: q (B*Hq, Lq, D); k/v (B*Hk, Lk, D)
    qf = q.transpose(0, 2, 1, 3).reshape(b * hq, lq_pad, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * hk, lk_pad, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * hk, lk_pad, d)
    kval = kv_valid.astype(jnp.int32)

    nq = lq_pad // block_q
    nk = lk_pad // block_k
    grid = (b * hq, nq, nk)

    def kv_row(bh):
        return (bh // hq) * hk + (bh % hq) // g

    kern = functools.partial(
        _flash_kernel, nk=nk, scale=scale, window=sliding_window,
        softcap=logit_softcap, out_dtype=out_dtype,
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q), lambda bh, iq, ik: (bh // hq, iq)),
            pl.BlockSpec((1, block_k), lambda bh, iq, ik: (bh // hq, ik)),
            pl.BlockSpec((1, block_k), lambda bh, iq, ik: (bh // hq, ik)),
            pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, iq, ik: (kv_row(bh), ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, iq, ik: (kv_row(bh), ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * hq, lq_pad, d), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),  # running max
            pltpu.VMEM((block_q, 1), jnp.float32),  # running sum
            pltpu.VMEM((block_q, d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(q_positions, kv_positions, kval, qf, kf, vf)
    out = out.reshape(b, hq, lq_pad, d).transpose(0, 2, 1, 3)
    return out[:, :lq]
