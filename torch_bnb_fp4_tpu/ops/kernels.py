"""Pallas TPU kernels: blockwise-FP4 dequantize and fused dequant-matmul.

TPU-native replacements for the reference CUDA kernels
(csrc/dequant_fp4_optimized.cu:89-255 and csrc/gemv_fp4_optimized.cu:60-275).
The design departs from the reference deliberately (SURVEY.md §7):

  * Weights live in the "split-K" TPU layout produced by
    :func:`torch_bnb_fp4_tpu.ops.format.pack_tpu`: ``packed`` uint8 of shape
    (K//2, N) where byte (i, n) holds code(Wt[i, n]) in the high nibble and
    code(Wt[i + K//2, n]) in the low nibble; ``absmax`` f32 (K//64, N) with
    quantization blocks running along K.  Unpacking is two shift/mask ops and
    the two decoded half-K panels are contracted directly — no interleave, no
    dequantized weight ever materialized in HBM (unlike the reference's
    qlinear path, torch_fp4.cpp:64-103, which dequantizes to a temp tensor).
  * FP4 decode is *arithmetic*, not a shared-memory LUT
    (gemv_fp4_optimized.cu:92-95): every FP4 magnitude is 2^j or 4/3 * 2^j,
    so the f32 bit pattern is assembled from the nibble with ~15 integer VPU
    ops — bit-exact against the codebook, with no gather.
  * Matmul rides the MXU with f32 accumulation; for batch-1 GEMV the MXU is
    idle-cheap and the kernel is decode/bandwidth-bound, which is exactly
    where FP4's 4x byte advantage pays.

Kernels run in interpret mode on CPU for testing (BASELINE.json config 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import format as fmt

# f32 bit-pattern constants for the arithmetic FP4 decode.
_MANT_43 = 0x2AAAAB  # mantissa field of f32(4/3) = 0x3FAAAAAB
_C1_BITS = (119 << 23) | _MANT_43  # f32(1/192) = 4/3 * 2^-8


def _decode_fp4_f32(codes: jax.Array) -> jax.Array:
    """Decode FP4 nibble codes (int32, values 0..15) to exact f32 code values.

    Bit-exact with ``fmt.FP4_CODE[codes]``: each magnitude is 2^(1-e) (odd
    magnitude index) or 4/3 * 2^-e (even), so we build the f32 bit pattern
    directly.  Replaces the reference's branch tree / shared-memory LUT
    (dequant_fp4_optimized.cu:55-76, gemv_fp4_optimized.cu:125-129).
    """
    m = codes & 7
    b = codes & 1
    e = m >> 1
    # main path (m >= 2): exponent field 127 + b - e, mantissa 0 or mant(4/3)
    bits = ((127 + b) - e) << 23 | (_MANT_43 & (b - 1))
    # m < 2: code 0 -> +0.0, code 1 -> 1/192
    bits = jnp.where(m < 2, b * _C1_BITS, bits)
    # sign: nibble bit 3 -> f32 bit 31
    bits = bits | ((codes & 8) << 28)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _decode_lut_f32(codes: jax.Array, code_ref) -> jax.Array:
    """Generic 16-entry codebook decode via a 4-level select tree.

    ``code_ref`` is a (16,) f32 SMEM ref (or array).  Supports NF4 and any
    other codebook; the reference hardcodes FP4 and ignores its runtime
    codebook argument (SURVEY.md §2.4) — we honor it.
    """
    leaves = [code_ref[i] for i in range(16)]
    for level in range(4):
        bit = (codes & (1 << level)) != 0
        leaves = [jnp.where(bit, leaves[2 * i + 1], leaves[2 * i]) for i in range(len(leaves) // 2)]
    return leaves[0]


def _expand_scale(scale_tile: jax.Array, blocksize: int) -> jax.Array:
    """(BK // blocksize, BN) f32 -> (BK, BN) by repeating each row."""
    return jnp.repeat(scale_tile, blocksize, axis=0)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# K must be a multiple of this (the layer API zero-pads): guarantees kp = K/2
# is a multiple of 512, so absmax tiles (block_kp/64, n) have >= 8 sublanes —
# a Mosaic block-shape requirement (last two block dims divisible by (8, 128)).
K_QUANTUM = 1024


def _choose_block(dim: int, requested: int, quantum: int) -> int:
    """Largest multiple of ``quantum`` that is <= requested and divides dim."""
    assert dim % quantum == 0, (dim, quantum)
    best = quantum
    for s in range(min(requested, dim) // quantum, 0, -1):
        if (dim // quantum) % s == 0:
            best = s * quantum
            break
    return best


def _decode_tile(packed_u8, scale_hi, scale_lo, blocksize, codebook, code_ref=None):
    """uint8 packed tile (BKP, BN) -> two f32 weight tiles (BKP, BN) each.

    Returns (w_hi, w_lo): dequantized Wt rows [k0, k0+BKP) and
    [K//2 + k0, K//2 + k0 + BKP).
    """
    word = packed_u8.astype(jnp.int32)
    hi = word >> 4
    lo = word & 0xF
    if codebook == "fp4":
        v_hi = _decode_fp4_f32(hi)
        v_lo = _decode_fp4_f32(lo)
    else:
        v_hi = _decode_lut_f32(hi, code_ref)
        v_lo = _decode_lut_f32(lo, code_ref)
    w_hi = v_hi * _expand_scale(scale_hi, blocksize)
    w_lo = v_lo * _expand_scale(scale_lo, blocksize)
    return w_hi, w_lo


# ---------------------------------------------------------------------------
# Standalone dequantize (reference: dequantize_blockwise_*_fp4, csrc/dequant_
# fp4_optimized.cu:89-255).  Output is Wt (K, N) in the requested dtype.
# ---------------------------------------------------------------------------


def _dequant_kernel(packed_ref, shi_ref, slo_ref, ohi_ref, olo_ref, *, blocksize, codebook, out_dtype):
    w_hi, w_lo = _decode_tile(packed_ref[:], shi_ref[:], slo_ref[:], blocksize, codebook)
    ohi_ref[:] = w_hi.astype(out_dtype)
    olo_ref[:] = w_lo.astype(out_dtype)


def _dequant_kernel_lut(code_ref, packed_ref, shi_ref, slo_ref, ohi_ref, olo_ref, *, blocksize, out_dtype):
    w_hi, w_lo = _decode_tile(packed_ref[:], shi_ref[:], slo_ref[:], blocksize, "lut", code_ref)
    ohi_ref[:] = w_hi.astype(out_dtype)
    olo_ref[:] = w_lo.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("blocksize", "out_dtype", "block_kp", "block_n", "interpret"),
)
def dequantize_tpu(
    packed: jax.Array,
    absmax: jax.Array,
    codebook: jax.Array | None = None,
    *,
    blocksize: int = 64,
    out_dtype=jnp.bfloat16,
    block_kp: int = 256,
    block_n: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """Dequantize split-K packed weights -> Wt (K, N) in ``out_dtype``.

    ``packed`` uint8 (K//2, N); ``absmax`` f32 (K//blocksize, N).
    ``codebook`` None selects the exact arithmetic FP4 decode; otherwise a
    (16,) f32 table (e.g. NF4) decoded via select tree.
    """
    if interpret is None:
        interpret = _interpret_default()
    kp, n = packed.shape
    k = 2 * kp
    assert k % K_QUANTUM == 0, f"K={k} must be a multiple of {K_QUANTUM} (pad at pack time)"
    assert absmax.shape == (k // blocksize, n), (absmax.shape, k, n)
    block_kp = _choose_block(kp, block_kp, 512)
    block_n = _choose_block(n, block_n, 128)
    assert block_kp % blocksize == 0
    sblk = block_kp // blocksize
    grid = (kp // block_kp, n // block_n)

    packed_spec = pl.BlockSpec((block_kp, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    shi_spec = pl.BlockSpec((sblk, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    slo_spec = pl.BlockSpec(
        (sblk, block_n), lambda i, j: (kp // block_kp + i, j), memory_space=pltpu.VMEM
    )
    out_specs = [
        pl.BlockSpec((block_kp, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_kp, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((kp, n), out_dtype),
        jax.ShapeDtypeStruct((kp, n), out_dtype),
    ]

    if codebook is None:
        kern = functools.partial(
            _dequant_kernel, blocksize=blocksize, codebook="fp4", out_dtype=out_dtype
        )
        in_specs = [packed_spec, shi_spec, slo_spec]
        args = (packed, absmax, absmax)
    else:
        kern = functools.partial(_dequant_kernel_lut, blocksize=blocksize, out_dtype=out_dtype)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            packed_spec,
            shi_spec,
            slo_spec,
        ]
        args = (codebook.astype(jnp.float32), packed, absmax, absmax)

    hi, lo = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    # hi holds Wt rows [0, K//2), lo holds rows [K//2, K)
    return jnp.concatenate([hi, lo], axis=0)


# ---------------------------------------------------------------------------
# Fused dequant-matmul (replaces the reference's qlinear dequant-to-temp path,
# torch_fp4.cpp:64-103, and the GEMV kernel gemv_fp4_optimized.cu:60-275).
# Computes y = x @ Wt (+ bias), x (M, K), Wt (K, N) decoded on the fly.
# ---------------------------------------------------------------------------


def _matmul_kernel(
    xhi_ref,
    xlo_ref,
    packed_ref,
    shi_ref,
    slo_ref,
    bias_ref,
    out_ref,
    acc_ref,
    *,
    blocksize,
    codebook,
    out_dtype,
    compute_dtype,
    has_bias,
    nk,
    code_ref=None,
):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w_hi, w_lo = _decode_tile(
        packed_ref[:], shi_ref[:], slo_ref[:], blocksize, codebook, code_ref
    )
    w_hi = w_hi.astype(compute_dtype)
    w_lo = w_lo.astype(compute_dtype)
    # f32 activations get true-f32 matmul (reference parity: fp32 cuBLAS);
    # bf16 rides the native MXU path.
    prec = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
    acc_ref[:] += jnp.dot(
        xhi_ref[:], w_hi, preferred_element_type=jnp.float32, precision=prec
    ) + jnp.dot(xlo_ref[:], w_lo, preferred_element_type=jnp.float32, precision=prec)

    @pl.when(k_idx == nk - 1)
    def _():
        acc = acc_ref[:]
        if has_bias:
            acc = acc + bias_ref[:].astype(jnp.float32)
        out_ref[:] = acc.astype(out_dtype)


def _matmul_kernel_lut(code_ref, *refs, **kw):
    _matmul_kernel(*refs, code_ref=code_ref, **kw)


@functools.partial(
    jax.jit,
    static_argnames=(
        "blocksize",
        "out_dtype",
        "block_m",
        "block_kp",
        "block_n",
        "interpret",
    ),
)
def matmul_fp4(
    x: jax.Array,
    packed: jax.Array,
    absmax: jax.Array,
    bias: jax.Array | None = None,
    codebook: jax.Array | None = None,
    *,
    blocksize: int = 64,
    out_dtype=None,
    block_m: int = 256,
    block_kp: int = 256,
    block_n: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused dequant-matmul: y[M, N] = x[M, K] @ dequant(packed)[K, N] + bias.

    The packed weight never materializes in HBM.  ``x`` may be f32 or bf16
    (f16 inputs are computed in f32 — TPUs have no native f16 MXU path).
    Accumulation is always f32 (reference accumulates f32 too:
    gemv_fp4_optimized.cu:144, cuBLAS default).
    """
    if interpret is None:
        interpret = _interpret_default()
    kp, n = packed.shape
    k = 2 * kp
    m = x.shape[0]
    assert x.shape == (m, k), (x.shape, k)
    assert absmax.shape == (k // blocksize, n)

    if out_dtype is None:
        out_dtype = x.dtype
    compute_dtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    x = x.astype(compute_dtype)

    # shrink blocks to problem size; pad M up to a sublane-aligned block
    assert k % K_QUANTUM == 0, f"K={k} must be a multiple of {K_QUANTUM} (pad at pack time)"
    block_n = _choose_block(n, block_n, 128)
    block_kp = _choose_block(kp, block_kp, 512)
    min_m = 8 if compute_dtype == jnp.float32 else 16
    block_m = min(block_m, min_m * pl.cdiv(m, min_m))
    mp = block_m * pl.cdiv(m, block_m)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    assert block_kp % blocksize == 0
    sblk = block_kp // blocksize
    nk = kp // block_kp
    grid = (mp // block_m, n // block_n, nk)

    has_bias = bias is not None
    if not has_bias:
        bias = jnp.zeros((1, n), dtype=jnp.float32)
    else:
        bias = bias.reshape(1, n)

    in_specs = [
        # x hi half: columns [k0, k0 + block_kp)
        pl.BlockSpec((block_m, block_kp), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        # x lo half: columns [K//2 + k0, ...)
        pl.BlockSpec(
            (block_m, block_kp), lambda i, j, kk: (i, nk + kk), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((block_kp, block_n), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((sblk, block_n), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((sblk, block_n), lambda i, j, kk: (nk + kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM)

    kw = dict(
        blocksize=blocksize,
        out_dtype=out_dtype,
        compute_dtype=compute_dtype,
        has_bias=has_bias,
        nk=nk,
    )
    flops = 2 * mp * k * n
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=mp * k * x.dtype.itemsize + kp * n + (k // blocksize) * n * 4,
        transcendentals=0,
    )
    if codebook is None:
        kern = functools.partial(_matmul_kernel, codebook="fp4", **kw)
        args = (x, x, packed, absmax, absmax, bias)
    else:
        kern = functools.partial(_matmul_kernel_lut, codebook="lut", **kw)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = (codebook.astype(jnp.float32), x, x, packed, absmax, absmax, bias)

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
    return out[:m]


def gemv_fp4(
    x: jax.Array,
    packed: jax.Array,
    absmax: jax.Array,
    bias: jax.Array | None = None,
    codebook: jax.Array | None = None,
    *,
    blocksize: int = 64,
    out_dtype=None,
    block_kp: int = 512,
    block_n: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """Batch-1 decode fast path: x (1, K) -> (1, N).

    Counterpart of the reference GEMV (gemv_fp4_optimized.cu:60-157).  Rides
    the fused matmul kernel with the M dimension padded to the sublane
    minimum: at M=1 the kernel is decode/HBM-bound, so the MXU's wasted rows
    are free, and a single kernel keeps decode code paths identical between
    prefill and decode.  Larger K/N blocks than prefill: streams packed bytes
    at full HBM bandwidth.
    """
    assert x.shape[0] == 1, "gemv_fp4 is the batch-1 fast path"
    return matmul_fp4(
        x,
        packed,
        absmax,
        bias,
        codebook,
        blocksize=blocksize,
        out_dtype=out_dtype,
        block_m=8,
        block_kp=block_kp,
        block_n=block_n,
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# bnb flat-layout dequantize (API parity with reference dequantize_fp4,
# torch_bnb_fp4/__init__.py:88-123).  Pure jnp — used by tooling and tests,
# not on the serving hot path (which uses the tiled layout).
# ---------------------------------------------------------------------------


def dequantize_fp4_flat(packed: jax.Array, absmax: jax.Array, shape, blocksize: int = 64, out_dtype=jnp.bfloat16, codebook: jax.Array | None = None) -> jax.Array:
    """Dequantize bnb's flat packing (high nibble first) to ``shape``."""
    code = jnp.asarray(fmt.FP4_CODE if codebook is None else codebook, dtype=jnp.float32)
    p = packed.reshape(-1).astype(jnp.int32)
    codes = jnp.stack([p >> 4, p & 0xF], axis=1).reshape(-1)
    vals = code[codes].reshape(-1, blocksize) * absmax.reshape(-1, 1).astype(jnp.float32)
    return vals.reshape(shape).astype(out_dtype)
