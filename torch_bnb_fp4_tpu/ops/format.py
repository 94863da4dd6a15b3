"""FP4 blockwise format: the executable spec (pure numpy golden model).

This module is the single source of truth for the bitsandbytes-style blockwise
FP4 format that the whole framework implements.  Every Pallas kernel is tested
for exact agreement with the functions here.

Format (reference: torch-bnb-fp4):
  * 16-entry FP4 codebook, index bit 3 = sign, bits 0-2 = magnitude
    (reference csrc/dequant_fp4_optimized.cu:28-46, gemv_fp4_optimized.cu:32-50).
  * Weights are stored as uint8, two 4-bit codes per byte, HIGH nibble first
    (reference csrc/dequant_fp4_optimized.cu:117-118, torch_bnb_fp4/__init__.py:191-192).
  * One fp32 ``absmax`` scale per ``blocksize`` consecutive weights in flat
    (row-major) order (reference torch_bnb_fp4/__init__.py:193-196;
    csrc/dequant_fp4_optimized.cu:110).  Default blocksize 64 (bnb default).
  * value = codebook[nibble] * absmax[block].

Beyond the flat bnb layout, this module also defines the TPU-tiled layout used
by the Pallas kernels ("split-K packing", see :func:`pack_tpu`): the weight
matrix is stored transposed, W^T of shape (K, N), and byte (i, n) holds
code(W^T[i, n]) in the high nibble and code(W^T[i + K//2, n]) in the low
nibble.  Unpacking is then a concatenation along the K (sublane) axis instead
of an element interleave — the layout TPU vector units want.  absmax is stored
as (K // blocksize, N): scale blocks run along K per output column, so the
contraction dimension of every matmul tile sees a contiguous scale broadcast.
"""

from __future__ import annotations

import ml_dtypes
import numpy as np

# bf16 as a numpy dtype (ml_dtypes ships with jax); used for compact scales
_BF16 = np.dtype(ml_dtypes.bfloat16)

# The 16-entry FP4 codebook (reference csrc/dequant_fp4_optimized.cu:28-46).
# Index bit 3 is the sign; entries 8..15 are the negation of entries 0..7.
FP4_CODE = np.array(
    [
        0.0,
        0.005208333333333333,  # 1/192
        0.6666666666666666,  # 2/3
        1.0,
        0.3333333333333333,  # 1/3
        0.5,
        0.16666666666666666,  # 1/6
        0.25,
        -0.0,
        -0.005208333333333333,
        -0.6666666666666666,
        -1.0,
        -0.3333333333333333,
        -0.5,
        -0.16666666666666666,
        -0.25,
    ],
    dtype=np.float32,
)

# bitsandbytes NF4 codebook (normal-float 4-bit), supported "for free" because
# every kernel takes the codebook as data (the reference hardcodes FP4 and
# ignores its runtime codebook argument — SURVEY.md §2.4).
NF4_CODE = np.array(
    [
        -1.0,
        -0.6961928009986877,
        -0.5250730514526367,
        -0.39491748809814453,
        -0.28444138169288635,
        -0.18477343022823334,
        -0.09105003625154495,
        0.0,
        0.07958029955625534,
        0.16093020141124725,
        0.24611230194568634,
        0.33791524171829224,
        0.44070982933044434,
        0.5626170039176941,
        0.7229568362236023,
        1.0,
    ],
    dtype=np.float32,
)

DEFAULT_BLOCKSIZE = 64


def quantize_codes(w: np.ndarray, blocksize: int = DEFAULT_BLOCKSIZE, code: np.ndarray = FP4_CODE, absmax: np.ndarray | None = None):
    """Quantize a float array to 4-bit codebook indices + per-block absmax.

    Blocks run over the *flat row-major order* of ``w`` (bnb semantics).
    ``absmax`` overrides the per-block scale (used to re-quantize against a
    rounded/stored scale so codes stay nearest-neighbor w.r.t. what decode
    will actually multiply by).

    Returns (codes uint8 in [0,16) flat, absmax float32 of shape (nblocks,)).
    """
    flat = np.asarray(w, dtype=np.float32).reshape(-1)
    n = flat.size
    if n % blocksize != 0:
        raise ValueError(f"numel {n} not divisible by blocksize {blocksize}")
    blocks = flat.reshape(-1, blocksize)
    if absmax is None:
        absmax = np.abs(blocks).max(axis=1).astype(np.float32)
    # Normalize each block to [-1, 1]; nearest codebook entry.
    safe = np.where(absmax == 0.0, 1.0, absmax)
    normed = blocks / safe[:, None]
    # nearest-entry via 15 midpoint comparisons (vectorized; no (n, 16) temp
    # and ~10x faster than np.searchsorted at checkpoint scale).  Tie at an
    # exact midpoint picks the smaller value; ties are measure-zero for real
    # weights.
    order = np.argsort(code, kind="stable").astype(np.uint8)
    sorted_code = code[order]
    mids = (sorted_code[1:] + sorted_code[:-1]) / 2
    flat_normed = normed.reshape(-1)
    idx = np.zeros(flat_normed.shape, np.uint8)
    for m in mids:
        idx += flat_normed > m
    codes = order[idx]
    return codes.reshape(-1), absmax


def dequantize_codes(codes: np.ndarray, absmax: np.ndarray, blocksize: int = DEFAULT_BLOCKSIZE, code: np.ndarray = FP4_CODE) -> np.ndarray:
    """Inverse of :func:`quantize_codes` (flat float32 output)."""
    vals = code[codes.astype(np.int64)].reshape(-1, blocksize)
    return (vals * absmax[:, None].astype(np.float32)).reshape(-1)


def pack_flat(codes: np.ndarray) -> np.ndarray:
    """Pack 4-bit codes two-per-byte, high nibble first (bnb layout).

    Matches reference csrc/dequant_fp4_optimized.cu:117-118.
    """
    codes = codes.reshape(-1)
    if codes.size % 2 != 0:
        raise ValueError("need an even number of codes to pack")
    hi = codes[0::2].astype(np.uint8)
    lo = codes[1::2].astype(np.uint8)
    return ((hi << 4) | (lo & 0xF)).astype(np.uint8)


def unpack_flat(packed: np.ndarray) -> np.ndarray:
    """Inverse of :func:`pack_flat`: uint8 bytes -> 4-bit codes, high first."""
    packed = packed.reshape(-1)
    out = np.empty(packed.size * 2, dtype=np.uint8)
    out[0::2] = packed >> 4
    out[1::2] = packed & 0xF
    return out


# ---------------------------------------------------------------------------
# bnb-compatible whole-tensor API (the reference's QuantState equivalent)
# ---------------------------------------------------------------------------

def quantize_fp4(w: np.ndarray, blocksize: int = DEFAULT_BLOCKSIZE, code: np.ndarray = FP4_CODE):
    """bnb-style quantize: row-major flat blocks, packed high-nibble-first.

    Returns (packed uint8 (numel//2,), absmax float32 (numel//blocksize,)).
    Equivalent of bnb ``quantize_fp4`` consumed at reference
    torch_bnb_fp4/__init__.py:775.
    """
    codes, absmax = quantize_codes(w, blocksize, code)
    return pack_flat(codes), absmax


def dequantize_fp4(packed: np.ndarray, absmax: np.ndarray, shape, blocksize: int = DEFAULT_BLOCKSIZE, code: np.ndarray = FP4_CODE) -> np.ndarray:
    """Golden dequantize: reference csrc/dequant_fp4_optimized.cu:89-123."""
    codes = unpack_flat(packed)
    return dequantize_codes(codes, absmax, blocksize, code).reshape(shape)


# ---------------------------------------------------------------------------
# TPU-tiled layout ("split-K packing")
# ---------------------------------------------------------------------------

def pack_tpu(w: np.ndarray, blocksize: int = DEFAULT_BLOCKSIZE, code: np.ndarray = FP4_CODE):
    """Quantize + pack a weight matrix into the TPU kernel layout.

    ``w`` has shape (N_out, K_in), torch ``nn.Linear`` convention (y = x W^T).
    Output layout (co-designed with the Pallas kernels — SURVEY.md §7):

      * ``packed``: uint8 (K // 2, N).  Byte (i, n) = code(Wt[i, n]) << 4
        | code(Wt[i + K//2, n]) where Wt = W^T (K, N).  Unpack = two shifts +
        a concat along K; no interleave.
      * ``absmax``: float32 (K // blocksize, N).  Scale blocks run along K —
        i.e. quantization blocks are columns of W^T (length ``blocksize``
        sub-columns), NOT bnb's row-major flat blocks.  Same error properties
        (each weight still shares a scale with ``blocksize - 1`` neighbours,
        and those neighbours are along the *input* dim, exactly like bnb since
        bnb's flat order over (N, K) also runs along K).

    Returns (packed, absmax).
    """
    w = np.asarray(w, dtype=np.float32)
    if w.ndim != 2:
        raise ValueError("pack_tpu expects a 2-D weight (N_out, K_in)")
    n_out, k_in = w.shape
    if k_in % (2 * blocksize) != 0 and k_in % blocksize != 0:
        raise ValueError(f"K={k_in} must be divisible by blocksize {blocksize}")
    if k_in % 2 != 0:
        raise ValueError("K must be even to pack two codes per byte")
    # bnb quantizes flat row-major over (N, K): blocks run along K within each
    # row.  Quantize per-row so our absmax grid is identical to bnb's, then
    # transpose into the (K, N) kernel layout.
    codes, absmax = quantize_codes(w, blocksize, code)  # flat over (N, K)
    codes_t = codes.reshape(n_out, k_in).T  # (K, N)
    absmax_t = absmax.reshape(n_out, k_in // blocksize).T  # (K//bs, N)
    half = k_in // 2
    hi = codes_t[:half].astype(np.uint8)
    lo = codes_t[half:].astype(np.uint8)
    packed = ((hi << 4) | (lo & 0xF)).astype(np.uint8)
    return np.ascontiguousarray(packed), np.ascontiguousarray(absmax_t.astype(np.float32))


def unpack_tpu(packed: np.ndarray, absmax: np.ndarray, blocksize: int = DEFAULT_BLOCKSIZE, code: np.ndarray = FP4_CODE) -> np.ndarray:
    """Golden dequantize of the TPU layout -> W^T as float32 (K, N)."""
    half, n = packed.shape
    k = half * 2
    codes_t = np.empty((k, n), dtype=np.uint8)
    codes_t[:half] = packed >> 4
    codes_t[half:] = packed & 0xF
    vals = code[codes_t.astype(np.int64)]  # (K, N)
    scales = np.repeat(absmax.astype(np.float32), blocksize, axis=0)  # (K, N)
    return vals * scales


def pack_tpu_sharded(w: np.ndarray, blocksize: int = DEFAULT_BLOCKSIZE, code: np.ndarray = FP4_CODE, k_shards: int = 1):
    """Quantize + pack with the K axis pre-sliced into ``k_shards`` contiguous
    shards, each packed independently in the split-K layout.

    This is the layout that makes **row-parallel tensor sharding** of packed
    weights a plain contiguous ``NamedSharding``: device ``d`` of ``D`` takes
    rows ``[d*K/(2D), (d+1)*K/(2D))`` of ``packed`` and rows
    ``[d*K/(2D*bs), ...)`` of each absmax half, and what it holds is a valid
    self-contained split-K packing of Wt rows ``[d*K/D, (d+1)*K/D)`` — i.e.
    exactly the features its shard of the preceding (column-parallel) layer
    produces.  The absmax grid (hence quantization error) is identical to the
    unsharded pack because blocks run along K and ``K/D % blocksize == 0``.

    Returns (packed (K//2, N) uint8, absmax_hi (K//(2*bs), N) f32,
    absmax_lo (same)).  ``k_shards=1`` is the plain layout of
    :func:`pack_tpu` with absmax split into its hi/lo halves.
    """
    w = np.asarray(w, dtype=np.float32)
    n_out, k_in = w.shape
    if k_in % (k_shards * 2 * blocksize) != 0:
        raise ValueError(f"K={k_in} must be divisible by k_shards*2*blocksize={k_shards * 2 * blocksize}")
    k_loc = k_in // k_shards
    ps, his, los = [], [], []
    for d in range(k_shards):
        p, a = pack_tpu(w[:, d * k_loc : (d + 1) * k_loc], blocksize, code)
        half = a.shape[0] // 2
        ps.append(p)
        his.append(a[:half])
        los.append(a[half:])
    return (
        np.ascontiguousarray(np.concatenate(ps, axis=0)),
        np.ascontiguousarray(np.concatenate(his, axis=0)),
        np.ascontiguousarray(np.concatenate(los, axis=0)),
    )


def unpack_tpu_sharded(packed: np.ndarray, absmax_hi: np.ndarray, absmax_lo: np.ndarray, blocksize: int = DEFAULT_BLOCKSIZE, code: np.ndarray = FP4_CODE, k_shards: int = 1) -> np.ndarray:
    """Golden inverse of :func:`pack_tpu_sharded` -> Wt float32 (K, N)."""
    kp, n = packed.shape
    kp_loc = kp // k_shards
    s_loc = absmax_hi.shape[0] // k_shards
    parts = []
    for d in range(k_shards):
        a = np.concatenate(
            [absmax_hi[d * s_loc : (d + 1) * s_loc], absmax_lo[d * s_loc : (d + 1) * s_loc]], axis=0
        )
        parts.append(unpack_tpu(packed[d * kp_loc : (d + 1) * kp_loc], a, blocksize, code))
    return np.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# Pair-K layout ("pairk"): the serving hot-path layout for FP4.
# ---------------------------------------------------------------------------

# Rank remap: the six regular FP4 magnitudes sorted ascending are
# m = 6,7,4,5,2,3 — flip bit 2 of m iff bit 1 is set (involution; m<2 and the
# sign bit pass through).  With rank-remapped nibbles, the bf16 bit pattern of
# 192*|code| is the LINEAR RAMP 0x4180 + rank*0x40, which the Pallas kernel
# assembles with pure integer ops (ops/kernels.py:_decode_pairs).
_R = np.arange(16)
RANK_REMAP = ((_R & 8) | ((_R & 7) ^ ((_R & 2) << 1))).astype(np.uint8)
del _R

# 192 * FP4_CODE is exactly {0, +-1, +-32, +-48, +-64, +-96, +-128, +-192}:
# small integers, exact in bf16 — so the kernel can contract x with the
# INTEGER code values on the MXU and apply absmax/192 per block afterwards.
PAIRK_VALUE_SCALE = 192.0

# Pair-K decode VARIANTS: pack-time code remaps that delete decode ops.
#
# The in-kernel decode builds bf16 bits 0x4180 + rank*0x40 for ranks 2..7
# (magnitudes {32..192}/192 — exactly FP4's six regular magnitudes); the two
# smallest FP4 codes {0, 1/192} are ramp EXCEPTIONS costing ~9 of the 17
# integer ops per byte.  Remapping them at quantization time:
#
#   exact  [0, 1, 32..192]/192 : bit-exact bnb FP4 (required for bnb-imported
#           checkpoints whose codes are fixed), 16-op decode.
#   zramp  [0, 24, 32..192]/192: drops only the 1/192 code (its bin is better
#           covered by 24/192 = 0.125), 12-op decode.
#   ramp   [16, 24, 32..192]/192: pure affine-in-bits codebook — bf16 bits =
#           0x4180 + rank*0x40 | sign<<15, 7-op decode.  All-zero weight
#           BLOCKS still decode exactly to 0 (scale = absmax/192 = 0).
#
# Both remaps are MORE accurate than exact FP4 for Gaussian weights (mean
# |w - q(w)| 0.00170-0.00171 vs 0.00193 at blocksize 64, sigma 0.02): the
# 1/192 level is nearly useless (its Voronoi bin [0.003, 0.086] sits far
# from it), 0.125/0.0833 are better levels.  Measured on v5e (4096x14336
# GEMV vs 153.5us bf16 matvec): exact 93.5us (1.64x), zramp 73.7us (2.08x),
# ramp 50.7us (3.03x, near the ~44us HBM roofline).
PAIRK_MAGS192 = {
    "exact": np.array([0, 1, 32, 48, 64, 96, 128, 192], np.float32),
    "zramp": np.array([0, 24, 32, 48, 64, 96, 128, 192], np.float32),
    "ramp": np.array([16, 24, 32, 48, 64, 96, 128, 192], np.float32),
}
PAIRK_VARIANTS = tuple(PAIRK_MAGS192)


def pairk_code(variant: str = "exact") -> np.ndarray:
    """(16,) f32 RANK-CODED codebook of a pairk variant: index bit 3 = sign,
    bits 0-2 = magnitude rank (ascending).  ``pairk_code("exact")`` equals
    ``FP4_CODE[RANK_REMAP]``."""
    m = PAIRK_MAGS192[variant] / PAIRK_VALUE_SCALE
    return np.concatenate([m, -m]).astype(np.float32)


def pack_tpu_pairk(w: np.ndarray, blocksize: int = DEFAULT_BLOCKSIZE, variant: str = "exact", scale_dtype=np.float32):
    """Quantize + pack a weight matrix (N_out, K_in) into the pair-K layout.

    Layout (FP4-family only; NF4 keeps the split-K layout):
      * ``packed`` uint8 (K/2, N): byte (i, n) holds the RANK-CODED codes
        of Wt[2i+1, n] (high nibble) and Wt[2i, n] (low nibble) — K-adjacent
        weights pair in one byte, so ``pltpu.bitcast(i32 -> bf16)`` lands the
        decoded pair K-contiguous (low 16 bits -> row 2i).
      * ``scale`` f32 (K/blocksize, N) = absmax / 192 (the kernel contracts
        integer code values, see PAIRK_VALUE_SCALE).
      * shards contiguously in BOTH dims with no re-pairing: row-parallel TP
        slices dim 0 of packed+scale, column-parallel slices dim 1.
      * ``variant``: the stored codebook (see PAIRK_MAGS192).  "exact" is
        bit-exact bnb FP4; "ramp"/"zramp" are faster-decoding remaps.
      * ``scale_dtype``: f32 (default) or bfloat16.  bf16 halves the scale
        bytes the GEMV kernels stream (scale is ~5-11% of a kernel's DMA);
        codes are RE-QUANTIZED against the rounded scale so the only extra
        error is the scale rounding itself (<= 2^-9 relative — noise next to
        FP4's ~6% quantization error).

    Same absmax grid (bnb-identical blocks along K) as pack_tpu.
    """
    w = np.asarray(w, dtype=np.float32)
    n_out, k_in = w.shape
    if k_in % (2 * blocksize) != 0:
        raise ValueError(f"K={k_in} must be divisible by 2*blocksize={2 * blocksize}")
    scale_dtype = np.dtype(scale_dtype)
    if scale_dtype not in (np.dtype(np.float32), _BF16):
        raise ValueError(f"scale_dtype must be float32 or bfloat16, got {scale_dtype}")
    absmax = None
    if scale_dtype == _BF16:
        # round the stored scale FIRST, then quantize codes against the
        # rounded value: decode multiplies by the rounded scale, so nearest-
        # neighbor must be taken w.r.t. it
        flat = np.abs(w.reshape(-1, blocksize)).max(axis=1).astype(np.float32)
        rounded = (flat / PAIRK_VALUE_SCALE).astype(_BF16)
        absmax = rounded.astype(np.float32) * PAIRK_VALUE_SCALE
    if variant == "exact":
        # quantize against bnb's FP4_CODE (identical tie behavior to the flat
        # bnb path), then remap magnitude-index -> rank
        codes, absmax = quantize_codes(w, blocksize, FP4_CODE, absmax=absmax)
        codes = RANK_REMAP[codes]
    else:
        codes, absmax = quantize_codes(w, blocksize, pairk_code(variant), absmax=absmax)
    ct = codes.reshape(n_out, k_in).T  # (K, N)
    packed = ((ct[1::2].astype(np.uint8) << 4) | ct[0::2]).astype(np.uint8)
    scale = (absmax.reshape(n_out, k_in // blocksize).T / PAIRK_VALUE_SCALE).astype(scale_dtype)
    return np.ascontiguousarray(packed), np.ascontiguousarray(scale)


def unpack_tpu_pairk(packed: np.ndarray, scale: np.ndarray, blocksize: int = DEFAULT_BLOCKSIZE, variant: str = "exact") -> np.ndarray:
    """Golden dequantize of the pair-K layout -> Wt float32 (K, N).

    Spec: value = (192 * pairk_code(variant)[nibble]) * scale, with the
    integer code value exact in f32/bf16.  (Equals code * absmax up to one
    f32 rounding of absmax/192 — within the bnb error envelope.)
    """
    kp, n = packed.shape
    k = 2 * kp
    ct = np.empty((k, n), dtype=np.uint8)
    ct[0::2] = packed & 0xF
    ct[1::2] = packed >> 4
    ivals = (PAIRK_VALUE_SCALE * pairk_code(variant))[ct]  # exact ints
    scales = np.repeat(scale.astype(np.float32), blocksize, axis=0)
    return (ivals * scales).astype(np.float32)


def pack_tpu_pairk_lut(w: np.ndarray, codebook: np.ndarray, blocksize: int = DEFAULT_BLOCKSIZE):
    """Quantize + pack against an ARBITRARY sorted 16-entry codebook (NF4 or
    any bnb ``QuantState.code``) into the pair-K byte layout.

    The stored nibble is the code INDEX (== rank: the table must be strictly
    increasing, which bnb codebooks are).  The kernel decodes by gathering
    the codebook's bf16 BIT PATTERNS (two 16-bit gathers per byte assembled
    into one i32 lane — same pltpu.bitcast landing as the FP4 variants), so
    decode speed is codebook-independent.  ``scale`` f32 (K/bs, N) = absmax
    (bnb normalizes codebooks to max |v| = 1; value = code[nibble] * absmax,
    reference semantics — but honoring the table the reference ignores,
    gemv_fp4_optimized.cu:266,274).
    """
    w = np.asarray(w, dtype=np.float32)
    code = np.asarray(codebook, np.float32)
    if code.shape != (16,):
        raise ValueError(f"codebook must have 16 entries, got {code.shape}")
    if not np.all(np.diff(code) > 0):
        raise ValueError("codebook must be strictly increasing (bnb tables are)")
    n_out, k_in = w.shape
    if k_in % (2 * blocksize) != 0:
        raise ValueError(f"K={k_in} must be divisible by 2*blocksize={2 * blocksize}")
    # quantize against the bf16-ROUNDED table: the kernel multiplies by the
    # bf16 bit patterns, so nearest-neighbor is taken w.r.t. what decode uses
    code_bf = code.astype(_BF16).astype(np.float32)
    codes, absmax = quantize_codes(w, blocksize, code_bf)
    ct = codes.reshape(n_out, k_in).T  # (K, N)
    packed = ((ct[1::2].astype(np.uint8) << 4) | ct[0::2]).astype(np.uint8)
    scale = np.ascontiguousarray(absmax.reshape(n_out, k_in // blocksize).T)
    return np.ascontiguousarray(packed), scale


def unpack_tpu_pairk_lut(packed: np.ndarray, scale: np.ndarray, codebook: np.ndarray, blocksize: int = DEFAULT_BLOCKSIZE) -> np.ndarray:
    """Golden dequantize of the pair-K LUT layout -> Wt float32 (K, N).

    Spec mirrors the kernel exactly: value = bf16(code[nibble]) * scale."""
    code_bf = np.asarray(codebook, np.float32).astype(_BF16).astype(np.float32)
    kp, n = packed.shape
    k = 2 * kp
    ct = np.empty((k, n), dtype=np.uint8)
    ct[0::2] = packed & 0xF
    ct[1::2] = packed >> 4
    vals = code_bf[ct]
    scales = np.repeat(scale.astype(np.float32), blocksize, axis=0)
    return (vals * scales).astype(np.float32)


def tpu_layout_from_bnb(packed_flat: np.ndarray, absmax_flat: np.ndarray, shape, blocksize: int = DEFAULT_BLOCKSIZE):
    """Convert bnb flat packing (packed (numel//2,), absmax (numel//bs,)) for a
    weight of ``shape`` (N_out, K_in) into the TPU layout — exact, no requant."""
    n_out, k_in = shape
    codes = unpack_flat(packed_flat).reshape(n_out, k_in)
    codes_t = codes.T
    absmax_t = absmax_flat.reshape(n_out, k_in // blocksize).T
    half = k_in // 2
    packed = ((codes_t[:half].astype(np.uint8) << 4) | (codes_t[half:] & 0xF)).astype(np.uint8)
    return np.ascontiguousarray(packed), np.ascontiguousarray(absmax_t.astype(np.float32))
