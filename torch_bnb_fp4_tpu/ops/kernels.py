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
  * Nibble decode uses the TPU's ``dynamic_gather`` (vector permute within
    128-lane registers): the 16-entry codebook is staged into the first 16
    lanes of a (rows, 128) table and each 128-lane chunk of codes indexes it
    with one hardware gather — measured 3.7x faster than arithmetic decode on
    v5e, and generic over codebooks (NF4 works by swapping the table, unlike
    the reference which hardcodes FP4 and ignores its codebook argument —
    SURVEY.md §2.4).  The moral equivalent of the reference's shared-memory
    LUT (gemv_fp4_optimized.cu:92-95), built TPU-style.
  * An exact arithmetic FP4 decode (every FP4 magnitude is 2^j or 4/3*2^j, so
    the f32 bit pattern is assembled from the nibble with integer VPU ops) is
    kept as a cross-check implementation (``decode_impl="arith"``).
  * Matmul rides the MXU with f32 accumulation; for batch-1 GEMV the MXU is
    idle-cheap and the kernel is decode/HBM-bound, which is exactly where
    FP4's 4x byte advantage pays.

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

# Preferred K multiple (the layer API zero-pads to it): guarantees kp = K/2
# is a multiple of 512, so absmax tiles (block_kp/64, n) have >= 8 sublanes —
# a Mosaic block-shape requirement (last two block dims divisible by (8, 128)).
# Smaller K (row-parallel TP shards) is allowed via a single full-kp block:
# Mosaic permits a block dim equal to the full array dim.
K_QUANTUM = 1024


def _split_absmax(absmax, kp: int, blocksize: int, n: int):
    """Normalize absmax to its (hi, lo) halves, each (kp/blocksize, n).

    Accepts either the pre-split pair (the QuantLinear layout — shardable
    along K as one contiguous NamedSharding per half) or the single
    (K/blocksize, n) array of ops.format.pack_tpu."""
    rows = kp // blocksize
    if isinstance(absmax, (tuple, list)):
        shi, slo = absmax
    else:
        if absmax.shape != (2 * rows, n):
            raise ValueError(
                f"absmax must be (K/blocksize, N) = {(2 * rows, n)} for blocksize={blocksize}, "
                f"got {absmax.shape}"
            )
        shi, slo = absmax[:rows], absmax[rows:]
    if shi.shape != (rows, n) or slo.shape != (rows, n):
        raise ValueError(
            f"absmax halves must each be {(rows, n)}, got {shi.shape} and {slo.shape}"
        )
    return shi, slo


def _kp_block(kp: int, requested: int, blocksize: int) -> int:
    """Pick the K-dim block for packed bytes (kp = K/2 rows)."""
    if kp % 512 == 0:
        return _choose_block(kp, requested, 512)
    # small shard (row-parallel TP): one full-kp block.  u8 sublane quantum is
    # 32; the absmax block then covers its whole (sub-512/64) dim, allowed.
    assert kp % 32 == 0 and kp % blocksize == 0, (kp, blocksize)
    return kp


def _choose_block(dim: int, requested: int, quantum: int) -> int:
    """Largest multiple of ``quantum`` that is <= requested and divides dim."""
    assert dim % quantum == 0, (dim, quantum)
    best = quantum
    for s in range(min(requested, dim) // quantum, 0, -1):
        if (dim // quantum) % s == 0:
            best = s * quantum
            break
    return best


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Per-chip kernel defaults (VERDICT r4 next #7).  The v5e row is MEASURED
# (PERF_NOTES rounds 1-3: GEMV bk=512/widest-N, multi-row m-outer 1024/4096,
# m-inner 1024 with a8 at 2048/2048, a8 engages at M >= 512).  The other rows
# are PROVISIONAL: seeded from v5e scaled by each chip's bandwidth:compute
# ratio direction (v5p/v6e have more HBM bytes per VPU op, which shifts the
# decode/DMA balance point toward deeper tiles and earlier a8) — re-tune on
# real hardware with:
#   python benchmarks/shape_sweep.py      (GEMV / m-outer block shapes)
#   python benchmarks/smallm_sweep.py     (multi-row decode shapes)
#   python benchmarks/w4a8_sweep.py && python benchmarks/w4a8_validate.py
# and update this table; tests/test_kernels.py pins the dispatch.
# ---------------------------------------------------------------------------

CHIP_KERNEL_DEFAULTS = {
    # gemv_*: batch-1 decode; mouter_*: multi-row bf16 decode (M=2..128);
    # minner_bk/_bk_a8/_bn: GEMM (prefill); a8_min_m: int8-MXU auto threshold
    # a8 defaults re-measured round 5 with the fixed full-output harness
    # (benchmarks/w4a8_validate.py): bm512+bk1024 beat bm256+bk2048 by ~4%
    # at M=2048 in two sessions (1069/1074 vs 1110/1114us; either factor
    # alone is neutral), and a8 overtakes the bf16-fused path already at
    # M=256 (286 vs 302us) -> threshold 256.
    "v5e": dict(gemv_bk=512, gemv_bn=8192, mouter_bk=1024, mouter_bn=4096,
                minner_bk=1024, minner_bk_a8=1024, minner_bm_a8=512,
                minner_bn=2048, a8_min_m=256),
    "v5p": dict(gemv_bk=512, gemv_bn=8192, mouter_bk=1024, mouter_bn=4096,
                minner_bk=2048, minner_bk_a8=1024, minner_bm_a8=512,
                minner_bn=2048, a8_min_m=256),
    "v6e": dict(gemv_bk=1024, gemv_bn=8192, mouter_bk=1024, mouter_bn=4096,
                minner_bk=2048, minner_bk_a8=1024, minner_bm_a8=512,
                minner_bn=2048, a8_min_m=256),
    "v4": dict(gemv_bk=512, gemv_bn=8192, mouter_bk=1024, mouter_bn=4096,
               minner_bk=1024, minner_bk_a8=1024, minner_bm_a8=512,
               minner_bn=2048, a8_min_m=256),
}

_chip_override: str | None = None
_chip_cached: str | None = None


def set_chip(chip: str | None) -> None:
    """Override the detected chip generation for kernel defaults (None =
    autodetect).  Testing/tuning hook."""
    global _chip_override
    if chip is not None and chip not in CHIP_KERNEL_DEFAULTS:
        raise ValueError(f"unknown chip {chip!r}; known: {sorted(CHIP_KERNEL_DEFAULTS)}")
    _chip_override = chip


def chip_defaults() -> dict:
    """Kernel block-shape defaults for the local chip generation (memoized;
    CPU/interpret runs get the v5e row)."""
    global _chip_cached
    if _chip_override is not None:
        return CHIP_KERNEL_DEFAULTS[_chip_override]
    if _chip_cached is None:
        from ..utils.profiling import detect_chip

        _chip_cached = detect_chip(default="v5e")
    return CHIP_KERNEL_DEFAULTS.get(_chip_cached, CHIP_KERNEL_DEFAULTS["v5e"])


def make_code_table(codebook=None) -> jax.Array:
    """(1, 128) f32 decode table: codebook in the first 16 lanes."""
    if codebook is None:
        tab = np.zeros((1, 128), np.float32)
        tab[0, :16] = fmt.FP4_CODE
        return jnp.asarray(tab)
    cb = jnp.asarray(codebook, jnp.float32).reshape(1, 16)
    return jnp.pad(cb, ((0, 0), (0, 112)))


def _decode_fp4_f32(codes: jax.Array) -> jax.Array:
    """Arithmetic FP4 decode (int32 codes 0..15 -> exact f32 code values).

    Bit-exact with ``fmt.FP4_CODE[codes]``: each magnitude is 2^(1-e) (odd
    magnitude index) or 4/3 * 2^-e (even), so the f32 bit pattern is built
    directly.  Replaces the reference's branch tree
    (dequant_fp4_optimized.cu:55-76) without branches or tables.
    """
    m = codes & 7
    b = codes & 1
    e = m >> 1
    bits = ((127 + b) - e) << 23 | (_MANT_43 & (b - 1))
    bits = jnp.where(m < 2, b * _C1_BITS, bits)
    bits = bits | ((codes & 8) << 28)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _gather_decode(codes: jax.Array, code_tab: jax.Array) -> jax.Array:
    """Codebook lookup via ``tpu.dynamic_gather`` in 128-lane chunks.

    ``codes``: (rows, cols) int32 in [0, 16); ``code_tab``: (1, 128) f32 with
    the codebook in lanes [0, 16).  Lowered to one vector permute per chunk.
    """
    rows, cols = codes.shape
    assert cols % 128 == 0, cols
    tab = jnp.broadcast_to(code_tab, (rows, 128))
    if cols == 128:
        return jnp.take_along_axis(tab, codes, axis=1)
    chunks = [
        jnp.take_along_axis(tab, codes[:, c0 : c0 + 128], axis=1)
        for c0 in range(0, cols, 128)
    ]
    return jnp.concatenate(chunks, axis=1)


def _expand_scale(scale_tile: jax.Array, blocksize: int) -> jax.Array:
    """(BK // blocksize, BN) f32 -> (BK, BN) by repeating each row."""
    return jnp.repeat(scale_tile, blocksize, axis=0)


def _decode_tile(packed_u8, code_tab, scale_hi, scale_lo, blocksize, decode_impl):
    """uint8 packed tile (BKP, BN) -> two f32 weight tiles (BKP, BN).

    Returns (w_hi, w_lo): dequantized Wt rows [k0, k0+BKP) and
    [K//2 + k0, K//2 + k0 + BKP).
    """
    word = packed_u8.astype(jnp.int32)
    hi = word >> 4
    lo = word & 0xF
    if decode_impl == "arith":
        v_hi = _decode_fp4_f32(hi)
        v_lo = _decode_fp4_f32(lo)
    else:
        v_hi = _gather_decode(hi, code_tab)
        v_lo = _gather_decode(lo, code_tab)
    w_hi = v_hi * _expand_scale(scale_hi, blocksize)
    w_lo = v_lo * _expand_scale(scale_lo, blocksize)
    return w_hi, w_lo


# ---------------------------------------------------------------------------
# Standalone dequantize (reference: dequantize_blockwise_*_fp4, csrc/dequant_
# fp4_optimized.cu:89-255).  Output is Wt (K, N) in the requested dtype.
# ---------------------------------------------------------------------------


def _dequant_kernel(code_ref, packed_ref, shi_ref, slo_ref, ohi_ref, olo_ref, *, blocksize, decode_impl, out_dtype):
    w_hi, w_lo = _decode_tile(
        packed_ref[:], code_ref[:], shi_ref[:], slo_ref[:], blocksize, decode_impl
    )
    ohi_ref[:] = w_hi.astype(out_dtype)
    olo_ref[:] = w_lo.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("blocksize", "out_dtype", "block_kp", "block_n", "decode_impl", "interpret"),
)
def dequantize_tpu(
    packed: jax.Array,
    absmax: jax.Array,
    codebook: jax.Array | None = None,
    *,
    blocksize: int = 64,
    out_dtype=jnp.bfloat16,
    block_kp: int = 512,
    block_n: int = 256,
    decode_impl: str | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Dequantize split-K packed weights -> Wt (K, N) in ``out_dtype``.

    ``packed`` uint8 (K//2, N); ``absmax`` f32 (K//blocksize, N); ``codebook``
    None for FP4 or a (16,) f32 table (e.g. NF4).
    """
    if interpret is None:
        interpret = _interpret_default()
    if decode_impl is None:
        decode_impl = "gather"  # measured faster than arith in the store-bound dequant kernel
    kp, n = packed.shape
    shi, slo = _split_absmax(absmax, kp, blocksize, n)
    assert decode_impl in ("gather", "arith")
    assert codebook is None or decode_impl == "gather", "arith decode is FP4-only"
    block_kp = _kp_block(kp, block_kp, blocksize)
    block_n = _choose_block(n, block_n, 128)
    assert block_kp % blocksize == 0
    sblk = block_kp // blocksize
    grid = (kp // block_kp, n // block_n)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # code table, full (1, 128)
        pl.BlockSpec((block_kp, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((sblk, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((sblk, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((block_kp, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_kp, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((kp, n), out_dtype),
        jax.ShapeDtypeStruct((kp, n), out_dtype),
    ]
    kern = functools.partial(
        _dequant_kernel, blocksize=blocksize, decode_impl=decode_impl, out_dtype=out_dtype
    )
    hi, lo = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(make_code_table(codebook), packed, shi, slo)
    # hi holds Wt rows [0, K//2), lo holds rows [K//2, K)
    return jnp.concatenate([hi, lo], axis=0)


# ---------------------------------------------------------------------------
# Fused dequant-matmul (replaces the reference's qlinear dequant-to-temp path,
# torch_fp4.cpp:64-103, and the GEMV kernel gemv_fp4_optimized.cu:60-275).
# Computes y = x @ Wt (+ bias), x (M, K), Wt (K, N) decoded on the fly.
# ---------------------------------------------------------------------------


def _matmul_kernel(
    code_ref,
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
    decode_impl,
    out_dtype,
    compute_dtype,
    has_bias,
    nk,
):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w_hi, w_lo = _decode_tile(
        packed_ref[:], code_ref[:], shi_ref[:], slo_ref[:], blocksize, decode_impl
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "blocksize",
        "out_dtype",
        "block_m",
        "block_kp",
        "block_n",
        "decode_impl",
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
    block_kp: int = 512,
    block_n: int = 256,
    decode_impl: str | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused dequant-matmul: y[M, N] = x[M, K] @ dequant(packed)[K, N] + bias.

    The packed weight never materializes in HBM.  ``x`` may be f32, bf16,
    or f16.  TPUs have no f16 MXU path, so f16 inputs COMPUTE IN BF16 (8-bit
    mantissa->8-bit exponent trade; output is cast back to f16).  This is an
    explicit, tested contract (tests/test_kernels.py::test_f16_computes_in_
    bf16) — the reference ships a dedicated f16 GEMV because CUDA has native
    f16 (gemv_fp4_optimized.cu:60); on TPU bf16 is the native 16-bit type.
    Accumulation is always f32 (reference accumulates f32 too:
    gemv_fp4_optimized.cu:144, cuBLAS default).
    """
    if interpret is None:
        interpret = _interpret_default()
    if packed.ndim != 2 or packed.dtype != jnp.uint8:
        raise ValueError(f"packed must be 2-D uint8 (K/2, N), got {packed.shape} {packed.dtype}")
    kp, n = packed.shape
    k = 2 * kp
    if x.ndim != 2 or x.shape[1] != k:
        raise ValueError(f"x must be (M, K={k}) for packed (K/2={kp}, N={n}), got {x.shape}")
    m = x.shape[0]
    shi, slo = _split_absmax(absmax, kp, blocksize, n)
    if decode_impl is None:
        # arith decode measured fastest in the MXU-fused kernel on v5e;
        # custom codebooks (NF4) require the gather path.
        decode_impl = "arith" if codebook is None else "gather"
    assert decode_impl in ("gather", "arith")
    assert codebook is None or decode_impl == "gather", "arith decode is FP4-only"

    if out_dtype is None:
        out_dtype = x.dtype
    compute_dtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    x = x.astype(compute_dtype)

    # shrink blocks to problem size; pad M up to a sublane-aligned block
    block_n = _choose_block(n, block_n, 128)
    block_kp = _kp_block(kp, block_kp, blocksize)
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
        pl.BlockSpec(memory_space=pltpu.VMEM),  # code table, full (1, 128)
        # x hi half: columns [k0, k0 + block_kp)
        pl.BlockSpec((block_m, block_kp), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        # x lo half: columns [K//2 + k0, ...)
        pl.BlockSpec((block_m, block_kp), lambda i, j, kk: (i, nk + kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_kp, block_n), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((sblk, block_n), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((sblk, block_n), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM)

    kern = functools.partial(
        _matmul_kernel,
        blocksize=blocksize,
        decode_impl=decode_impl,
        out_dtype=out_dtype,
        compute_dtype=compute_dtype,
        has_bias=has_bias,
        nk=nk,
    )
    cost = pl.CostEstimate(
        flops=2 * mp * k * n,
        bytes_accessed=mp * k * x.dtype.itemsize + kp * n + (k // blocksize) * n * 4,
        transcendentals=0,
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        cost_estimate=cost,
        interpret=interpret,
    )(make_code_table(codebook), x, x, packed, shi, slo, bias)
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
    block_kp: int = 1024,
    block_n: int = 512,
    decode_impl: str | None = None,
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
        decode_impl=decode_impl,
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Pair-K kernels: the FP4 serving hot path (see ops/format.pack_tpu_pairk).
#
# Both nibbles of a byte decode inside one i32 lane into two bf16 bit
# patterns of 192*code (rank ramp 0x4180 + q*0x40), and pltpu.bitcast lands
# them K-contiguous for the MXU; 6 / 11 / 16 integer ops per byte for the
# ramp / zramp / exact codebook variants (_decode_pairs).  The per-block
# absmax/192 multiplies the (BM, BN) block PARTIAL after the dot — 1/64 of
# an op per weight instead of 1.  Measured on v5e (x(1,4096) @ 4096x14336):
# ramp 47.7us vs 153.5us bf16 matvec (3.2x); roofline (DMA-bound) ~44us.
# ---------------------------------------------------------------------------


def _k_block_pairk(k: int, requested: int, blocksize: int, s_quantum: int = 8) -> int:
    """Pick the K block for pair-K kernels whose scale tile is K-blocked.
    Quantum = s_quantum*blocksize (the scale tile (block_k/bs, n) needs >= 8
    sublanes for f32 scales, >= 16 for bf16); small row-parallel shards fall
    back to one full-K block."""
    q = s_quantum * blocksize
    if k % q == 0:
        return _choose_block(k, requested, q)
    assert k % (2 * blocksize) == 0 and (k // 2) % 32 == 0, (k, blocksize)
    return k


def _k_block_stripe(k: int, requested: int, blocksize: int) -> int:
    """K block for the m-outer kernel, whose scale arrives in 8-row-aligned
    windows so the 8-sublane scale-tile quantum does not bind block_k.
    Constraints: x/packed lane+sublane tiling (block_k >= 128, packed rows
    block_k/2 % 32 == 0), whole quant blocks (block_k % blocksize == 0) ->
    quantum max(128, blocksize); AND the window contract: a step's scale
    rows must sit inside ONE window, i.e. sblk = block_k/blocksize must
    divide the 8-row window height or be a multiple of it (otherwise step
    kk=1 of e.g. K=768/bk=384 needs rows 6..11, which straddle windows —
    the in-kernel where-chain would select wrong scales)."""
    q = max(128, blocksize)
    if k % q == 0:
        for s in range(min(requested, k) // q, 0, -1):
            bk = s * q
            if (k // q) % s:
                continue
            sblk = bk // blocksize
            if bk == k or 8 % sblk == 0 or sblk % 8 == 0:
                return bk
    assert k % (2 * blocksize) == 0 and (k // 2) % 32 == 0, (k, blocksize)
    return k


def _decode_pairs(x_u8_as_i32: jax.Array, variant: str = "exact") -> jax.Array:
    """(R, C) i32 holding packed bytes -> (R, C) i32 holding two bf16 bit
    patterns of 192*pairk_code(variant)[nibble]; low 16 bits = low nibble.

    Identities: the six shared magnitudes at ranks q=2..7 have bf16 bits
    0x4180 + q*0x40 (0x80 exponent steps interleaved with the 1.5x mantissa
    bit 0x40); t = X*0x1001 replicates the byte so both nibbles decode in one
    i32 lane (== (X<<12)|X, one op).  Per-variant exception handling
    (ops/format.PAIRK_MAGS192):

      ramp   (6 ops):  no exceptions — rank 0 IS on the ramp (16 -> 0x4180),
                       and t = X*0x01001000 lands each nibble's SIGN bit
                       directly at bf16 bit 15/31 (int32 wrap puts byte bit 7
                       at bit 31), so sign costs one and+or.
      zramp  (11 ops): same sign trick; rank 0 decodes to +-0 via a
                       per-half [q >= 1] mask built from (q<<12) + 0x7000's
                       carry into bit 15/31.
      exact  (16 ops): ranks {0, 1} decode to {0, 1}: mask via bit 3 of
                       (q + 6), then OR rank back in scaled to bf16(1.0).

    Measured v5e 4096x14336 GEMV: 93.5 / 73.7 / 47.7us for exact/zramp/ramp
    vs 153.5us bf16 matvec (roofline ~44us; the 7-op ramp form measured
    50.7-52.6us).  (A multiply-free exact variant — carry tricks replacing
    the muls — measured SLOWER in a controlled A/B: 104-108us vs 89.5us; int
    vector muls are ~1 slot on v5e.)
    """
    X = x_u8_as_i32
    if variant in ("ramp", "zramp"):
        t = X * 0x01001000  # lo nibble -> bits[12:16], hi -> [28:32]
        # (t >> 6) is arithmetic, but the mask keeps only the rank fields at
        # [6:9] and [22:25]; -0x7FFF8000 is 0x80008000 as int32
        if variant == "ramp":
            return 0x41804180 + ((t >> 6) & 0x01C001C0) | (t & -0x7FFF8000)
        q12 = t & 0x70007000
        bits = 0x41804180 + (q12 >> 6)
        # [q >= 1] per half: adding 0x7000 to q<<12 carries into bit 15/31
        s1 = ((q12 + 0x70007000) >> 15) & 0x00010001
        return bits & (s1 * 0xFFFF) | (t & -0x7FFF8000)
    t = X * 0x1001
    q2 = t & 0x00070007
    bits = 0x41804180 + (q2 << 6)
    s1 = ((q2 + 0x00060006) >> 3) & 0x00010001
    bits = bits & (s1 * 0xFFFF)
    one = q2 & (s1 ^ 0x00010001)
    bits = bits | (one * 0x3F80)
    return bits | ((t & 0x00080008) << 12)


def make_pairk_lut(codebook) -> jax.Array:
    """(1, 128) i32 table: bf16 BIT PATTERNS of a 16-entry codebook in lanes
    [0, 16) — the gather source for the pair-K "lut" decode (arbitrary
    codebooks, e.g. NF4).  jnp-native: the codebook may be a traced operand
    (it is a QuantLinear pytree leaf)."""
    cb = jnp.asarray(codebook, jnp.float32).astype(jnp.bfloat16).reshape(16)
    bits = jax.lax.bitcast_convert_type(cb, jnp.uint16).astype(jnp.int32)
    return jnp.pad(bits.reshape(1, 16), ((0, 0), (0, 112)))


def _pairs_weight_tile(p_ref, compute_dtype, variant="exact", tab=None):
    """packed-bytes ref block (BK/2, BN) -> bf16/f32 weight-value tile
    (BK, BN) holding the codebook values (scale NOT applied).

    FP4-family variants build the bf16 bits arithmetically (_decode_pairs);
    ``variant="lut"`` gathers the 16 bf16 bit patterns of an arbitrary
    codebook from ``tab`` (two 16-bit gathers per byte assembled into one
    i32 lane) — this is what makes NF4 ride the same fast layout, honoring
    the codebook argument the reference validates but ignores
    (gemv_fp4_optimized.cu:266,274)."""
    if variant == "lut":
        X = p_ref[:].astype(jnp.int32)
        t = tab[:]  # tab may be a VMEM ref or an array
        blo = _gather_decode(X & 0xF, t)
        bhi = _gather_decode((X >> 4) & 0xF, t)
        bits = blo | (bhi << 16)
    else:
        bits = _decode_pairs(p_ref[:].astype(jnp.int32), variant)
    w = pltpu.bitcast(bits, jnp.bfloat16)  # (BK, BN), K-contiguous
    if compute_dtype == jnp.float32:
        w = w.astype(jnp.float32)  # FP4-family integer values <= 192: exact
    return w


def _matmul_pk_kernel(tab_ref, x_ref, p_ref, s_ref, bias_ref, out_ref, acc_ref, *, blocksize, nk, out_dtype, compute_dtype, has_bias, variant):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    bk = 2 * p_ref.shape[0]
    sblk = bk // blocksize
    # The scale arrives as an 8-ROW-ALIGNED window (f32 sublane quantum):
    # for block_k >= 8*blocksize the window IS this step's rows (r0 == 0
    # statically and the where-chain below is empty); for smaller block_k
    # (sub-512, the small-kernel DMA lever) consecutive K steps share one
    # window — same block index, fetched once — and each step selects its
    # live rows in-register (8 - sblk jnp.wheres per step; Mosaic cannot
    # prove dynamic sublane slices 8-aligned, so slicing is not an option).
    s_rows = s_ref.shape[0]
    r0 = (kk * sblk) % s_rows
    prec = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
    acc = acc_ref[:]
    hb = blocksize // 2
    # decode ONE quant-block slice at a time and feed the MXU immediately:
    # small temps (Mosaic keeps them in VREGs) and VPU decode of slice b+1
    # software-pipelines against the MXU dot of slice b
    for b in range(sblk):
        w = _pairs_weight_tile(p_ref.at[pl.ds(b * hb, hb), :], compute_dtype, variant, tab_ref)
        part = jnp.dot(
            x[:, b * blocksize : (b + 1) * blocksize],
            w,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        srow = s_ref[b]
        for cand in range(sblk, s_rows, sblk):
            srow = jnp.where(r0 == cand, s_ref[cand + b], srow)
        acc = acc + part * srow[None, :].astype(jnp.float32)
    acc_ref[:] = acc

    @pl.when(kk == nk - 1)
    def _():
        res = acc_ref[:]
        if has_bias:
            res = res + bias_ref[:].astype(jnp.float32)
        out_ref[:] = res.astype(out_dtype)


def _matmul_pk_minner_kernel(tab_ref, x_ref, p_ref, s_ref, bias_ref, out_ref, acc_ref, w_ref, *, blocksize, nk, out_dtype, compute_dtype, has_bias, block_m, variant):
    """m-INNERMOST variant (grid (n, k, m)): each weight tile is decoded ONCE
    into scratch and reused for every M block — decode cost is one weight
    pass regardless of M (the GEMM/prefill path; the reference's qlinear
    dequant-to-temp amortizes the same way but round-trips HBM,
    torch_fp4.cpp:64-82)."""
    kk, mi = pl.program_id(1), pl.program_id(2)

    @pl.when(mi == 0)
    def _():
        # pre-scale ONCE per weight tile (amortized over all M blocks): the
        # dots then run at full block_k depth, keeping the MXU pipeline full
        # (64-deep per-quant-block dots cap it at ~50%).  For bf16 compute the
        # whole prescale stays in bf16 (2 values/lane): the decoded integer
        # code values are exact in bf16; the f32 scale's cast to bf16 and the
        # bf16 product each round once (~2^-8 relative worst case combined —
        # noise next to FP4's ~6% quant error).  Scale broadcast is one
        # native (1, BN)-row broadcast per
        # quant block, NOT jnp.repeat (sublane-shuffle repeat measured ~100us
        # extra per 4096x14336 at M=2048).
        # decode one quant-block slice at a time: (blocksize, BN) temps stay
        # near vector registers instead of spilling a whole (BK, BN) tile
        hb = blocksize // 2
        for b in range(2 * p_ref.shape[0] // blocksize):
            w = _pairs_weight_tile(p_ref.at[pl.ds(b * hb, hb), :], w_ref.dtype, variant, tab_ref)
            w_ref[pl.ds(b * blocksize, blocksize), :] = (
                w * s_ref[b][None, :].astype(w_ref.dtype)
            )

    row = pl.ds(mi * block_m, block_m)

    @pl.when(kk == 0)
    def _():
        acc_ref[row, :] = jnp.zeros((block_m, acc_ref.shape[1]), jnp.float32)

    prec = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
    acc_ref[row, :] += jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32, precision=prec
    )

    @pl.when(kk == nk - 1)
    def _():
        res = acc_ref[row, :]
        if has_bias:
            res = res + bias_ref[:].astype(jnp.float32)
        out_ref[:] = res.astype(out_dtype)


def _matmul_pk_w4a8_kernel(tab_ref, x8_ref, p_ref, s_ref, bias_ref, rs_ref, out_ref, acc_ref, w8_ref, g_ref, *, blocksize, nk, out_dtype, has_bias, block_m, variant):
    """w4a8 m-inner variant: int8 x int8 -> int32 dots on the MXU's 2x-rate
    path (the regime where a bf16 fused-dequant GEMM tops out at parity-
    minus-decode, PERF_NOTES round-2 prefill decomposition).

    Weight tile (once per (j, kk), amortized over all M blocks): decode FP4,
    requantize per COLUMN to int8 against Gn = 192*max_b(scale_b) — a TIGHT
    bound, since each 64-row quant block attains its absmax, so the column
    max over the tile IS Gn.  Activations arrive PRE-quantized: ``x8_ref``
    int8 (quantized per row per K-tile against r = row absmax) and
    ``rs_ref`` = r/127 per (row, K-tile) — computed once in XLA before the
    kernel instead of per grid step, which removes an in-kernel cross-lane
    max reduction repeated n/block_n times per (kk, mi) and halves the x DMA
    bytes (round-5 small-M lever).  Rescale: y += dot_i32 * (r/127)*(Gn/127).
    int32 is exact: 127*127*block_k <= 3.3e7 << 2^31.

    This is the principled version of the reference's reduced-precision
    qlinear (torch_fp4.cpp:64-103, error ~0.35 documented at
    __init__.py:370-372): instead of computing in half precision, both
    operands are affinely requantized and the dot is EXACT integer math —
    measured error stays within a few percent of the bf16 path's.
    """
    kk, mi = pl.program_id(1), pl.program_id(2)

    @pl.when(mi == 0)
    def _():
        s = s_ref[:].astype(jnp.float32)  # (sblk, BN)
        g = jnp.max(s, axis=0, keepdims=True)
        g = jnp.where(g == 0.0, 1.0, g)
        g_ref[:] = g * (fmt.PAIRK_VALUE_SCALE / 127.0)  # Gn/127
        # NB a bf16-domain requant (2 values/lane, would halve this pass)
        # does not lower on v5e: Mosaic has no bf16 roundeven (round-5 note)
        f = (s / g) * (127.0 / fmt.PAIRK_VALUE_SCALE)  # s_b*127/Gn
        hb = blocksize // 2
        for b in range(2 * p_ref.shape[0] // blocksize):
            wv = _pairs_weight_tile(p_ref.at[pl.ds(b * hb, hb), :], jnp.float32, variant, tab_ref)
            w8_ref[pl.ds(b * blocksize, blocksize), :] = jnp.round(
                wv * f[b][None, :]
            ).astype(jnp.int8)

    row = pl.ds(mi * block_m, block_m)

    @pl.when(kk == 0)
    def _():
        acc_ref[row, :] = jnp.zeros((block_m, acc_ref.shape[1]), jnp.float32)

    d = jax.lax.dot_general(
        x8_ref[:], w8_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    # rs arrives as the full (block_m, nk) per-K-tile scale strip (a lane
    # dim of 1 is not a legal Mosaic block shape); select column kk
    lane = jax.lax.broadcasted_iota(jnp.int32, (x8_ref.shape[0], nk), 1)
    rs = jnp.sum(jnp.where(lane == kk, rs_ref[:], 0.0), axis=1, keepdims=True)
    acc_ref[row, :] += d.astype(jnp.float32) * rs * g_ref[:]

    @pl.when(kk == nk - 1)
    def _():
        res = acc_ref[row, :]
        if has_bias:
            res = res + bias_ref[:].astype(jnp.float32)
        out_ref[:] = res.astype(out_dtype)


def _matmul_w8_kernel(x8_ref, w8_ref, g_ref, bias_ref, rs_ref, out_ref, acc_ref, *, nk, out_dtype, has_bias, block_m):
    """Pure int8 GEMM over a pre-materialized int8 weight SHADOW (the
    "prefill shadow": decode+requant runs ONCE at attach time instead of
    per matmul call, removing the serialized per-tile VPU pass that floors
    the fused w4a8 path at M=256-512 — PERF_NOTES round 5).  Same math as
    _matmul_pk_w4a8_kernel minus the in-kernel weight pass: exact int32
    dots on the MXU's 2x int8 path, f32 rescale by (row absmax/127) x
    (per-K-tile column max/127)."""
    kk, mi = pl.program_id(1), pl.program_id(2)
    row = pl.ds(mi * block_m, block_m)

    @pl.when(kk == 0)
    def _():
        acc_ref[row, :] = jnp.zeros((block_m, acc_ref.shape[1]), jnp.float32)

    d = jax.lax.dot_general(
        x8_ref[:], w8_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (x8_ref.shape[0], nk), 1)
    rs = jnp.sum(jnp.where(lane == kk, rs_ref[:], 0.0), axis=1, keepdims=True)
    # g arrives as the full (nk, BN) strip (a 1-sublane block is not a legal
    # Mosaic shape unless nk < 8 equals the full dim... which it may not);
    # select this K-tile's row with a sublane iota mask
    srow = jax.lax.broadcasted_iota(jnp.int32, g_ref.shape, 0)
    g = jnp.sum(jnp.where(srow == kk, g_ref[:], 0.0), axis=0, keepdims=True)
    acc_ref[row, :] += d.astype(jnp.float32) * rs * g

    @pl.when(kk == nk - 1)
    def _():
        res = acc_ref[row, :]
        if has_bias:
            res = res + bias_ref[:].astype(jnp.float32)
        out_ref[:] = res.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_m", "block_k", "block_n", "interpret"),
)
def matmul_w8(
    x: jax.Array,
    w8: jax.Array,  # (K, N) int8 shadow
    g: jax.Array,  # (K // block_k, N) f32: per-K-tile column max / 127
    bias: jax.Array | None = None,
    *,
    out_dtype=None,
    block_m: int | None = None,
    block_k: int = 1024,
    block_n: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """y[M, N] = x[M, K] @ dequant8(w8)[K, N] (+ bias) — the int8-shadow
    GEMM.  ``g``'s row granularity MUST equal ``block_k`` (the attach step
    and this kernel share the constant).  Activations are pre-quantized per
    (row, K-tile) like the fused w4a8 path; accuracy is the same affine-int8
    envelope (slightly tighter: g is the exact tile max)."""
    if interpret is None:
        interpret = _interpret_default()
    k, n = w8.shape
    if x.ndim != 2 or x.shape[1] != k:
        raise ValueError(f"x must be (M, {k}), got {x.shape}")
    if k % block_k:
        raise ValueError(f"K={k} must divide by block_k={block_k}")
    nk = k // block_k
    if g.shape != (nk, n):
        raise ValueError(f"g must be {(nk, n)} (block_k={block_k}), got {g.shape}")
    m = x.shape[0]
    if out_dtype is None:
        out_dtype = x.dtype
    cd = chip_defaults()
    if block_m is None:
        block_m = min(cd["minner_bm_a8"], 32 * pl.cdiv(m, 32))
    block_n = _choose_block(n, cd["minner_bn"] if block_n is None else block_n, 128)
    nm = pl.cdiv(m, block_m)

    xr = x.astype(jnp.float32).reshape(m, nk, block_k)
    r = jnp.max(jnp.abs(xr), axis=2)
    r = jnp.where(r == 0.0, 1.0, r)
    x8 = jnp.round(xr * (127.0 / r)[:, :, None]).astype(jnp.int8).reshape(m, k)
    rs = r * (1.0 / 127.0)

    has_bias = bias is not None
    bias = jnp.zeros((1, n), jnp.float32) if bias is None else bias.reshape(1, n)
    cost = pl.CostEstimate(
        flops=2 * m * k * n,
        bytes_accessed=k * n + (k // block_k) * n * 4 + m * k,
        transcendentals=0,
    )
    kern = functools.partial(
        _matmul_w8_kernel, nk=nk, out_dtype=out_dtype, has_bias=has_bias,
        block_m=block_m,
    )
    out = pl.pallas_call(
        kern,
        grid=(n // block_n, nk, nm),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda j, kk, mi: (mi, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda j, kk, mi: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nk, block_n), lambda j, kk, mi: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j, kk, mi: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, nk), lambda j, kk, mi: (mi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, kk, mi: (mi, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((nm * block_m, block_n), jnp.float32)],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(x8, w8, g, bias, rs)
    return out


def make_int8_shadow(packed, scale, codebook=None, *, blocksize=64, variant, block_k=1024, interpret=None):
    """(w8 (K, N) int8, g (K/block_k, N) f32): the int8 prefill shadow of a
    pair-K packing — decode+requant done ONCE so matmul_w8 can skip it.
    Costs 1 byte/weight of extra HBM (2x the packed FP4); the FP4 bytes
    remain the decode/GEMV path."""
    wt = dequantize_tpu_pk(
        packed, scale, codebook, blocksize=blocksize, out_dtype=jnp.float32,
        variant=variant, interpret=interpret,
    )
    k, n = wt.shape
    assert k % block_k == 0, (k, block_k)
    wr = wt.reshape(k // block_k, block_k, n)
    g = jnp.max(jnp.abs(wr), axis=1)
    g = jnp.where(g == 0.0, 1.0, g)
    w8 = jnp.round(wr * (127.0 / g)[:, None, :]).astype(jnp.int8).reshape(k, n)
    return w8, g * (1.0 / 127.0)


def _expertify(kern_fn):
    """Wrap a pair-K kernel so it runs against ONE expert of a stacked weight.

    The expert index arrives via scalar prefetch: the BlockSpec index_maps
    use it as the leading coordinate of the stacked ``packed``/``scale``
    operands, so only the selected expert's tiles are ever DMA'd — the MoE
    decode path reads exactly its active experts' bytes, with no
    ``dynamic_slice`` materialization of a 3-matrix expert copy in HBM
    (XLA cannot fuse a slice into a Pallas operand).  The wrapped kernel
    sees (1, ...) blocks and unwraps the leading dim with ``.at[0]``."""

    def wrapped(e_ref, tab_ref, x_ref, p_ref, s_ref, bias_ref, *rest, **kw):
        del e_ref  # consumed by the index maps
        kern_fn(tab_ref, x_ref, p_ref.at[0], s_ref.at[0], bias_ref, *rest, **kw)

    return wrapped


@functools.partial(
    jax.jit,
    static_argnames=("blocksize", "out_dtype", "block_m", "block_k", "block_n", "interpret", "variant", "a8"),
)
def matmul_fp4_pk(
    x: jax.Array,
    packed: jax.Array,
    scale: jax.Array,
    bias: jax.Array | None = None,
    codebook: jax.Array | None = None,
    *,
    blocksize: int = 64,
    out_dtype=None,
    block_m: int | None = None,
    block_k: int | None = None,
    block_n: int | None = None,
    interpret: bool | None = None,
    variant: str,
    a8: bool | None = None,
    expert: jax.Array | int | None = None,
) -> jax.Array:
    """Fused pair-K dequant-matmul: y[M, N] = x[M, K] @ Wt[K, N] (+ bias).

    ``packed`` uint8 (K/2, N) pair-K layout; ``scale`` f32 (K/blocksize, N)
    = absmax/192; ``variant`` selects the stored codebook's decode
    (ops/format.pack_tpu_pairk + PAIRK_MAGS192 — must match the pack).
    ``variant`` is REQUIRED (no default): packed bytes carry no
    self-describing codebook, so a silent pack/decode mismatch would produce
    wrong weights — every caller states which codebook the buffer holds
    (QuantLinear threads its own ``variant`` field).
    ``block_k``/``block_n`` None = auto, per path (measured on v5e):
    m-inner GEMM bk=1024 (a8: 2048), bn=2048; multi-row m-outer (batched
    decode, M=2..128 bf16) bk=1024 with bn up to 4096 — +17-23% GB/s over
    the old 512/2048 on every decode matmul shape, two sessions
    (benchmarks/smallm_sweep.py); single-row/f32 m-outer keeps 512/2048.
    ``x`` may be f32, bf16, or f16 — f16 computes in bf16 (see matmul_fp4's
    dtype contract), f32 uses full-precision dots.

    ``a8``: int8-activation path (w4a8) for the MXU-bound GEMM regime — both
    operands requantized to int8, exact int32 dots on the MXU's 2x-rate
    path, f32 rescale (see _matmul_pk_w4a8_kernel).  None = auto: on for
    bf16 compute at M >= 512 with an FP4-family variant — measured
    (benchmarks/w4a8_bench.py, two sessions): M=2048 242-245 TFLOP/s =
    1.23-1.32x XLA dense bf16, M=1024 209 TF/s = 1.07x dense, M=512 a
    noise-band tie with the bf16 fused path (three interleaved A/Bs:
    win/lose/tie), all at mean-abs-error 1.006x the bf16 path's; False
    forces the bf16 path (bit-stable vs batch size), True forces int8
    (requires bf16 compute, non-lut variant).
    """
    if variant == "lut":
        if codebook is None:
            raise ValueError("variant='lut' requires a 16-entry codebook array")
    elif variant not in fmt.PAIRK_VARIANTS:
        raise ValueError(
            f"unknown pairk variant {variant!r}; expected one of {fmt.PAIRK_VARIANTS} or 'lut'"
        )
    elif codebook is not None:
        raise ValueError("codebook is only used with variant='lut'")
    if interpret is None:
        interpret = _interpret_default()
    if expert is None:
        if packed.ndim != 2 or packed.dtype != jnp.uint8:
            raise ValueError(f"packed must be 2-D uint8 (K/2, N), got {packed.shape} {packed.dtype}")
    else:
        if packed.ndim != 3 or packed.dtype != jnp.uint8:
            raise ValueError(
                f"expert selection needs STACKED 3-D uint8 packed (E, K/2, N), got {packed.shape} {packed.dtype}"
            )
    kp, n = packed.shape[-2:]
    k = 2 * kp
    if x.ndim != 2 or x.shape[1] != k:
        raise ValueError(f"x must be (M, K={k}) for packed (K/2={kp}, N={n}), got {x.shape}")
    m = x.shape[0]
    want_scale = (k // blocksize, n) if expert is None else (packed.shape[0], k // blocksize, n)
    if scale.shape != want_scale:
        raise ValueError(
            f"scale must be {want_scale} for blocksize={blocksize}, got {scale.shape}"
        )
    if scale.dtype not in (jnp.float32, jnp.bfloat16):
        raise ValueError(f"scale must be float32 or bfloat16, got {scale.dtype}")
    if out_dtype is None:
        out_dtype = x.dtype
    compute_dtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    x = x.astype(compute_dtype)

    cd = chip_defaults()  # per-chip measured/provisional block shapes
    auto_bm = block_m is None
    if auto_bm:
        block_m = 256
    auto_bn = block_n is None
    block_n = _choose_block(n, cd["minner_bn"] if auto_bn else block_n, 128)
    auto_bk = block_k is None
    requested_bk = cd["gemv_bk"] if auto_bk else block_k
    # scale sublane quantum: 8 rows f32, 16 rows bf16 (compact scales)
    sq = 16 if scale.dtype == jnp.bfloat16 else 8
    # the m-inner (GEMM) path K-blocks its scale tile -> sq*blocksize
    # quantum; the m-outer path below re-picks with the finer window chooser
    block_k = _k_block_pairk(k, requested_bk, blocksize, sq)
    min_m = 8 if compute_dtype == jnp.float32 else 16
    if m < min_m:
        # full-dim M block: no masked rows and 1/8th the accumulator work
        # (decode GEMV: bm=1 measured 8us/call faster than a masked bm=8)
        block_m = m
    else:
        block_m = min(block_m, min_m * pl.cdiv(m, min_m))
        if compute_dtype == jnp.bfloat16 and m > 8 * min_m and block_m >= m:
            # a single M block would force the m-outer path (64-deep
            # per-quant-block dots, ~50% MXU): split M so the decode-once
            # m-inner kernel engages (M=256 @ 4096x14336: 304us vs single-
            # block m-outer ~330us).  bf16 only: the f32 path's HIGHEST-
            # precision dots make the m-inner full-depth dots slower, not
            # faster (measured 1.6x worse on the f32 sanity MLP).
            block_m = min_m * pl.cdiv(pl.cdiv(m, 2), min_m)
    # no explicit M padding: Pallas masks partial edge blocks (an extra
    # jnp.pad + output slice costs ~12us per call on v5e)
    mp = m
    nk = k // block_k
    nm = pl.cdiv(m, block_m)

    has_bias = bias is not None
    bias = jnp.zeros((1, n), jnp.float32) if bias is None else bias.reshape(1, n)
    # decode table: bf16 bit patterns for "lut", dummy otherwise (a fixed
    # operand keeps one kernel signature for all variants)
    tab = make_pairk_lut(codebook) if variant == "lut" else jnp.zeros((1, 128), jnp.int32)
    cost = pl.CostEstimate(
        flops=2 * mp * k * n,
        bytes_accessed=kp * n + (k // blocksize) * n * 4 + mp * k * x.dtype.itemsize,
        transcendentals=0,
    )
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 2**20,
    )
    if a8 is None:
        # auto: the int8 path wins where the GEMM is MXU-bound — measured
        # (benchmarks/w4a8_bench.py, 4096x14336): M=2048 a8 981-995us =
        # 242-245 TFLOP/s = 1.23-1.32x XLA dense bf16 (bf16 fused path:
        # 0.89x), M=1024 1.07x dense, M=512 ties the bf16 fused path
        # (cross-session median); threshold per chip (a8_min_m)
        a8 = m >= cd["a8_min_m"] and compute_dtype == jnp.bfloat16 and variant != "lut"
    elif a8:
        if compute_dtype != jnp.bfloat16:
            raise ValueError("a8=True requires bf16 compute (f32 keeps full-precision dots)")
        if variant == "lut":
            raise ValueError("a8 requires an FP4-family variant (lut codebook range is data)")

    # m-innermost when several M blocks share the weights: decode once per
    # weight tile.  Needs a full-M f32 accumulator stripe in VMEM.  The a8
    # path also engages at nm == 1 (M = 128-256 single M block): its win is
    # the int8 MXU rate, not only decode amortization.
    if (nm > 1 or a8) and nm * block_m * block_n * 4 <= 48 * 2**20:
        if auto_bk:
            # deeper K blocks amortize per-tile decode (bf16 path: 1024
            # measured ~2% over 512).  The a8 path prefers 2048: its
            # decode+requant pass is costlier per tile, and bk=2048/bn=2048
            # ranked ~10% over bk=1024 in two independent sessions
            # (benchmarks/w4a8_sweep.py M=2048: 921 vs >=995us;
            # w4a8_validate.py: 956 vs 1085us; single-session deltas under
            # ~13% are chip noise, so only the cross-session consensus moved
            # this default).
            block_k = _k_block_pairk(
                k, cd["minner_bk_a8"] if a8 else cd["minner_bk"], blocksize, sq)
            nk = k // block_k
        if a8:
            if auto_bm:
                # a8 prefers DEEP M blocks (bm512+bk1024 measured ~4% over
                # bm256+bk2048 at M=2048, two sessions — see chip table),
                # and nm == 1 is fine for this path
                block_m = min(cd["minner_bm_a8"], 32 * pl.cdiv(m, 32))
                nm = pl.cdiv(m, block_m)
            # int8 x blocks want 32-sublane multiples (or the full-M block)
            if block_m < m and block_m % 32:
                block_m = 32 * pl.cdiv(block_m, 32)
                nm = pl.cdiv(m, block_m)
            # pre-quantize activations ONCE in XLA (per row, per K-tile):
            # the kernel consumed r = max|x| per (row, K-tile) at every
            # (j, kk, mi) step before — n/block_n redundant cross-lane
            # reductions per tile — and streamed x in bf16; now it streams
            # int8 and multiplies by the precomputed r/127.
            xr = x.astype(jnp.float32).reshape(m, nk, block_k)
            r = jnp.max(jnp.abs(xr), axis=2)
            r = jnp.where(r == 0.0, 1.0, r)
            x = jnp.round(xr * (127.0 / r)[:, :, None]).astype(jnp.int8).reshape(m, k)
            rs = r * (1.0 / 127.0)  # (m, nk) f32
            kern = functools.partial(
                _matmul_pk_w4a8_kernel,
                blocksize=blocksize, nk=nk, out_dtype=out_dtype,
                has_bias=has_bias, block_m=block_m, variant=variant,
            )
            scratches = [
                pltpu.VMEM((nm * block_m, block_n), jnp.float32),
                pltpu.VMEM((block_k, block_n), jnp.int8),
                pltpu.VMEM((1, block_n), jnp.float32),
            ]
        else:
            kern = functools.partial(
                _matmul_pk_minner_kernel,
                blocksize=blocksize, nk=nk, out_dtype=out_dtype,
                compute_dtype=compute_dtype, has_bias=has_bias, block_m=block_m,
                variant=variant,
            )
            scratches = [
                pltpu.VMEM((nm * block_m, block_n), jnp.float32),
                pltpu.VMEM((block_k, block_n), jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32),
            ]
        if expert is None:
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.VMEM),  # decode table (1, 128)
                pl.BlockSpec((block_m, block_k), lambda j, kk, mi: (mi, kk), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_k // 2, block_n), lambda j, kk, mi: (kk, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_k // blocksize, block_n), lambda j, kk, mi: (kk, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda j, kk, mi: (0, j), memory_space=pltpu.VMEM),
            ]
            operands = [tab, x, packed, scale, bias]
            if a8:
                # full-nk lane dim (legal for any nk); the kernel selects
                # this step's column with an iota mask
                in_specs.append(
                    pl.BlockSpec((block_m, nk), lambda j, kk, mi: (mi, 0), memory_space=pltpu.VMEM)
                )
                operands.append(rs)
            out = pl.pallas_call(
                kern,
                grid=(n // block_n, nk, nm),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((block_m, block_n), lambda j, kk, mi: (mi, j), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
                scratch_shapes=scratches,
                cost_estimate=cost,
                compiler_params=cparams,
                interpret=interpret,
            )(*operands)
        else:
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.VMEM),  # decode table (1, 128)
                pl.BlockSpec((block_m, block_k), lambda j, kk, mi, e: (mi, kk)),
                pl.BlockSpec((1, block_k // 2, block_n), lambda j, kk, mi, e: (e[0], kk, j)),
                pl.BlockSpec((1, block_k // blocksize, block_n), lambda j, kk, mi, e: (e[0], kk, j)),
                pl.BlockSpec((1, block_n), lambda j, kk, mi, e: (0, j)),
            ]
            operands = [jnp.asarray(expert, jnp.int32).reshape(1), tab, x, packed, scale, bias]
            if a8:
                in_specs.append(pl.BlockSpec((block_m, nk), lambda j, kk, mi, e: (mi, 0)))
                operands.append(rs)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n // block_n, nk, nm),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((block_m, block_n), lambda j, kk, mi, e: (mi, j)),
                scratch_shapes=scratches,
            )
            out = pl.pallas_call(
                _expertify(kern),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
                cost_estimate=cost,
                compiler_params=cparams,
                interpret=interpret,
            )(*operands)
        return out[:m]

    # m-outer path: block_k is free of the scale-tile quantum (the scale
    # arrives in 8-row-aligned windows) — re-pick it with the finer chooser.
    # Multi-row bf16 (batched decode M=2..128): deeper K and wider N tiles
    # measured +17-23% GB/s over 512/2048 at M=8..32 on every decode matmul
    # shape and still >= it at M=64/128, two independent sessions
    # (benchmarks/smallm_sweep.py; gate/up 559->664, down 528->618 GB/s at
    # M=16).  bn request 4096 resolves per-N: 14336->3584, 4096->4096.
    # Single-row and f32 calls keep the GEMV-era 512/2048 defaults.
    if compute_dtype == jnp.bfloat16 and m >= 2:
        if auto_bk:
            requested_bk = cd["mouter_bk"]
        if auto_bn:
            block_n = _choose_block(n, cd["mouter_bn"], 128)
    block_k = _k_block_stripe(k, requested_bk, blocksize)
    nk = k // block_k
    sblk = block_k // blocksize
    # scale window: this step's rows padded out to the 8-sublane quantum;
    # full-K fallback shards keep their whole (possibly <8-row) scale block
    s_rows = sblk if block_k == k else max(sq, sblk)
    kern = functools.partial(
        _matmul_pk_kernel,
        blocksize=blocksize,
        nk=nk,
        out_dtype=out_dtype,
        compute_dtype=compute_dtype,
        has_bias=has_bias,
        variant=variant,
    )
    if expert is None:
        out = pl.pallas_call(
            kern,
            grid=(nm, n // block_n, nk),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # decode table (1, 128)
                pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_k // 2, block_n), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (s_rows, block_n),
                    lambda i, j, kk, sblk=sblk, s_rows=s_rows: (kk * sblk // s_rows, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 2**20,
            ),
            interpret=interpret,
        )(tab, x, packed, scale, bias)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nm, n // block_n, nk),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # decode table (1, 128)
                pl.BlockSpec((block_m, block_k), lambda i, j, kk, e: (i, kk)),
                pl.BlockSpec((1, block_k // 2, block_n), lambda i, j, kk, e: (e[0], kk, j)),
                pl.BlockSpec(
                    (1, s_rows, block_n),
                    lambda i, j, kk, e, sblk=sblk, s_rows=s_rows: (e[0], kk * sblk // s_rows, j),
                ),
                pl.BlockSpec((1, block_n), lambda i, j, kk, e: (0, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk, e: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        )
        out = pl.pallas_call(
            _expertify(kern),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 2**20,
            ),
            interpret=interpret,
        )(jnp.asarray(expert, jnp.int32).reshape(1), tab, x, packed, scale, bias)
    return out[:m]


def gemv_fp4_pk(x, packed, scale, bias=None, codebook=None, *, blocksize=64, out_dtype=None, block_k=None, block_n=None, interpret=None, variant):
    """Batch-1 pair-K decode fast path (v5e sweet spot: block_k 512, widest N
    block that fits — per-chip via chip_defaults()).  Measured 4096x14336 vs
    153.5us bf16 matvec: 93.5us exact / 73.7us zramp / 50.7us ramp (see
    _decode_pairs)."""
    if x.shape[0] != 1:
        raise ValueError(f"gemv_fp4_pk is the batch-1 fast path; got x.shape={x.shape} (use matmul_fp4_pk)")
    cd = chip_defaults()
    if block_k is None:
        block_k = cd["gemv_bk"]
    if block_n is None:
        block_n = cd["gemv_bn"]
    return matmul_fp4_pk(
        x, packed, scale, bias, codebook,
        blocksize=blocksize, out_dtype=out_dtype,
        block_m=8, block_k=block_k, block_n=block_n, interpret=interpret,
        variant=variant,
    )


def _dequant_pk_kernel(tab_ref, p_ref, s_ref, o_ref, *, blocksize, out_dtype, variant):
    w = _pairs_weight_tile(p_ref, jnp.float32, variant, tab_ref)  # (BK, BN) 192*code, f32 exact
    s = jnp.repeat(s_ref[:], blocksize, axis=0)  # (BK, BN)
    o_ref[:] = (w * s).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("blocksize", "out_dtype", "block_k", "block_n", "interpret", "variant"),
)
def dequantize_tpu_pk(packed, scale, codebook=None, *, blocksize=64, out_dtype=jnp.bfloat16, block_k=1024, block_n=1024, interpret=None, variant):
    """Materialize Wt (K, N) from the pair-K layout (golden:
    ops/format.unpack_tpu_pairk)."""
    if interpret is None:
        interpret = _interpret_default()
    kp, n = packed.shape
    k = 2 * kp
    assert scale.shape == (k // blocksize, n)
    block_n = _choose_block(n, block_n, 128)
    sq = 16 if scale.dtype == jnp.bfloat16 else 8
    block_k = _k_block_pairk(k, block_k, blocksize, sq)
    grid = (kp // (block_k // 2), n // block_n)
    tab = make_pairk_lut(codebook) if variant == "lut" else jnp.zeros((1, 128), jnp.int32)
    kern = functools.partial(_dequant_pk_kernel, blocksize=blocksize, out_dtype=out_dtype, variant=variant)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # decode table (1, 128)
            pl.BlockSpec((block_k // 2, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k // blocksize, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_k, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(tab, packed, scale)


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
