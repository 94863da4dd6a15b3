"""Checkpoint-scale quantize+pack (torch-accelerated, golden-equivalent).

ops/format.py is the executable spec (pure numpy, clear, slow); this module
is the production path for converting billions of weights.  It produces
bit-identical output to :func:`torch_bnb_fp4_tpu.ops.format.pack_tpu_sharded`
(tested in tests/test_convert.py) using torch CPU ops.

Replaces the reference's convert-on-every-boot flow (model surgery +
bnb quantize at load, torch_bnb_fp4/__init__.py:781-922) with an offline
tool per SURVEY.md §5 (checkpoint/resume row).
"""

from __future__ import annotations

import numpy as np

from ..ops import format as fmt


def _nearest_codes_torch(normed, code: np.ndarray):
    """torch equivalent of the golden 15-midpoint nearest-entry search."""
    import torch

    order = np.argsort(code, kind="stable").astype(np.uint8)
    sorted_code = code[order]
    mids = torch.from_numpy((sorted_code[1:] + sorted_code[:-1]) / 2)
    # bucketize(right=False): count of boundaries strictly below x — the same
    # tie rule as the golden model's (x > m) sum.
    idx = torch.bucketize(normed, mids, right=False)
    return torch.from_numpy(order)[idx]


def quantize_pack_sharded(
    w: np.ndarray,
    blocksize: int = 64,
    code: np.ndarray = fmt.FP4_CODE,
    k_shards: int = 1,
):
    """Fast bit-identical equivalent of ``fmt.pack_tpu_sharded``.

    ``w``: (n_out, k_in) float array.  Returns (packed uint8 (K//2, N),
    absmax_hi f32, absmax_lo f32).
    """
    import torch

    w = np.ascontiguousarray(w, dtype=np.float32)
    n_out, k_in = w.shape
    if k_in % (k_shards * 2 * blocksize) != 0:
        raise ValueError(f"K={k_in} not divisible by k_shards*2*blocksize")
    t = torch.from_numpy(w)
    blocks = t.view(n_out, k_in // blocksize, blocksize)
    absmax = blocks.abs().amax(dim=2)  # (N, K/bs)
    safe = torch.where(absmax == 0, torch.ones_like(absmax), absmax)
    normed = blocks / safe.unsqueeze(2)
    codes = _nearest_codes_torch(normed.reshape(n_out, k_in), code)  # (N, K) u8

    codes_t = codes.T.contiguous()  # (K, N)
    absmax_t = absmax.T.contiguous()  # (K/bs, N)
    k_loc = k_in // k_shards
    kp_loc = k_loc // 2
    s_loc = k_loc // blocksize
    packed_parts, hi_parts, lo_parts = [], [], []
    for d in range(k_shards):
        c = codes_t[d * k_loc : (d + 1) * k_loc]
        packed_parts.append((c[:kp_loc] << 4) | c[kp_loc:])
        a = absmax_t[d * s_loc : (d + 1) * s_loc]
        hi_parts.append(a[: s_loc // 2])
        lo_parts.append(a[s_loc // 2 :])
    packed = torch.cat(packed_parts, dim=0).numpy()
    hi = torch.cat(hi_parts, dim=0).numpy().astype(np.float32)
    lo = torch.cat(lo_parts, dim=0).numpy().astype(np.float32)
    return packed, hi, lo


def quantize_pack_pairk(w: np.ndarray, blocksize: int = 64, variant: str = "exact", scale_dtype=np.float32):
    """Fast bit-identical equivalent of ``fmt.pack_tpu_pairk``.

    Returns (packed uint8 (K/2, N) rank-coded pair-K bytes,
    scale (K/bs, N) = absmax/192 in ``scale_dtype``).  ``variant``: stored
    codebook (ops/format.PAIRK_MAGS192).  bf16 scales re-quantize codes
    against the rounded scale, exactly like pack_tpu_pairk.

    Dispatches to the native C packer (csrc/qpack.c, ~20x) when a compiler
    is present; the torch path below is the portable fallback.  Both are
    bit-identical to the golden (tests/test_native.py, tests/test_convert.py).
    """
    from . import native

    if native.available():
        return native.quantize_pack_pairk_native(w, blocksize, variant, scale_dtype)
    import torch

    w = np.ascontiguousarray(w, dtype=np.float32)
    n_out, k_in = w.shape
    if k_in % (2 * blocksize) != 0:
        raise ValueError(f"K={k_in} not divisible by 2*blocksize")
    scale_dtype = np.dtype(scale_dtype)
    t = torch.from_numpy(w)
    blocks = t.view(n_out, k_in // blocksize, blocksize)
    absmax = blocks.abs().amax(dim=2)
    if scale_dtype == fmt._BF16:
        # round the stored scale first (same RNE rounding as ml_dtypes), then
        # quantize codes against the rounded value
        rounded = (absmax / fmt.PAIRK_VALUE_SCALE).to(torch.bfloat16).float()
        absmax = rounded * fmt.PAIRK_VALUE_SCALE
    elif scale_dtype != np.dtype(np.float32):
        raise ValueError(f"scale_dtype must be float32 or bfloat16, got {scale_dtype}")
    safe = torch.where(absmax == 0, torch.ones_like(absmax), absmax)
    normed = blocks / safe.unsqueeze(2)
    if variant == "exact":
        codes = _nearest_codes_torch(normed.reshape(n_out, k_in), fmt.FP4_CODE)
        codes = torch.from_numpy(fmt.RANK_REMAP)[codes.long()]
    else:
        codes = _nearest_codes_torch(normed.reshape(n_out, k_in), fmt.pairk_code(variant))
    ct = codes.T.contiguous()  # (K, N)
    packed = ((ct[1::2] << 4) | ct[0::2]).numpy().astype(np.uint8)
    scale = (absmax.T.contiguous().numpy() / fmt.PAIRK_VALUE_SCALE).astype(scale_dtype)
    return packed, scale


def quantize_pack_pairk_lut(w: np.ndarray, codebook: np.ndarray, blocksize: int = 64):
    """Fast bit-identical equivalent of ``fmt.pack_tpu_pairk_lut``: rank-pack
    against an arbitrary sorted 16-entry codebook (NF4).  Native C path when
    available (csrc/qpack.c), torch fallback below."""
    from . import native

    if native.available():
        return native.quantize_pack_pairk_lut_native(w, codebook, blocksize)
    import torch

    w = np.ascontiguousarray(w, dtype=np.float32)
    code = np.asarray(codebook, np.float32)
    if code.shape != (16,) or not np.all(np.diff(code) > 0):
        raise ValueError("codebook must be 16 strictly-increasing entries")
    n_out, k_in = w.shape
    if k_in % (2 * blocksize) != 0:
        raise ValueError(f"K={k_in} not divisible by 2*blocksize")
    code_bf = code.astype(fmt._BF16).astype(np.float32)
    t = torch.from_numpy(w)
    blocks = t.view(n_out, k_in // blocksize, blocksize)
    absmax = blocks.abs().amax(dim=2)
    safe = torch.where(absmax == 0, torch.ones_like(absmax), absmax)
    normed = blocks / safe.unsqueeze(2)
    codes = _nearest_codes_torch(normed.reshape(n_out, k_in), code_bf)
    ct = codes.T.contiguous()  # (K, N)
    packed = ((ct[1::2] << 4) | ct[0::2]).numpy().astype(np.uint8)
    scale = np.ascontiguousarray(absmax.T.contiguous().numpy())
    return packed, scale


def repack_k_shards(
    packed: np.ndarray,
    absmax_hi: np.ndarray,
    absmax_lo: np.ndarray,
    blocksize: int,
    old_shards: int,
    new_shards: int,
):
    """Re-pair nibbles for a different row-parallel width — exact (codes and
    absmax grid unchanged, only the hi/lo pairing moves).  Lets one stored
    checkpoint serve any tp width at load time."""
    if old_shards == new_shards:
        return packed, absmax_hi, absmax_lo
    kp, n = packed.shape
    k = 2 * kp
    if k % (new_shards * 2 * blocksize):
        raise ValueError(f"K={k} not divisible for k_shards={new_shards}")
    # back to true Wt row order
    kp_loc_o = kp // old_shards
    codes = np.empty((k, n), np.uint8)
    amax = np.empty((k // blocksize, n), np.float32)
    s_loc_o = kp_loc_o // blocksize
    for d in range(old_shards):
        p = packed[d * kp_loc_o : (d + 1) * kp_loc_o]
        base = d * 2 * kp_loc_o
        codes[base : base + kp_loc_o] = p >> 4
        codes[base + kp_loc_o : base + 2 * kp_loc_o] = p & 0xF
        ab = base // blocksize
        amax[ab : ab + s_loc_o] = absmax_hi[d * s_loc_o : (d + 1) * s_loc_o]
        amax[ab + s_loc_o : ab + 2 * s_loc_o] = absmax_lo[d * s_loc_o : (d + 1) * s_loc_o]
    # re-pair for the new width
    k_loc = k // new_shards
    kp_loc = k_loc // 2
    s_loc = k_loc // blocksize
    out = np.empty_like(packed)
    hi = np.empty((kp // blocksize, n), np.float32)
    lo = np.empty((kp // blocksize, n), np.float32)
    for d in range(new_shards):
        c = codes[d * k_loc : (d + 1) * k_loc]
        out[d * kp_loc : (d + 1) * kp_loc] = (c[:kp_loc] << 4) | c[kp_loc:]
        a = amax[d * s_loc : (d + 1) * s_loc]
        hi[d * (s_loc // 2) : (d + 1) * (s_loc // 2)] = a[: s_loc // 2]
        lo[d * (s_loc // 2) : (d + 1) * (s_loc // 2)] = a[s_loc // 2 :]
    return out, hi, lo
