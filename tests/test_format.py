"""Tests for the FP4 format golden model (torch_bnb_fp4_tpu/ops/format.py).

The acceptance band 0.045-0.065 mean |diff| comes from the reference
(sanity_check.py:177-179, README.md:90-91).
"""

import numpy as np
import pytest

from torch_bnb_fp4_tpu.ops import format as fmt


def test_codebook_values():
    # Exact constants from reference csrc/dequant_fp4_optimized.cu:28-46.
    assert fmt.FP4_CODE.shape == (16,)
    np.testing.assert_allclose(fmt.FP4_CODE[1], 5.208333e-03, rtol=1e-6)
    np.testing.assert_allclose(fmt.FP4_CODE[3], 1.0)
    # bit 3 is the sign: entries 8..15 negate entries 0..7
    np.testing.assert_array_equal(fmt.FP4_CODE[8:], -fmt.FP4_CODE[:8])


def test_pack_unpack_roundtrip(rng):
    codes = rng.integers(0, 16, size=1024).astype(np.uint8)
    packed = fmt.pack_flat(codes)
    assert packed.dtype == np.uint8 and packed.size == 512
    np.testing.assert_array_equal(fmt.unpack_flat(packed), codes)


def test_pack_high_nibble_first():
    codes = np.array([0xA, 0x3], dtype=np.uint8)
    assert fmt.pack_flat(codes)[0] == 0xA3


def test_quantize_dequantize_exact_on_codebook_points(rng):
    # Values that ARE codebook points times a scale must roundtrip exactly.
    absmax_true = 3.7
    codes_true = rng.integers(0, 16, size=256).astype(np.uint8)
    w = fmt.FP4_CODE[codes_true] * absmax_true
    # force at least one full-scale element per block so absmax is exact
    w = w.reshape(-1, 64)
    w[:, 0] = absmax_true
    w = w.reshape(-1)
    packed, absmax = fmt.quantize_fp4(w, blocksize=64)
    out = fmt.dequantize_fp4(packed, absmax, w.shape, blocksize=64)
    np.testing.assert_allclose(out, w, rtol=1e-6, atol=1e-7)


def test_error_band_matches_reference(rng):
    # Gaussian weights, the reference's error envelope: mean |dequant - orig|
    # relative... the reference measures layer-output diff; here we check the
    # raw weight quantization error is small and deterministic.
    w = rng.standard_normal(64 * 1024).astype(np.float32)
    packed, absmax = fmt.quantize_fp4(w)
    out = fmt.dequantize_fp4(packed, absmax, w.shape)
    err = np.abs(out - w).mean()
    assert err < 0.2  # FP4 weight-space error for unit-variance gaussians
    assert not np.isnan(out).any()


def test_zero_block():
    w = np.zeros(128, dtype=np.float32)
    packed, absmax = fmt.quantize_fp4(w)
    np.testing.assert_array_equal(absmax, np.zeros(2, dtype=np.float32))
    out = fmt.dequantize_fp4(packed, absmax, w.shape)
    np.testing.assert_array_equal(out, w)


@pytest.mark.parametrize("blocksize", [32, 64, 128])
def test_blocksizes(rng, blocksize):
    w = rng.standard_normal(blocksize * 8).astype(np.float32)
    packed, absmax = fmt.quantize_fp4(w, blocksize=blocksize)
    assert absmax.shape == (8,)
    out = fmt.dequantize_fp4(packed, absmax, w.shape, blocksize=blocksize)
    assert np.abs(out - w).mean() < 0.3


def test_tpu_layout_matches_flat(rng):
    n_out, k_in = 256, 512
    w = rng.standard_normal((n_out, k_in)).astype(np.float32)
    # golden flat dequant
    packed_flat, absmax_flat = fmt.quantize_fp4(w)
    w_deq_flat = fmt.dequantize_fp4(packed_flat, absmax_flat, (n_out, k_in))
    # TPU layout dequant must produce the identical values (transposed)
    packed_t, absmax_t = fmt.pack_tpu(w)
    assert packed_t.shape == (k_in // 2, n_out)
    assert absmax_t.shape == (k_in // 64, n_out)
    wt_deq = fmt.unpack_tpu(packed_t, absmax_t)
    np.testing.assert_allclose(wt_deq, w_deq_flat.T, rtol=1e-6, atol=1e-7)


def test_tpu_layout_from_bnb_is_exact(rng):
    n_out, k_in = 128, 256
    w = rng.standard_normal((n_out, k_in)).astype(np.float32)
    packed_flat, absmax_flat = fmt.quantize_fp4(w)
    packed_t, absmax_t = fmt.tpu_layout_from_bnb(packed_flat, absmax_flat, (n_out, k_in))
    ref_packed, ref_absmax = fmt.pack_tpu(w)
    np.testing.assert_array_equal(packed_t, ref_packed)
    np.testing.assert_array_equal(absmax_t, ref_absmax)


def test_nf4_codebook(rng):
    w = rng.standard_normal(4096).astype(np.float32)
    packed, absmax = fmt.quantize_fp4(w, code=fmt.NF4_CODE)
    out = fmt.dequantize_fp4(packed, absmax, w.shape, code=fmt.NF4_CODE)
    # NF4 is tuned for gaussians: tighter error than FP4
    packed_fp4, absmax_fp4 = fmt.quantize_fp4(w)
    out_fp4 = fmt.dequantize_fp4(packed_fp4, absmax_fp4, w.shape)
    assert np.abs(out - w).mean() < np.abs(out_fp4 - w).mean()
