"""Property-based tests of the format layer (pure numpy golden model).

The reference has no property testing at all (SURVEY.md §4); these pin the
quantizer's invariants across random shapes, blocksizes, codebook variants,
and adversarial values (zeros, denormal-scale blocks, +-absmax ties).
"""

import ml_dtypes
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from torch_bnb_fp4_tpu.ops import format as fmt

_BLOCKSIZES = st.sampled_from([32, 64, 128])
_VARIANTS = st.sampled_from(list(fmt.PAIRK_VARIANTS))


def _weights(draw, bs):
    n_out = draw(st.integers(1, 6)) * 8
    k_blocks = draw(st.integers(1, 6))
    k_in = k_blocks * 2 * bs  # pairk requires K % 2*bs == 0
    kind = draw(st.sampled_from(["normal", "zeros", "mixed", "huge", "tiny"]))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    if kind == "normal":
        w = rng.standard_normal((n_out, k_in)) * draw(st.floats(1e-3, 10.0))
    elif kind == "zeros":
        w = np.zeros((n_out, k_in))
    elif kind == "mixed":
        w = rng.standard_normal((n_out, k_in))
        w[::2] = 0.0  # alternating all-zero rows -> all-zero blocks
    elif kind == "huge":
        w = rng.standard_normal((n_out, k_in)) * 1e30
    else:
        w = rng.standard_normal((n_out, k_in)) * 1e-30
    return w.astype(np.float32)


@settings(max_examples=40, deadline=None)
@given(st.data(), _BLOCKSIZES, _VARIANTS)
def test_pairk_roundtrip_error_bounded(data, bs, variant):
    """dequant(quant(w)) is within half the largest codebook gap of w,
    relative to each block's absmax — for every variant and blocksize,
    including all-zero / huge / denormal blocks."""
    w = _weights(data.draw, bs)
    packed, scale = fmt.pack_tpu_pairk(w, blocksize=bs, variant=variant)
    wt = fmt.unpack_tpu_pairk(packed, scale, blocksize=bs, variant=variant)
    assert np.isfinite(wt).all()
    back = wt.T  # (N, K)
    blocks = w.reshape(w.shape[0], -1, bs)
    absmax = np.abs(blocks).max(axis=2, keepdims=True)
    # worst-case normalized quantization error: half the widest gap between
    # adjacent codebook levels (ramp's widest gap is 1/3 at the top end),
    # plus one bf16-ish ulp of scale rounding
    gaps = np.diff(np.sort(fmt.pairk_code(variant)))
    tol = gaps.max() / 2 + 1e-6
    err = np.abs(back.reshape(blocks.shape) - blocks)
    lim = absmax * tol + 1e-30
    assert (err <= lim + absmax * 1e-6).all()


@settings(max_examples=40, deadline=None)
@given(st.data(), _BLOCKSIZES, _VARIANTS)
def test_pairk_idempotent(data, bs, variant):
    """Quantizing an already-quantized weight is exact (every stored value is
    a representable codebook point of its own block)."""
    w = _weights(data.draw, bs)
    packed, scale = fmt.pack_tpu_pairk(w, blocksize=bs, variant=variant)
    wq = np.ascontiguousarray(fmt.unpack_tpu_pairk(packed, scale, blocksize=bs, variant=variant).T)
    p2, s2 = fmt.pack_tpu_pairk(wq, blocksize=bs, variant=variant)
    wq2 = fmt.unpack_tpu_pairk(p2, s2, blocksize=bs, variant=variant)
    np.testing.assert_allclose(wq2, wq.T, rtol=1e-6, atol=1e-30)


@settings(max_examples=30, deadline=None)
@given(st.data(), _VARIANTS)
def test_fast_pack_matches_golden(data, variant):
    """The torch-accelerated production packer is bit-identical to the numpy
    golden for random inputs (not just the fixed-seed unit test)."""
    from torch_bnb_fp4_tpu.convert import quantize_pack_pairk

    w = _weights(data.draw, 64)
    for sdt in (np.float32, ml_dtypes.bfloat16):
        gp, gs = fmt.pack_tpu_pairk(w, variant=variant, scale_dtype=sdt)
        fp, fs = quantize_pack_pairk(w, variant=variant, scale_dtype=sdt)
        np.testing.assert_array_equal(gp, fp)
        np.testing.assert_array_equal(gs.view(np.uint16), fs.view(np.uint16))
    # LUT packer parity (arbitrary codebook path, NF4)
    from torch_bnb_fp4_tpu.convert import quantize_pack_pairk_lut
    gp, gs = fmt.pack_tpu_pairk_lut(w, fmt.NF4_CODE)
    fp, fs = quantize_pack_pairk_lut(w, fmt.NF4_CODE)
    np.testing.assert_array_equal(gp, fp)
    np.testing.assert_array_equal(gs, fs)


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_bnb_flat_roundtrip(data):
    """bnb flat layout (exact FP4): pack/unpack round-trips the codes, and
    the TPU layout conversion from bnb state is code-exact."""
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    n_out = data.draw(st.integers(1, 5)) * 2
    k_in = data.draw(st.integers(1, 5)) * 128
    w = (rng.standard_normal((n_out, k_in)) * 0.2).astype(np.float32)
    packed, absmax = fmt.quantize_fp4(w)
    deq = fmt.dequantize_fp4(packed, absmax, (n_out, k_in))
    tp_packed, tp_absmax = fmt.tpu_layout_from_bnb(packed, absmax, (n_out, k_in))
    deq_tp = fmt.unpack_tpu(tp_packed, tp_absmax)
    np.testing.assert_array_equal(deq, deq_tp.T)


@settings(max_examples=8, deadline=None)
@given(st.data())
@pytest.mark.slow
def test_apply_linear_arbitrary_shapes(data):
    """quantize_linear + apply_linear handle arbitrary (unaligned) n_out/k_in
    via padding, for every variant, on GEMV and GEMM dispatch paths
    (interpret-mode kernels)."""
    import jax.numpy as jnp

    from torch_bnb_fp4_tpu.models import linear as L

    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    n_out = data.draw(st.integers(3, 200))
    k_in = data.draw(st.integers(1, 5)) * 64  # blocksize-aligned (bnb semantics)
    variant = data.draw(st.sampled_from(list(fmt.PAIRK_VARIANTS)))
    m = data.draw(st.sampled_from([1, 3]))
    w = (rng.standard_normal((n_out, k_in)) * 0.1).astype(np.float32)
    q = L.quantize_linear(w, variant=variant)
    wt = np.asarray(L.dequantize_weight(q, out_dtype=jnp.float32, interpret=True))
    x = rng.standard_normal((m, k_in)).astype(np.float32)
    y = np.asarray(q(jnp.asarray(x), interpret=True))
    assert y.shape == (m, n_out)
    np.testing.assert_allclose(y, x @ wt.T, rtol=1e-4, atol=1e-4)


def test_bf16_scale_pack_roundtrip_error_bound():
    """bf16 scales: codes are re-quantized against the ROUNDED scale, so the
    roundtrip error stays within ~1 bf16 ulp of the f32-scale pack's."""
    rng = np.random.default_rng(5)
    w = (rng.standard_normal((64, 1024)) * 0.07).astype(np.float32)
    for variant in ("ramp", "exact"):
        p32, s32 = fmt.pack_tpu_pairk(w, variant=variant)
        pbf, sbf = fmt.pack_tpu_pairk(w, variant=variant, scale_dtype=ml_dtypes.bfloat16)
        assert sbf.dtype == np.dtype(ml_dtypes.bfloat16)
        e32 = np.abs(fmt.unpack_tpu_pairk(p32, s32, variant=variant).T - w).mean()
        ebf = np.abs(fmt.unpack_tpu_pairk(pbf, sbf, variant=variant).T - w).mean()
        assert ebf <= e32 * 1.01, (variant, ebf, e32)
