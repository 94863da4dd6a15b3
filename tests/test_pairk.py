"""Pair-K layout tests: golden exactness (all 256 bytes), kernel vs golden,
layer forward, layout equivalence with split-K, TP contiguous sharding,
checkpoint round-trip."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_bnb_fp4_tpu.models import linear as L
from torch_bnb_fp4_tpu.ops import format as fmt
from torch_bnb_fp4_tpu.ops import kernels as K


def test_rank_remap_involution():
    r = fmt.RANK_REMAP
    np.testing.assert_array_equal(r[r], np.arange(16))


def test_exact_pairk_code_is_rank_remapped_fp4():
    np.testing.assert_array_equal(fmt.pairk_code("exact"), fmt.FP4_CODE[fmt.RANK_REMAP])


@pytest.mark.parametrize("variant", fmt.PAIRK_VARIANTS)
def test_decode_pairs_exact_all_bytes(variant):
    """All 256 bytes decode to the bf16 bits of 192*pairk_code(variant)[nib]
    in every decode variant (7/12/16-op kernels)."""
    import ml_dtypes

    bits = np.asarray(K._decode_pairs(jnp.arange(256, dtype=jnp.int32).reshape(8, 32), variant))
    bits = bits.view(np.uint32).reshape(-1)
    u16 = np.stack([bits & 0xFFFF, bits >> 16], -1).astype(np.uint16)
    vals = u16.view(ml_dtypes.bfloat16).astype(np.float32)
    b = np.arange(256)
    code192 = 192.0 * fmt.pairk_code(variant)
    np.testing.assert_array_equal(vals[:, 0], code192[b & 0xF])
    np.testing.assert_array_equal(vals[:, 1], code192[b >> 4])


def test_pack_unpack_pairk_roundtrip(rng):
    w = (rng.standard_normal((96, 1024)) * 0.1).astype(np.float32)
    packed, scale = fmt.pack_tpu_pairk(w)
    wt = fmt.unpack_tpu_pairk(packed, scale)
    assert wt.shape == (1024, 96)
    # agrees with the split-K golden up to one f32 rounding of absmax/192
    wt_ref = fmt.unpack_tpu(*fmt.pack_tpu(w))
    np.testing.assert_allclose(wt, wt_ref, rtol=3e-7, atol=1e-12)


@pytest.mark.parametrize("out_dtype", [jnp.float32, jnp.bfloat16])
def test_dequantize_tpu_pk_exact(rng, out_dtype):
    w = (rng.standard_normal((128, 1024)) * 0.1).astype(np.float32)
    packed, scale = fmt.pack_tpu_pairk(w)
    golden = fmt.unpack_tpu_pairk(packed, scale)
    out = K.dequantize_tpu_pk(
        jnp.asarray(packed), jnp.asarray(scale), out_dtype=out_dtype, variant="exact", interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), golden.astype(np.asarray(out).dtype))


@pytest.mark.parametrize("m", [1, 5, 64])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_matmul_pk_matches_golden(rng, m, dtype):
    n_out, k_in = 256, 1024
    w = (rng.standard_normal((n_out, k_in)) * 0.05).astype(np.float32)
    packed, scale = fmt.pack_tpu_pairk(w)
    x = jnp.asarray(rng.standard_normal((m, k_in)) * 0.5, dtype)
    out = K.matmul_fp4_pk(x, jnp.asarray(packed), jnp.asarray(scale), variant="exact", interpret=True)
    assert out.shape == (m, n_out) and out.dtype == dtype
    golden = np.asarray(x, np.float32) @ fmt.unpack_tpu_pairk(packed, scale)
    np.testing.assert_allclose(np.asarray(out, np.float32), golden, rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_matmul_pk_m_inner_path(rng, dtype):
    """Several M blocks -> the decode-once m-innermost kernel; must match the
    m-outer path exactly (same dots, same order per block)."""
    n_out, k_in, m = 256, 1024, 64
    w = (rng.standard_normal((n_out, k_in)) * 0.05).astype(np.float32)
    packed, scale = fmt.pack_tpu_pairk(w)
    x = jnp.asarray(rng.standard_normal((m, k_in)) * 0.5, dtype)
    y_inner = K.matmul_fp4_pk(x, jnp.asarray(packed), jnp.asarray(scale), block_m=16, variant="exact", interpret=True)
    golden = np.asarray(x, np.float32) @ fmt.unpack_tpu_pairk(packed, scale)
    # m-inner pre-scales w (one extra rounding in compute dtype) vs the
    # m-outer integer-dot + partial-scale structure; near-zero outputs see
    # the bf16 w-rounding as absolute noise
    np.testing.assert_allclose(np.asarray(y_inner, np.float32), golden, rtol=2e-2, atol=1e-2)


def test_matmul_pk_bias(rng):
    n_out, k_in = 128, 512
    w = (rng.standard_normal((n_out, k_in)) * 0.05).astype(np.float32)
    bias = rng.standard_normal(n_out).astype(np.float32)
    packed, scale = fmt.pack_tpu_pairk(w)
    x = rng.standard_normal((4, k_in)).astype(np.float32)
    out = K.matmul_fp4_pk(jnp.asarray(x), jnp.asarray(packed), jnp.asarray(scale), jnp.asarray(bias), variant="exact", interpret=True)
    golden = x @ fmt.unpack_tpu_pairk(packed, scale) + bias
    np.testing.assert_allclose(np.asarray(out), golden, rtol=1e-5, atol=1e-5)


def test_quant_linear_pairk_default_and_matches_splitk(rng):
    n_out, k_in = 192, 1024
    w = (rng.standard_normal((n_out, k_in)) * 0.1).astype(np.float32)
    b = rng.standard_normal(n_out).astype(np.float32)
    qd = L.quantize_linear(w, b)  # defaults: pairk layout, ramp variant
    assert qd.layout == "pairk" and qd.absmax_lo is None and qd.variant == "ramp"
    # layout equivalence is an exact-variant property (splitk is FP4-coded)
    qp = L.quantize_linear(w, b, variant="exact")
    qs = L.quantize_linear(w, b, layout="splitk")
    for shape in ((1, k_in), (3, k_in), (2, 2, k_in)):
        x = rng.standard_normal(shape).astype(np.float32)
        yp = np.asarray(qp(jnp.asarray(x), interpret=True))
        ys = np.asarray(qs(jnp.asarray(x), interpret=True))
        # same codes; scale differs by one f32 rounding of absmax/192
        np.testing.assert_allclose(yp, ys, rtol=1e-4, atol=1e-5)
    # dequantize_weight parity
    wp = np.asarray(L.dequantize_weight(qp, out_dtype=jnp.float32, interpret=True))
    ws = np.asarray(L.dequantize_weight(qs, out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(wp, ws, rtol=3e-7, atol=1e-12)


@pytest.mark.parametrize("bs", [32, 128, 256])
def test_pairk_blocksizes(rng, bs):
    """bnb supports blocksizes beyond the default 64; the pairk layout and
    kernels must too (scale-tile quantum adapts: 8*blocksize)."""
    n_out, k_in = 128, 2048
    w = (rng.standard_normal((n_out, k_in)) * 0.1).astype(np.float32)
    q = L.quantize_linear(w, blocksize=bs)
    x = rng.standard_normal((3, k_in)).astype(np.float32)
    y = np.asarray(q(jnp.asarray(x), interpret=True))
    packed, scale = fmt.pack_tpu_pairk(
        w, blocksize=bs, variant=q.variant, scale_dtype=q.absmax_hi.dtype
    )
    golden = x @ fmt.unpack_tpu_pairk(packed, scale, blocksize=bs, variant=q.variant)
    np.testing.assert_allclose(y, golden, rtol=1e-4, atol=1e-4)
    # GEMV path too
    y1 = np.asarray(q(jnp.asarray(x[:1]), interpret=True))
    np.testing.assert_allclose(y1, golden[:1], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("variant", ["ramp", "zramp"])
def test_variant_kernel_matches_golden(rng, variant):
    """Remapped-codebook packs run through the full layer path and match the
    per-variant numpy golden on GEMV and GEMM."""
    n_out, k_in = 256, 1024
    w = (rng.standard_normal((n_out, k_in)) * 0.1).astype(np.float32)
    b = rng.standard_normal(n_out).astype(np.float32)
    q = L.quantize_linear(w, b, variant=variant)
    assert q.variant == variant
    packed, scale = fmt.pack_tpu_pairk(w, variant=variant, scale_dtype=q.absmax_hi.dtype)
    wt = fmt.unpack_tpu_pairk(packed, scale, variant=variant)
    for m in (1, 5):
        x = rng.standard_normal((m, k_in)).astype(np.float32)
        y = np.asarray(q(jnp.asarray(x), interpret=True))
        np.testing.assert_allclose(y, x @ wt + b, rtol=1e-4, atol=1e-4)
    # dequantize_weight uses the variant decode too
    wq = np.asarray(L.dequantize_weight(q, out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(wq, wt.T, rtol=3e-7, atol=1e-12)


@pytest.mark.parametrize("variant", fmt.PAIRK_VARIANTS)
def test_variant_error_band(rng, variant):
    """Every variant stays in the reference acceptance band; the remaps are
    at least as accurate as exact FP4 in the weight domain."""
    k_in, n_out = 1024, 1024
    bound = 1.0 / np.sqrt(k_in)
    w = rng.uniform(-bound, bound, (n_out, k_in)).astype(np.float32)
    q = L.quantize_linear(w, variant=variant)
    x = rng.standard_normal((8, k_in)).astype(np.float32)
    y = np.asarray(q(jnp.asarray(x), interpret=True))
    err = np.abs(y - x @ w.T).mean()
    assert 0.04 < err < 0.07, (variant, err)
    wq = np.asarray(L.dequantize_weight(q, out_dtype=jnp.float32, interpret=True))
    werr = np.abs(wq - w).mean()
    if variant != "exact":
        q0 = L.quantize_linear(w, variant="exact")
        w0 = np.asarray(L.dequantize_weight(q0, out_dtype=jnp.float32, interpret=True))
        assert werr <= np.abs(w0 - w).mean() * 1.01, (variant, werr)


@pytest.mark.slow
def test_variant_checkpoint_roundtrip(tmp_path, rng):
    """variant survives save/load (old manifests without it load as exact)."""
    from torch_bnb_fp4_tpu.convert import load_checkpoint, save_checkpoint
    from torch_bnb_fp4_tpu.models import KVCache, ModelConfig, forward, quantize_params
    from torch_bnb_fp4_tpu.models import transformer as T

    cfg = ModelConfig.tiny_test(n_layers=1)
    assert cfg.variant == "ramp"
    params = quantize_params(cfg, T.random_weights(cfg, seed=3))
    assert params.layers[0].wq.variant == "ramp"
    save_checkpoint(str(tmp_path / "c"), cfg, params)
    cfg2, params2 = load_checkpoint(str(tmp_path / "c"))
    assert params2.layers[0].wq.variant == "ramp"
    tokens = jnp.asarray([[1, 2]], jnp.int32)
    l1, _ = forward(params, cfg, tokens, KVCache.zeros(cfg, 1, 2))
    l2, _ = forward(params2, cfg2, tokens, KVCache.zeros(cfg2, 1, 2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_fuse_rejects_mixed_variants(rng):
    w = (rng.standard_normal((128, 1024)) * 0.1).astype(np.float32)
    qa = L.quantize_linear(w, variant="ramp")
    qb = L.quantize_linear(w, variant="exact")
    with pytest.raises(AssertionError, match="variant"):
        L.fuse_linears([qa, qb])


def test_error_band_pairk(rng):
    """Reference acceptance band holds for the pairk hot path."""
    k_in, n_out = 1024, 1024
    bound = 1.0 / np.sqrt(k_in)
    w = rng.uniform(-bound, bound, (n_out, k_in)).astype(np.float32)
    q = L.quantize_linear(w)
    x = rng.standard_normal((8, k_in)).astype(np.float32)
    y = np.asarray(q(jnp.asarray(x), interpret=True))
    err = np.abs(y - x @ w.T).mean()
    assert 0.04 < err < 0.07, err


def test_pairk_local_slices_sum_to_full(rng):
    """Row-parallel contiguous slices of a pairk layer reproduce the full
    result — no repacking needed (the TP sharding property)."""
    n_out, k_in, D = 128, 2048, 4
    w = (rng.standard_normal((n_out, k_in)) * 0.1).astype(np.float32)
    q = L.quantize_linear(w)
    x = rng.standard_normal((3, k_in)).astype(np.float32)
    full = np.asarray(q(jnp.asarray(x), interpret=True))
    kp_loc = q.packed.shape[0] // D
    s_loc = q.absmax_hi.shape[0] // D
    acc = np.zeros_like(full)
    for d in range(D):
        q_loc = dc.replace(
            L.local_view(q, k_parts=D),
            packed=q.packed[d * kp_loc : (d + 1) * kp_loc],
            absmax_hi=q.absmax_hi[d * s_loc : (d + 1) * s_loc],
            bias=None,
        )
        x_loc = x[:, d * (k_in // D) : (d + 1) * (k_in // D)]
        acc += np.asarray(q_loc(jnp.asarray(x_loc), interpret=True))
    np.testing.assert_allclose(acc, full, rtol=1e-5, atol=1e-5)


def test_pairk_checkpoint_roundtrip(tmp_path, rng):
    from torch_bnb_fp4_tpu.convert import load_checkpoint, save_checkpoint
    from torch_bnb_fp4_tpu.models import KVCache, ModelConfig, forward, quantize_params
    from torch_bnb_fp4_tpu.models import transformer as T

    cfg = ModelConfig.tiny_test(n_layers=1)
    params = quantize_params(cfg, T.random_weights(cfg, seed=2))
    assert params.layers[0].wq.layout == "pairk"
    save_checkpoint(str(tmp_path / "c"), cfg, params)
    cfg2, params2 = load_checkpoint(str(tmp_path / "c"), tp=4)
    assert params2.layers[0].wo.layout == "pairk"
    tokens = jnp.asarray([[1, 2]], jnp.int32)
    l1, _ = forward(params, cfg, tokens, KVCache.zeros(cfg, 1, 2))
    l2, _ = forward(params2, cfg2, tokens, KVCache.zeros(cfg2, 1, 2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_fast_pairk_pack_bit_identical(rng):
    from torch_bnb_fp4_tpu.convert import quantize_pack_pairk

    w = (rng.standard_normal((96, 1024)) * 0.2).astype(np.float32)
    g_packed, g_scale = fmt.pack_tpu_pairk(w)
    f_packed, f_scale = quantize_pack_pairk(w)
    np.testing.assert_array_equal(g_packed, f_packed)
    np.testing.assert_array_equal(g_scale, f_scale)


@pytest.mark.parametrize("block_k", [128, 256, 512])
def test_gemv_small_block_k_matches_golden(rng, block_k):
    """The scale-stripe m-outer kernel unlocks block_k < 512 (the K-blocked
    scale tile's 8-sublane quantum used to clamp it); every block_k must
    produce identical results."""
    n_out, k_in = 256, 1024
    w = (rng.standard_normal((n_out, k_in)) * 0.05).astype(np.float32)
    packed, scale = fmt.pack_tpu_pairk(w)
    x = jnp.asarray(rng.standard_normal((1, k_in)) * 0.5, jnp.bfloat16)
    out = K.gemv_fp4_pk(
        jnp.asarray(x), jnp.asarray(packed), jnp.asarray(scale),
        block_k=block_k, variant="exact", interpret=True,
    )
    golden = np.asarray(x, np.float32) @ fmt.unpack_tpu_pairk(packed, scale)
    np.testing.assert_allclose(np.asarray(out, np.float32), golden, rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("m", [4, 16])
def test_matmul_m_outer_small_block_k(rng, m):
    """m-outer GEMM (batched decode slots) with block_k=256 via the stripe."""
    n_out, k_in = 256, 1024
    w = (rng.standard_normal((n_out, k_in)) * 0.05).astype(np.float32)
    packed, scale = fmt.pack_tpu_pairk(w, variant="ramp")
    x = jnp.asarray(rng.standard_normal((m, k_in)) * 0.5, jnp.bfloat16)
    out = K.matmul_fp4_pk(
        jnp.asarray(x), jnp.asarray(packed), jnp.asarray(scale),
        block_k=256, block_m=256, variant="ramp", interpret=True,
    )
    golden = np.asarray(x, np.float32) @ fmt.unpack_tpu_pairk(packed, scale, variant="ramp")
    np.testing.assert_allclose(np.asarray(out, np.float32), golden, rtol=2e-2, atol=2e-3)


def test_lut_decode_exact_all_bytes():
    """Exhaustive: all 256 byte values decode through the pair-K LUT kernel
    to exactly bf16(NF4_CODE[nibble]) — the per-byte spec of the 'lut'
    variant (VERDICT r2 next #7)."""
    import ml_dtypes

    n = 128
    bytes_grid = np.arange(256, dtype=np.uint8).reshape(2, 128)
    packed = np.tile(bytes_grid, (32, 1))  # (64, 128): k=128, every byte twice
    scale = np.ones((2, n), np.float32)
    out = K.dequantize_tpu_pk(
        jnp.asarray(packed), jnp.asarray(scale), jnp.asarray(fmt.NF4_CODE),
        blocksize=64, out_dtype=jnp.float32, variant="lut", interpret=True,
    )
    want = fmt.unpack_tpu_pairk_lut(packed, scale, fmt.NF4_CODE, blocksize=64)
    np.testing.assert_array_equal(np.asarray(out), want)
    code_bf = fmt.NF4_CODE.astype(ml_dtypes.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(out)[0], code_bf[packed[0] & 0xF])
    np.testing.assert_array_equal(np.asarray(out)[1], code_bf[packed[0] >> 4])


@pytest.mark.parametrize("m", [1, 4, 64])
def test_lut_matmul_matches_golden(rng, m):
    """pair-K LUT matmul (GEMV / m-outer / m-inner paths) vs numpy golden for
    an arbitrary non-NF4 codebook — the codebook-as-data capability the
    reference advertises but ignores (gemv_fp4_optimized.cu:266,274)."""
    n_out, k_in = 256, 1024
    code = np.sort(rng.uniform(-1, 1, 16)).astype(np.float32)
    w = (rng.standard_normal((n_out, k_in)) * 0.05).astype(np.float32)
    packed, scale = fmt.pack_tpu_pairk_lut(w, code)
    x = jnp.asarray(rng.standard_normal((m, k_in)) * 0.5, jnp.bfloat16)
    out = K.matmul_fp4_pk(
        x, jnp.asarray(packed), jnp.asarray(scale), None, jnp.asarray(code),
        block_m=16 if m == 64 else 256, variant="lut", interpret=True,
    )
    golden = np.asarray(x, np.float32) @ fmt.unpack_tpu_pairk_lut(packed, scale, code)
    # m=64 rides the m-inner prescale path (one extra bf16 rounding of w*s)
    np.testing.assert_allclose(np.asarray(out, np.float32), golden, rtol=2e-2, atol=1e-2)


def _w4a8_golden(x_f32, packed, scale, variant, block_k, blocksize=64):
    """numpy mirror of _matmul_pk_w4a8_kernel's per-tile quantization."""
    ivals = fmt.unpack_tpu_pairk(packed, np.ones_like(scale), variant=variant)  # 192*code values
    k, n = ivals.shape
    m = x_f32.shape[0]
    acc = np.zeros((m, n), np.float32)
    for k0 in range(0, k, block_k):
        st = scale[k0 // blocksize : (k0 + block_k) // blocksize].astype(np.float32)
        g = st.max(axis=0, keepdims=True)
        g = np.where(g == 0, np.float32(1.0), g)
        f = (st / g) * np.float32(127.0 / 192.0)
        w8 = np.round(ivals[k0 : k0 + block_k] * np.repeat(f, blocksize, axis=0)).astype(np.int8)
        xt = x_f32[:, k0 : k0 + block_k].astype(np.float32)
        r = np.abs(xt).max(axis=1, keepdims=True)
        r = np.where(r == 0, np.float32(1.0), r)
        x8 = np.round(xt * (np.float32(127.0) / r)).astype(np.int8)
        d = x8.astype(np.int32) @ w8.astype(np.int32)
        acc += d.astype(np.float32) * (r / np.float32(127.0)) * (g * np.float32(192.0 / 127.0))
    return acc


def test_w4a8_matches_numpy_golden(rng):
    """int8-activation m-inner kernel: exact vs a numpy mirror of its own
    quantization (int dots are exact; f32 rescale order matches)."""
    n_out, k_in, m = 256, 1024, 64
    w = (rng.standard_normal((n_out, k_in)) * 0.05).astype(np.float32)
    packed, scale = fmt.pack_tpu_pairk(w, variant="ramp")
    x = jnp.asarray(rng.standard_normal((m, k_in)) * 0.5, jnp.bfloat16)
    out = K.matmul_fp4_pk(
        x, jnp.asarray(packed), jnp.asarray(scale),
        block_m=16, block_k=512, variant="ramp", a8=True, out_dtype=jnp.float32,
        interpret=True,
    )
    golden = _w4a8_golden(np.asarray(x, np.float32), packed, scale, "ramp", 512)
    np.testing.assert_allclose(np.asarray(out, np.float32), golden, rtol=1e-5, atol=1e-5)


def test_w4a8_error_close_to_bf16_path(rng):
    """The extra int8 activation/weight requantization adds only a modest
    error on top of FP4's own (~6%) quantization error."""
    n_out, k_in, m = 512, 2048, 64
    w = (rng.standard_normal((n_out, k_in)) / np.sqrt(k_in)).astype(np.float32)
    packed, scale = fmt.pack_tpu_pairk(w, variant="ramp")
    x = jnp.asarray(rng.standard_normal((m, k_in)), jnp.bfloat16)
    y_ref = np.asarray(x, np.float32) @ w.T
    args = (x, jnp.asarray(packed), jnp.asarray(scale))
    y_bf = np.asarray(K.matmul_fp4_pk(*args, block_m=16, variant="ramp", a8=False, interpret=True), np.float32)
    y_a8 = np.asarray(K.matmul_fp4_pk(*args, block_m=16, variant="ramp", a8=True, interpret=True), np.float32)
    e_bf = np.abs(y_bf - y_ref).mean()
    e_a8 = np.abs(y_a8 - y_ref).mean()
    assert e_a8 < e_bf * 1.25, (e_a8, e_bf)


def test_w4a8_rejected_for_f32_and_lut(rng):
    n_out, k_in = 128, 1024
    w = (rng.standard_normal((n_out, k_in)) * 0.05).astype(np.float32)
    packed, scale = fmt.pack_tpu_pairk(w, variant="ramp")
    xf = jnp.asarray(np.ones((4, k_in)), jnp.float32)
    with pytest.raises(ValueError, match="bf16"):
        K.matmul_fp4_pk(xf, jnp.asarray(packed), jnp.asarray(scale), variant="ramp", a8=True, interpret=True)
    pl_, sl_ = fmt.pack_tpu_pairk_lut(w, fmt.NF4_CODE)
    xb = jnp.asarray(np.ones((4, k_in)), jnp.bfloat16)
    with pytest.raises(ValueError, match="FP4-family"):
        K.matmul_fp4_pk(xb, jnp.asarray(pl_), jnp.asarray(sl_), None, jnp.asarray(fmt.NF4_CODE),
                        variant="lut", a8=True, interpret=True)


def test_m_outer_window_k768(rng):
    """K=768 regression: _k_block_stripe used to pick block_k=384 (sblk=6),
    whose scale rows straddle the 8-row window at kk=1 — silently wrong
    scales.  The chooser must now keep the window contract and decode
    golden-exact."""
    from torch_bnb_fp4_tpu.ops.kernels import _k_block_stripe

    bk = _k_block_stripe(768, 512, 64)
    assert bk != 384 and (768 % bk == 0)
    sblk = bk // 64
    assert bk == 768 or 8 % sblk == 0 or sblk % 8 == 0
    w = (rng.standard_normal((128, 768)) * 0.05).astype(np.float32)
    packed, scale = fmt.pack_tpu_pairk(w, variant="exact")
    x = jnp.asarray(rng.standard_normal((8, 768)), jnp.float32)
    # m-outer path: block_m >= m so the grid has one M block
    out = K.matmul_fp4_pk(x, jnp.asarray(packed), jnp.asarray(scale),
                          variant="exact", interpret=True, block_m=8)
    golden = np.asarray(x, np.float32) @ fmt.unpack_tpu_pairk(packed, scale)
    np.testing.assert_allclose(np.asarray(out), golden, rtol=2e-2, atol=2e-2)
