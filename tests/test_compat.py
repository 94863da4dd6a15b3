"""Reference-API compatibility layer (torch_bnb_fp4_tpu.compat).

Each test drives a compat symbol exactly the way the reference's own code and
examples drive the original (torch_bnb_fp4/__init__.py), and checks the result
against the numpy golden model / twin oracles.  torch (CPU) tensors in must
come back as torch tensors.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from torch_bnb_fp4_tpu import compat
from torch_bnb_fp4_tpu.ops import format as fmt

torch = pytest.importorskip("torch")


def _flat_quant(rng, M, N, blocksize=64):
    w = (rng.standard_normal((M, N)) * 0.1).astype(np.float32)
    packed, absmax = fmt.quantize_fp4(w, blocksize=blocksize)
    golden = fmt.dequantize_fp4(packed, absmax, (M, N), blocksize=blocksize)
    return w, packed, absmax, golden


# --------------------------------------------------------------------------
# ScalarType
# --------------------------------------------------------------------------

def test_scalartype_conversions():
    st = compat.ScalarType
    assert st.from_torch_dtype(torch.bfloat16) is st.bfloat16
    assert st.from_torch_dtype(torch.float16) is st.float16
    assert st.from_torch_dtype(jnp.float32) is st.float32
    assert st.from_str("bf16") is st.bfloat16
    assert st.from_str("float16") is st.float16
    # the reference's torch_dtype property is dead code (SURVEY §2.4); ours works
    assert st.bfloat16.torch_dtype == torch.bfloat16
    assert st.float32.jnp_dtype == jnp.float32
    with pytest.raises(ValueError):
        st.from_torch_dtype(torch.int8)
    with pytest.raises(ValueError):
        st.from_str("int8")


# --------------------------------------------------------------------------
# functional wrappers
# --------------------------------------------------------------------------

@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "float16"])
def test_dequantize_fp4_matches_golden(rng, dtype):
    M, N = 64, 128
    _, packed, absmax, golden = _flat_quant(rng, M, N)
    out = compat.dequantize_fp4(packed, absmax, 64, M, N, dtype=dtype)
    assert out.shape == (M, N) and str(out.dtype) == dtype
    np.testing.assert_allclose(
        np.asarray(out, np.float32), golden, rtol=0, atol=8e-3)


def test_dequantize_fp4_torch_in_torch_out(rng):
    M, N = 32, 128
    _, packed, absmax, golden = _flat_quant(rng, M, N)
    out = compat.dequantize_fp4(
        torch.from_numpy(packed), torch.from_numpy(absmax), 64, M, N,
        dtype=torch.float32)
    assert isinstance(out, torch.Tensor)
    np.testing.assert_allclose(out.numpy(), golden, rtol=0, atol=1e-6)


def test_dequantize_codebook_honors_code(rng):
    """The reference validates but IGNORES the codebook argument
    (csrc/dequant_fp4_optimized.cu:218-248); here NF4 decodes correctly."""
    M, N = 32, 128
    w = (rng.standard_normal((M, N)) * 0.1).astype(np.float32)
    codes, absmax = fmt.quantize_codes(w, 64, fmt.NF4_CODE)
    packed = fmt.pack_flat(codes)
    golden = fmt.dequantize_codes(codes, absmax, 64, fmt.NF4_CODE).reshape(M, N)
    out = compat.dequantize_fp4_codebook_invoke(
        packed, absmax, fmt.NF4_CODE, 64, M, N, M * N, "float32")
    np.testing.assert_allclose(np.asarray(out), golden, rtol=0, atol=1e-6)
    with pytest.raises(ValueError, match="numel"):
        compat.dequantize_fp4_codebook_invoke(
            packed, absmax, fmt.NF4_CODE, 64, M, N, M * N + 1, "float32")


@pytest.mark.parametrize("ashape", [(1, 128), (1, 1, 128)])
def test_gemm_4bit_inference_matches_oracle(rng, ashape):
    out_f, in_f = 96, 128
    _, packed, absmax, golden = _flat_quant(rng, out_f, in_f)
    a = (rng.standard_normal(ashape) * 0.5).astype(np.float32)
    want = a.reshape(-1, in_f) @ golden.T
    got = compat.gemm_4bit_inference(
        a, packed, absmax, fmt.FP4_CODE, 64, dtype="float32",
        Bshape=(out_f, in_f))
    assert got.shape == ashape[:-1] + (out_f,)
    np.testing.assert_allclose(
        np.asarray(got).reshape(-1, out_f), want, rtol=2e-5, atol=2e-5)
    with pytest.raises(ValueError, match="Bshape"):
        compat.gemm_4bit_inference(a, packed, absmax, fmt.FP4_CODE, 64)


# --------------------------------------------------------------------------
# QuantData (bnb QuantState duck-type in, reference dispatch semantics)
# --------------------------------------------------------------------------

class _FakeQuantState:
    """Duck-typed bnb.functional.QuantState (absmax/blocksize/code/shape)."""

    def __init__(self, absmax, shape, blocksize=64, quant_type="fp4"):
        self.absmax = absmax
        self.blocksize = blocksize
        self.code = fmt.FP4_CODE if quant_type == "fp4" else fmt.NF4_CODE
        self.shape = shape
        self.quant_type = quant_type


@pytest.fixture
def qdata(rng):
    out_f, in_f = 96, 128
    w, packed, absmax, golden = _flat_quant(rng, out_f, in_f)
    qd = compat.QuantData(packed, _FakeQuantState(absmax, (out_f, in_f)),
                          (out_f, in_f))
    return qd, golden


def test_quantdata_gemv_and_gemm_paths(rng, qdata):
    qd, golden = qdata
    for shape in [(1, 128), (1, 1, 128), (2, 3, 128)]:  # GEMV 2d/3d + GEMM
        a = (rng.standard_normal(shape) * 0.5).astype(np.float32)
        want = a.reshape(-1, 128) @ golden.T
        got = np.asarray(qd.forward(jnp.asarray(a)), np.float32)
        assert got.shape == shape[:-1] + (96,)
        np.testing.assert_allclose(got.reshape(-1, 96), want, rtol=0, atol=5e-2)


def test_quantdata_zero_size_and_dequantize(qdata):
    qd, golden = qdata
    out = qd.forward(jnp.zeros((0, 128), jnp.float32))
    assert out.shape == (0, 96)
    np.testing.assert_allclose(
        np.asarray(qd.dequantize("float32"), np.float32), golden,
        rtol=0, atol=8e-3)


def test_quantdata_f16_computes_in_bf16(rng, qdata):
    qd, golden = qdata
    a = (rng.standard_normal((1, 128)) * 0.5).astype(np.float16)
    got = qd.forward(jnp.asarray(a))
    assert got.dtype == jnp.float16  # cast back at the edge, pinned contract


def test_quantdata_double_quant_state(rng):
    """Nested (double-quantized) absmax decodes — the reference rejects these
    checkpoints outright (README.md:221-224)."""
    out_f, in_f = 64, 128
    w, packed, absmax, golden = _flat_quant(rng, out_f, in_f)
    # build a nested state the way bnb does: quantize absmax with an 8-bit
    # code (use identity-ish: store absmax - offset quantized by NF4-as-8bit)
    offset = float(absmax.mean())
    from torch_bnb_fp4_tpu.convert.bnb import dequantize_nested_absmax

    nb = 64
    sub = absmax - offset
    n_blocks = (sub.size + nb - 1) // nb
    pad = np.zeros(n_blocks * nb, np.float32)
    pad[: sub.size] = sub
    pad = pad.reshape(n_blocks, nb)
    a2 = np.abs(pad).max(axis=1)
    a2[a2 == 0] = 1.0
    code2 = np.linspace(-1, 1, 256).astype(np.float32)
    idx = np.abs((pad / a2[:, None])[:, :, None] - code2[None, None, :]).argmin(axis=2)
    stored = idx.astype(np.uint8).reshape(-1)[: sub.size]

    class _S2:
        absmax = a2
        code = code2
        blocksize = nb

    st = _FakeQuantState(stored, (out_f, in_f))
    st.state2 = _S2()
    st.offset = offset
    qd = compat.QuantData(packed, st, (out_f, in_f))
    dec = dequantize_nested_absmax(stored, a2, code2, offset, nb)
    a = np.eye(1, in_f, dtype=np.float32)
    got = np.asarray(qd.forward(jnp.asarray(a)), np.float32)
    want_w = fmt.dequantize_fp4(packed, dec, (out_f, in_f))
    np.testing.assert_allclose(got[0], want_w[:, 0], rtol=0, atol=5e-2)


# --------------------------------------------------------------------------
# TorchFP4Linear on a live torch layer
# --------------------------------------------------------------------------

def test_torchfp4linear_from_plain_linear_error_band():
    """Twin oracle, reference sanity_check.py:130-171: quantize a torch
    nn.Linear, compare outputs; reference acceptance band 0.045-0.065
    (sanity_check.py:177-179) with torch default init at these dims."""
    torch.manual_seed(0)
    lin = torch.nn.Linear(256, 256)
    q = compat.TorchFP4Linear.from_linear(lin)
    assert q.in_features == 256 and q.out_features == 256
    x = torch.randn(1, 256)
    with torch.no_grad():
        want = lin(x).numpy()
    got = q.forward(x)
    assert isinstance(got, torch.Tensor)
    err = np.abs(got.float().numpy() - want).mean()
    assert 0.001 < err < 0.065, err
    assert "TorchFP4Linear" in repr(q)
    # .quant_data attribute surface (reference __repr__/user scripts)
    got2 = q.quant_data.forward(x)
    np.testing.assert_array_equal(got.float().numpy(), got2.float().numpy())


def test_torchfp4linear_rejects_weightless():
    with pytest.raises(ValueError, match="weight"):
        compat.TorchFP4Linear.from_linear(object())


# --------------------------------------------------------------------------
# recursively_replace_with_fp4_linear on a live HF model
# --------------------------------------------------------------------------

@pytest.mark.slow
def test_recursive_replace_matches_disk_convert(tmp_path):
    """The live-model conversion must produce EXACTLY the params the offline
    CLI produces from the same weights (one quantize rule), and generate."""
    transformers = pytest.importorskip("transformers")
    import jax

    hf_cfg = transformers.MistralConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False)
    torch.manual_seed(7)
    model = transformers.MistralForCausalLM(hf_cfg).eval()

    cfg, params = compat.recursively_replace_with_fp4_linear(model)

    # same weights through the disk CLI
    import safetensors.torch as stt

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    (hf_dir / "config.json").write_text(hf_cfg.to_json_string())
    stt.save_file(model.state_dict(), str(hf_dir / "model.safetensors"))
    from torch_bnb_fp4_tpu.convert import convert_hf_model, load_checkpoint

    convert_hf_model(str(hf_dir), str(tmp_path / "out"), verbose=False)
    cfg2, params2 = load_checkpoint(str(tmp_path / "out"))
    assert cfg == cfg2

    from torch_bnb_fp4_tpu.models import KVCache, forward

    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    l1, _ = forward(params, cfg, tokens, KVCache.zeros(cfg, 1, 3))
    l2, _ = forward(params2, cfg2, tokens, KVCache.zeros(cfg2, 1, 3))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    # reference ignore-list semantics flow through
    cfg3, params3 = compat.recursively_replace_with_fp4_linear(
        model, ignore_layer_names=["down_proj"])
    from torch_bnb_fp4_tpu.models.linear import DenseLinear

    assert isinstance(params3.layers[0].w_down, DenseLinear)
    assert not isinstance(params3.layers[0].w_gate, DenseLinear)

    # only_replace_bnb_layers on a full-precision model must refuse
    with pytest.raises(ValueError, match="not.*bnb"):
        compat.recursively_replace_with_fp4_linear(
            model, only_replace_bnb_layers=True)

    with pytest.raises(ValueError, match="transformers"):
        compat.recursively_replace_with_fp4_linear(torch.nn.Linear(4, 4))


def test_check_if_name_contained_in_list():
    assert compat.check_if_name_contained_in_list("model.lm_head", ["lm_head"])
    assert not compat.check_if_name_contained_in_list("model.q_proj", ["lm_head"])
