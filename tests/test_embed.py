"""Quantized embedding table (QuantEmbedding) tests.

The reference leaves embeddings unquantized (it only swaps nn.Linear,
torch_bnb_fp4/__init__.py:717-779); this is a beyond-reference memory
feature, so it gets its own oracle chain: numpy dequant golden -> lookup
equivalence -> end-to-end forward vs the dense-embed twin -> checkpoint
round-trip -> TP forward equivalence.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_bnb_fp4_tpu.models import (
    KVCache,
    ModelConfig,
    QuantEmbedding,
    embed_lookup,
    forward,
    quantize_embedding,
    quantize_params,
    random_weights,
)
from torch_bnb_fp4_tpu.ops import format as fmt

CFG = ModelConfig.tiny_test()


def _golden_dequant(w, qe: QuantEmbedding) -> np.ndarray:
    """Numpy-only dequant of the packed table (row-major flat bnb order)."""
    codes = fmt.unpack_flat(np.asarray(qe.packed).reshape(-1))
    return fmt.dequantize_codes(
        codes, np.asarray(qe.scale).reshape(-1), qe.blocksize,
        np.asarray(qe.code),
    ).reshape(w.shape)


@pytest.mark.parametrize("code_name", ["fp4", "nf4"])
def test_lookup_matches_numpy_golden(rng, code_name):
    code = fmt.NF4_CODE if code_name == "nf4" else fmt.FP4_CODE
    w = rng.normal(size=(32, 128)).astype(np.float32) * 0.05
    qe = quantize_embedding(w, blocksize=64, code=code)
    golden = _golden_dequant(w, qe)
    tokens = jnp.asarray(rng.integers(0, 32, size=(3, 5)), jnp.int32)
    got = np.asarray(embed_lookup(qe, tokens), np.float32)
    want = golden[np.asarray(tokens)].astype(jnp.bfloat16).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # and the quantization error itself is in the FP4 envelope
    # (mean relative error of 4-bit blockwise quantization on Gaussian data
    # is ~0.12 for FP4 / ~0.08 for NF4 — the band the reference's sanity
    # check also operates in)
    err = np.abs(golden - w).mean() / (np.abs(w).mean() + 1e-9)
    assert err < 0.15, err


def test_quantize_embedding_validates():
    with pytest.raises(ValueError):
        quantize_embedding(np.zeros((4, 100), np.float32), blocksize=64)
    with pytest.raises(ValueError):
        quantize_embedding(np.zeros((4, 8, 8), np.float32))


@pytest.mark.slow
def test_synth_params_respects_quantize_embed():
    """synth benchmarks of a quantize_embed config must build a packed table,
    not silently measure dense-table HBM (and dense stays dense)."""
    from torch_bnb_fp4_tpu.utils.synth import synth_params

    cfg = dataclasses.replace(CFG, quantize_embed=True)
    p = synth_params(cfg)
    assert isinstance(p.embed, QuantEmbedding)
    assert p.embed.packed.shape == (cfg.vocab_size, cfg.dim // 2)
    e = embed_lookup(p.embed, jnp.asarray([[1, 2, 3]], jnp.int32))
    assert e.shape == (1, 3, cfg.dim) and np.isfinite(np.asarray(e, np.float32)).all()
    assert not isinstance(synth_params(CFG).embed, QuantEmbedding)
    assert not isinstance(synth_params(cfg, quantized=False).embed, QuantEmbedding)


def test_dense_embed_lookup_unchanged(rng):
    w = jnp.asarray(rng.normal(size=(16, 64)), jnp.bfloat16)
    tokens = jnp.asarray([[1, 3], [0, 15]], jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(embed_lookup(w, tokens)), np.asarray(w[tokens]))


@pytest.mark.slow
def test_forward_with_quantized_embed_tracks_dense_embed_twin():
    """Same weights, quantize_embed on/off: logits stay close (embedding
    quantization adds only the table's FP4 error to the input)."""
    weights = random_weights(CFG, seed=7)
    params = quantize_params(CFG, weights)
    qcfg = dataclasses.replace(CFG, quantize_embed=True)
    qparams = quantize_params(qcfg, weights)
    assert isinstance(qparams.embed, QuantEmbedding)

    tokens = jnp.asarray(np.arange(10, dtype=np.int32).reshape(1, 10) % CFG.vocab_size)
    ref, _ = forward(params, CFG, tokens, KVCache.zeros(CFG, 1, 10))
    got, _ = forward(qparams, qcfg, tokens, KVCache.zeros(qcfg, 1, 10))
    ref, got = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    # random tiny-model weights are the WORST case: the embedding is the
    # entire input signal, so its ~12% FP4 error propagates ~1:1 into the
    # logits (real checkpoints put far less of the signal in the table).
    denom = np.abs(ref).mean() + 1e-6
    assert np.abs(got - ref).mean() / denom < 0.25
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.98


@pytest.mark.slow
def test_checkpoint_roundtrip_quant_embed(tmp_path):
    from torch_bnb_fp4_tpu.convert.checkpoint import load_checkpoint, save_checkpoint

    cfg = ModelConfig.tiny_test(quantize_embed=True)
    params = quantize_params(cfg, random_weights(cfg, seed=11))
    save_checkpoint(str(tmp_path / "ckpt"), cfg, params)
    cfg2, params2 = load_checkpoint(str(tmp_path / "ckpt"))
    assert cfg2.quantize_embed
    assert isinstance(params2.embed, QuantEmbedding)
    np.testing.assert_array_equal(np.asarray(params2.embed.packed),
                                  np.asarray(params.embed.packed))
    np.testing.assert_array_equal(np.asarray(params2.embed.scale),
                                  np.asarray(params.embed.scale))
    tokens = jnp.asarray([[5, 2, 9]], jnp.int32)
    a, _ = forward(params, cfg, tokens, KVCache.zeros(cfg, 1, 3))
    b, _ = forward(params2, cfg2, tokens, KVCache.zeros(cfg2, 1, 3))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_streaming_convert_quantize_embed(tmp_path):
    """CLI-equivalent path: convert_hf_model(quantize_embed=True) writes a
    quant_embed group whose table matches in-process quantization exactly."""
    from test_convert import _write_hf_checkpoint

    from torch_bnb_fp4_tpu.convert import convert_hf_model
    from torch_bnb_fp4_tpu.convert.checkpoint import load_checkpoint

    weights = random_weights(CFG, seed=17)
    _write_hf_checkpoint(tmp_path / "hf", CFG, weights)
    cfg = convert_hf_model(str(tmp_path / "hf"), str(tmp_path / "out"),
                           quantize_embed=True, verbose=False)
    assert cfg.quantize_embed
    cfg2, params = load_checkpoint(str(tmp_path / "out"))
    assert isinstance(params.embed, QuantEmbedding)
    want = quantize_embedding(weights["model.embed_tokens.weight"], cfg.blocksize)
    np.testing.assert_array_equal(np.asarray(params.embed.packed),
                                  np.asarray(want.packed))
    np.testing.assert_array_equal(np.asarray(params.embed.scale),
                                  np.asarray(want.scale))


@pytest.mark.slow
def test_tp_forward_with_quantized_embed():
    """Quantized embed is replicated under TP: tp=2 forward == single-device."""
    from torch_bnb_fp4_tpu.parallel import (
        make_mesh,
        quantize_params_tp,
        shard_cache,
        shard_params,
        tp_forward_fn,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    cfg = ModelConfig.tiny_test(quantize_embed=True)
    weights = random_weights(cfg, seed=13)
    params = quantize_params(cfg, weights)

    tokens = jnp.asarray(np.arange(6, dtype=np.int32).reshape(1, 6) % cfg.vocab_size)
    ref, _ = forward(params, cfg, tokens, KVCache.zeros(cfg, 1, 8))

    mesh = make_mesh(n_model=2)
    tparams = shard_params(quantize_params_tp(cfg, weights, tp=2), mesh)
    assert isinstance(tparams.embed, QuantEmbedding)
    cache = shard_cache(KVCache.zeros(cfg, 1, 8), mesh)
    fwd = tp_forward_fn(tparams, cfg, cache, mesh)
    got, _ = jax.jit(fwd)(tparams, tokens, cache)
    got, ref = np.asarray(got, np.float32), np.asarray(ref, np.float32)
    assert np.abs(got - ref).max() < 0.05, np.abs(got - ref).max()
