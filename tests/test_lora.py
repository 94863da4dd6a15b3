"""LoRA adapters over packed-FP4 bases (QLoRA-style serving).

bnb 4-bit is, in the wild, primarily a QLoRA base format; the reference
accelerates the base linear only.  These tests pin the adapter runtime:

* attach_lora == running the base model with W + (alpha/r) B A folded in
  (dense oracle via models.reference_forward on merged weights);
* the adapter path adds NO error on top of quantization (quant+LoRA tracks
  its dense twin exactly as well as quant-without-LoRA tracks its twin);
* detach_lora restores the base bit-for-bit;
* merge_lora (requantizing fold) tracks the exact attach form;
* PEFT adapter directories (adapter_config.json + safetensors) load and
  attach; malformed/unsupported targets fail loudly;
* TP: LoRA factors shard so deltas ride the existing psums — mesh forward
  matches single-device;
* the serving engine decodes an adapter-attached model and matches
  generate() on the same params.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_bnb_fp4_tpu.models import (
    KVCache,
    ModelConfig,
    PEFTAdapter,
    attach_lora,
    dense_params,
    detach_lora,
    forward,
    generate,
    load_peft_adapter,
    merge_lora,
    quantize_params,
    random_weights,
    reference_forward,
)

CFG = ModelConfig.tiny_test(n_layers=2)
TOKS = np.array([[3, 7, 2, 9, 11, 5]], np.int32)
R, ALPHA = 8, 16.0


def _adapter(seed=7, targets=("self_attn.q_proj", "self_attn.v_proj", "mlp.down_proj")):
    rng = np.random.default_rng(seed)
    kv_dim = CFG.n_kv_heads * CFG.head_dim
    shapes = {
        "self_attn.q_proj": (CFG.dim, CFG.dim),
        "self_attn.k_proj": (kv_dim, CFG.dim),
        "self_attn.v_proj": (kv_dim, CFG.dim),
        "self_attn.o_proj": (CFG.dim, CFG.dim),
        "mlp.gate_proj": (CFG.ffn_dim, CFG.dim),
        "mlp.up_proj": (CFG.ffn_dim, CFG.dim),
        "mlp.down_proj": (CFG.dim, CFG.ffn_dim),
    }
    w = {}
    for i in range(CFG.n_layers):
        for t in targets:
            n, k = shapes[t]
            w[f"model.layers.{i}.{t}"] = (
                rng.standard_normal((R, k)).astype(np.float32) * 0.02,
                rng.standard_normal((n, R)).astype(np.float32) * 0.02,
            )
    return PEFTAdapter(r=R, alpha=ALPHA, weights=w)


@pytest.fixture(scope="module")
def weights():
    return random_weights(CFG, seed=5)


@pytest.fixture(scope="module")
def adapter():
    return _adapter()


@pytest.fixture(scope="module")
def merged_oracle(weights, adapter):
    """f32 logits of the bf16 twin with the deltas folded into the weights."""
    wm = dict(weights)
    for stem, (a, b) in adapter.weights.items():
        wm[stem + ".weight"] = weights[stem + ".weight"] + ALPHA / R * (b @ a)
    return np.asarray(reference_forward(CFG, wm, TOKS))


def _fw(params, cfg=CFG):
    out, _ = forward(params, cfg, jnp.asarray(TOKS), KVCache.zeros(cfg, 1, 8))
    return np.asarray(out)


def test_dense_attach_matches_merged_oracle(weights, adapter, merged_oracle):
    got = _fw(attach_lora(dense_params(CFG, weights), CFG, adapter))
    err = np.abs(got - merged_oracle).max() / np.abs(merged_oracle).max()
    assert err < 2e-2, err
    assert np.corrcoef(got.ravel(), merged_oracle.ravel())[0, 1] > 0.9999


def test_adapter_adds_no_error_beyond_quantization(weights, adapter, merged_oracle):
    """corr(quantized+LoRA, dense+LoRA oracle) must equal
    corr(quantized, dense oracle) — the delta path is exact, so quantization
    noise is the ONLY error either way."""
    base_corr = np.corrcoef(
        _fw(quantize_params(CFG, weights)).ravel(),
        np.asarray(reference_forward(CFG, weights, TOKS)).ravel(),
    )[0, 1]
    lora_corr = np.corrcoef(
        _fw(attach_lora(quantize_params(CFG, weights), CFG, adapter)).ravel(),
        merged_oracle.ravel(),
    )[0, 1]
    assert lora_corr > base_corr - 0.005, (lora_corr, base_corr)


def test_detach_restores_base(weights, adapter):
    qp = quantize_params(CFG, weights)
    assert np.array_equal(_fw(detach_lora(attach_lora(qp, CFG, adapter))), _fw(qp))


def test_merge_tracks_attach(weights, adapter):
    qp = quantize_params(CFG, weights)
    ga = _fw(attach_lora(qp, CFG, adapter))
    gm = _fw(merge_lora(qp, CFG, adapter))
    assert np.corrcoef(ga.ravel(), gm.ravel())[0, 1] > 0.97


def test_attach_rejects_fused_and_unknown(weights, adapter):
    from torch_bnb_fp4_tpu.models import fuse_params

    with pytest.raises(ValueError, match="unfused"):
        attach_lora(fuse_params(quantize_params(CFG, weights)), CFG, adapter)
    bad = PEFTAdapter(r=R, alpha=ALPHA, weights={
        "model.layers.0.block_sparse_moe.experts.0.w1": (np.zeros((R, 8)), np.zeros((8, R)))
    })
    with pytest.raises(ValueError, match="expert"):
        attach_lora(quantize_params(CFG, weights), CFG, bad)
    with pytest.raises(ValueError, match="outside the decoder"):
        attach_lora(quantize_params(CFG, weights), CFG, PEFTAdapter(
            r=R, alpha=ALPHA, weights={"lm_head": (np.zeros((R, 8)), np.zeros((8, R)))}))


def test_peft_directory_roundtrip(tmp_path, weights, adapter, merged_oracle):
    """Write a PEFT-convention adapter dir, load it, attach, and match the
    in-memory adapter's output exactly."""
    from safetensors.numpy import save_file

    tensors = {}
    for stem, (a, b) in adapter.weights.items():
        tensors[f"base_model.model.{stem}.lora_A.weight"] = a
        tensors[f"base_model.model.{stem}.lora_B.weight"] = b
    save_file(tensors, str(tmp_path / "adapter_model.safetensors"))
    with open(tmp_path / "adapter_config.json", "w") as f:
        json.dump({"peft_type": "LORA", "r": R, "lora_alpha": ALPHA,
                   "target_modules": ["q_proj", "v_proj", "down_proj"]}, f)
    loaded = load_peft_adapter(str(tmp_path))
    assert loaded.r == R and loaded.alpha == ALPHA
    assert sorted(loaded.weights) == sorted(adapter.weights)
    qp = quantize_params(CFG, weights)
    assert np.array_equal(
        _fw(attach_lora(qp, CFG, loaded)), _fw(attach_lora(qp, CFG, adapter))
    )


@pytest.mark.slow
def test_lora_tp_matches_single_device(weights, adapter):
    """Sharded LoRA: column targets shard b, row targets shard a (delta
    partials ride the base psum) — mesh forward == single device."""
    from torch_bnb_fp4_tpu.parallel import tp as TP

    params = attach_lora(quantize_params(CFG, weights), CFG, adapter)
    ref = _fw(params)
    mesh = TP.make_mesh(n_model=4, n_data=1)
    sp = TP.shard_params(params, mesh)
    cache = TP.shard_cache(KVCache.zeros(CFG, 1, 8), mesh)
    fwd = TP.tp_forward_fn(sp, CFG, cache, mesh)
    got, _ = jax.jit(fwd)(sp, jnp.asarray(TOKS), cache)
    d = np.abs(np.asarray(got) - ref).max() / np.abs(ref).max()
    assert d < 2e-2, d


@pytest.mark.slow
def test_engine_serves_lora(weights, adapter):
    from torch_bnb_fp4_tpu.serve import Engine, EngineConfig, Request

    params = attach_lora(quantize_params(CFG, weights), CFG, adapter)
    eng = Engine(params, CFG, EngineConfig(max_batch=2, max_len=24, inner_steps=2))
    res = eng.run([Request(uid=1, prompt=[3, 7, 2], max_new_tokens=5)])
    want = np.asarray(generate(
        params, CFG, jnp.asarray([[3, 7, 2]], jnp.int32), max_new_tokens=5
    ))[0].tolist()
    assert res[1].tokens == want
