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


@pytest.mark.slow
def test_dense_attach_matches_merged_oracle(weights, adapter, merged_oracle):
    got = _fw(attach_lora(dense_params(CFG, weights), CFG, adapter))
    err = np.abs(got - merged_oracle).max() / np.abs(merged_oracle).max()
    assert err < 2e-2, err
    assert np.corrcoef(got.ravel(), merged_oracle.ravel())[0, 1] > 0.9999


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# Multi-adapter serving (attach_multi_lora + per-request adapter selection)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def adapter_b():
    # different rank/alpha and a different target set than `adapter` — the
    # stacks must pad ranks and zero-fill non-targeted modules
    rng = np.random.default_rng(21)
    w = {}
    for i in range(CFG.n_layers):
        w[f"model.layers.{i}.self_attn.q_proj"] = (
            rng.standard_normal((4, CFG.dim)).astype(np.float32) * 0.02,
            rng.standard_normal((CFG.dim, 4)).astype(np.float32) * 0.02,
        )
    return PEFTAdapter(r=4, alpha=8.0, weights=w)


@pytest.mark.slow
def test_multi_lora_matches_single_attach(weights, adapter, adapter_b):
    """Per-row adapter selection reproduces each single-attach oracle, and
    index 0 reproduces the base model, within one batched forward."""
    from torch_bnb_fp4_tpu.models import attach_multi_lora

    base = quantize_params(CFG, weights)
    mp, ids = attach_multi_lora(base, CFG, {"a": adapter, "b": adapter_b})
    assert ids == {"a": 1, "b": 2}
    toks = jnp.asarray(np.repeat(TOKS, 3, axis=0))
    aidx = jnp.asarray([1, 0, 2], jnp.int32)
    got, _ = forward(mp, CFG, toks, KVCache.zeros(CFG, 3, 8), adapter_idx=aidx)
    got = np.asarray(got)
    want_a = _fw(attach_lora(base, CFG, adapter))[0]
    want_0 = _fw(base)[0]
    want_b = _fw(attach_lora(base, CFG, adapter_b))[0]
    scale = np.abs(want_0).max()
    assert np.abs(got[0] - want_a).max() / scale < 5e-3
    assert np.abs(got[1] - want_0).max() / scale < 5e-3
    assert np.abs(got[2] - want_b).max() / scale < 5e-3


def test_multi_lora_requires_adapter_idx(weights, adapter):
    from torch_bnb_fp4_tpu.models import attach_multi_lora

    mp, _ = attach_multi_lora(quantize_params(CFG, weights), CFG, {"a": adapter})
    with pytest.raises(ValueError, match="adapter_idx"):
        forward(mp, CFG, jnp.asarray(TOKS), KVCache.zeros(CFG, 1, 8))
    # and the reverse: an index without multi-LoRA params
    with pytest.raises(ValueError, match="no MultiLoRALinear"):
        forward(quantize_params(CFG, weights), CFG, jnp.asarray(TOKS),
                KVCache.zeros(CFG, 1, 8), adapter_idx=jnp.zeros((1,), jnp.int32))


@pytest.mark.slow
def test_multi_lora_tp_matches_single_device(weights, adapter, adapter_b):
    """Stacked adapter factors shard like single-LoRA with the adapter axis
    replicated — mesh forward with per-row selection == single device."""
    from torch_bnb_fp4_tpu.models import attach_multi_lora
    from torch_bnb_fp4_tpu.parallel import tp as TP

    mp, _ = attach_multi_lora(
        quantize_params(CFG, weights), CFG, {"a": adapter, "b": adapter_b})
    toks = jnp.asarray(np.repeat(TOKS, 4, axis=0))
    aidx = jnp.asarray([1, 0, 2, 1], jnp.int32)
    ref, _ = forward(mp, CFG, toks, KVCache.zeros(CFG, 4, 8), adapter_idx=aidx)
    ref = np.asarray(ref)
    mesh = TP.make_mesh(n_model=4, n_data=2)
    sp = TP.shard_params(mp, mesh)
    cache = TP.shard_cache(KVCache.zeros(CFG, 4, 8), mesh)
    fwd = TP.tp_forward_fn(sp, CFG, cache, mesh, with_adapter_idx=True)
    got, _ = jax.jit(fwd)(sp, toks, cache, aidx)
    d = np.abs(np.asarray(got) - ref).max() / np.abs(ref).max()
    assert d < 2e-2, d


@pytest.mark.slow
def test_engine_multi_lora_per_request(weights, adapter, adapter_b):
    """Engine serves three concurrent requests on different adapters (and the
    base); each completion matches its single-attach generate() oracle
    token for token."""
    from torch_bnb_fp4_tpu.models import attach_multi_lora
    from torch_bnb_fp4_tpu.serve import Engine, EngineConfig, Request

    base = quantize_params(CFG, weights)
    mp, ids = attach_multi_lora(base, CFG, {"a": adapter, "b": adapter_b})
    eng = Engine(mp, CFG, EngineConfig(max_batch=4, max_len=32, inner_steps=2),
                 adapter_ids=ids)
    res = eng.run([
        Request(uid=0, prompt=[3, 7, 2], max_new_tokens=6, adapter="a"),
        Request(uid=1, prompt=[5, 9, 1], max_new_tokens=6, adapter="b"),
        Request(uid=2, prompt=[6, 5, 3], max_new_tokens=6),
    ])
    oracles = {0: attach_lora(base, CFG, adapter), 1: attach_lora(base, CFG, adapter_b),
               2: base}
    prompts = {0: [3, 7, 2], 1: [5, 9, 1], 2: [6, 5, 3]}
    for uid, p_i in oracles.items():
        want = np.asarray(generate(
            p_i, CFG, jnp.asarray([prompts[uid]], jnp.int32), max_new_tokens=6
        ))[0].tolist()
        assert res[uid].tokens == want, (uid, res[uid].tokens, want)
    # unknown adapter name fails at submit
    with pytest.raises(ValueError, match="unknown adapter"):
        eng.submit(Request(uid=9, prompt=[1], adapter="nope"))
    # params/ids must travel together
    with pytest.raises(ValueError, match="disagree"):
        Engine(mp, CFG, EngineConfig(max_batch=2, max_len=16))
    with pytest.raises(ValueError, match="disagree"):
        Engine(base, CFG, EngineConfig(max_batch=2, max_len=16), adapter_ids=ids)
