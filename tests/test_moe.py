"""Mixture-of-experts (Mixtral family) tests.

The reference library has no MoE path (it swaps nn.Linear only and its e2e
example is dense Mistral-7B, examples/speed_test_mistral_7b.py); Mixtral is
the same model lineage with a sparse-MoE MLP, so MoE support is the natural
"switch your checkpoint over" extension.  Covered here:

* routing semantics (softmax -> top-k -> renormalize, HF MixtralSparseMoeBlock
  order) against a handcrafted router whose decisions are known;
* the two exact dispatch strategies (per-token dynamic-index for decode,
  static all-experts masked pass for prefill) agree with each other;
* dense MoE forward vs the independent weights-dict oracle
  (models.reference_forward); the external HF-transformers oracle lives in
  test_hf_oracle.py::mixtral;
* quantized MoE stays in the FP4 envelope for FIXED routing, with the caveat
  (asserted, not hidden) that end-to-end correlation is looser than dense
  families because 4-bit noise can flip near-tie router decisions;
* TP over the CPU mesh (stacked experts sharded like the dense MLP) vs the
  single-device oracle, fused and unfused;
* checkpoint save/load round-trip (stacked storage) and the streaming
  converter path, bit-exact vs in-memory quantization;
* the serving engine decodes a MoE model and matches plain generate().
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_bnb_fp4_tpu.models import (
    KVCache,
    ModelConfig,
    MoEParams,
    dense_linear,
    dense_params,
    expert_view,
    forward,
    fuse_params,
    generate,
    moe_forward,
    quantize_linear,
    quantize_params,
    random_weights,
    reference_forward,
    stack_linears,
)

CFG = ModelConfig.tiny_test(n_experts=4, experts_per_tok=2, n_layers=2)
TOKS = np.array([[3, 7, 2, 9, 11, 5], [1, 4, 6, 2, 8, 9]], np.int32)


@pytest.fixture(scope="module")
def weights():
    return random_weights(CFG, seed=3)


@pytest.fixture(scope="module")
def qparams(weights):
    return quantize_params(CFG, weights)


# -- routing unit test --------------------------------------------------------


def test_router_semantics_handcrafted():
    """Rank-1 experts with known outputs + a router whose decisions are
    forced: token 0 must route to experts (0,1) and token 1 to (2,3), each
    combined with renormalized top-2 softmax weights (HF Mixtral order:
    softmax over ALL experts, then top-k, then renormalize)."""
    d, f, e = CFG.dim, CFG.ffn_dim, CFG.n_experts
    consts = [0.5, 1.0, 2.0, 4.0]

    def rank1_expert(c):
        # y = (c/d) * silu(g . x) * (u . x) * e_0 — distinct per-expert scale
        g = np.zeros((f, d), np.float32); g[0, :] = 100.0 / d
        u = np.zeros((f, d), np.float32); u[0, :] = 1.0
        dn = np.zeros((d, f), np.float32); dn[0, 0] = c / d
        return g, u, dn

    gates, ups, downs = zip(*[rank1_expert(c) for c in consts])
    # router logits: token 0 -> experts 0 (3.0) and 1 (2.0); token 1 -> 2, 3
    rw = np.zeros((e, d), np.float32)
    rw[0, 0], rw[1, 0] = 3.0, 2.0
    rw[2, 1], rw[3, 1] = 3.0, 2.0
    moe = MoEParams(
        router=dense_linear(rw),
        gate=stack_linears([dense_linear(g) for g in gates]),
        up=stack_linears([dense_linear(u) for u in ups]),
        down=stack_linears([dense_linear(d_) for d_ in downs]),
    )
    x = np.zeros((2, d), np.float32)
    x[0, 0] = 1.0
    x[1, 1] = 1.0
    y = np.asarray(moe_forward(moe, CFG, jnp.asarray(x, jnp.bfloat16)))
    # top-2 logits are (3, 2) in both rows: renormalized weights e/(e+1), 1/(e+1)
    w_hi = np.e / (np.e + 1)
    gdot = 100.0 / d  # gate pre-activation for the selected input component
    h0 = gdot / (1.0 + np.exp(-gdot))  # silu(gdot) * (u . x = 1)

    def expect(c_hi, c_lo):
        return (w_hi * c_hi + (1 - w_hi) * c_lo) / d * h0

    assert np.allclose(y[0, 0], expect(consts[0], consts[1]), rtol=2e-2)
    assert np.allclose(y[1, 0], expect(consts[2], consts[3]), rtol=2e-2)
    # experts write only output component 0
    assert np.abs(y[:, 1:]).max() < 1e-6


@pytest.mark.slow
def test_dispatch_paths_agree(weights, qparams):
    """Per-token dynamic-index dispatch == static all-experts masked pass."""
    moe = qparams.layers[0].moe
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, CFG.dim)) * 0.05, jnp.bfloat16)
    y_tok = np.asarray(moe_forward(moe, CFG, x, force_dense=False))
    y_all = np.asarray(moe_forward(moe, CFG, x, force_dense=True))
    assert np.abs(y_tok - y_all).max() < 1e-4


def test_expert_view_static_vs_traced(qparams):
    moe = qparams.layers[0].moe
    st = expert_view(moe.gate, 2)
    tr = expert_view(moe.gate, jnp.int32(2))
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(tr)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


# -- model-level oracles ------------------------------------------------------


@pytest.mark.slow
def test_dense_moe_matches_reference(weights):
    ref = np.asarray(reference_forward(CFG, weights, TOKS))
    dp = dense_params(CFG, weights)
    got, _ = forward(dp, CFG, jnp.asarray(TOKS), KVCache.zeros(CFG, 2, 8))
    got = np.asarray(got)
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 2e-2, err
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.9999


@pytest.mark.slow
def test_quantized_moe_fixed_routing_envelope(weights, qparams):
    """With IDENTICAL routing (same hidden states into moe_forward), the
    quantized expert stack stays in the usual FP4 envelope.  End-to-end corr
    is intentionally looser (router flips on near-ties); assert both."""
    dmoe = dense_params(CFG, weights).layers[0].moe
    qmoe = qparams.layers[0].moe
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, CFG.dim)) * 0.05, jnp.bfloat16)
    yd = np.asarray(moe_forward(dmoe, CFG, x))
    yq = np.asarray(moe_forward(qmoe, CFG, x))
    assert np.corrcoef(yd.ravel(), yq.ravel())[0, 1] > 0.97
    # e2e: quantization may flip routing; demand corr > 0.9 over logits
    ref = np.asarray(reference_forward(CFG, weights, TOKS))
    got, _ = forward(qparams, CFG, jnp.asarray(TOKS), KVCache.zeros(CFG, 2, 8))
    assert np.corrcoef(np.asarray(got).ravel(), ref.ravel())[0, 1] > 0.9


@pytest.mark.slow
def test_decode_matches_prefill(qparams):
    """Incremental decode (per-token dispatch) tracks the all-at-once prefill
    (all-experts dispatch) position by position."""
    full, _ = forward(qparams, CFG, jnp.asarray(TOKS), KVCache.zeros(CFG, 2, 8))
    cache = KVCache.zeros(CFG, 2, 8)
    outs = []
    for i in range(TOKS.shape[1]):
        li, cache = forward(qparams, CFG, jnp.asarray(TOKS[:, i : i + 1]), cache)
        outs.append(np.asarray(li)[:, 0])
    inc = np.stack(outs, axis=1)
    ref = np.asarray(full)
    assert np.abs(inc - ref).max() / np.abs(ref).max() < 2e-2


@pytest.mark.slow
def test_fused_experts_match_unfused(qparams):
    fp = fuse_params(qparams)
    assert fp.layers[0].moe.gateup is not None and fp.layers[0].moe.gate is None
    a, _ = forward(qparams, CFG, jnp.asarray(TOKS), KVCache.zeros(CFG, 2, 8))
    b, _ = forward(fp, CFG, jnp.asarray(TOKS), KVCache.zeros(CFG, 2, 8))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-3


# -- TP on the CPU mesh -------------------------------------------------------


@pytest.mark.slow
@pytest.mark.parametrize("fuse", [False, True])
def test_moe_tp_matches_single_device(weights, qparams, fuse):
    from torch_bnb_fp4_tpu.parallel import tp as TP

    ref, _ = forward(qparams, CFG, jnp.asarray(TOKS), KVCache.zeros(CFG, 2, 8))
    params = fuse_params(qparams, tp=4) if fuse else qparams
    mesh = TP.make_mesh(n_model=4, n_data=2)
    sp = TP.shard_params(params, mesh)
    cache = TP.shard_cache(KVCache.zeros(CFG, 2, 8), mesh)
    fwd = TP.tp_forward_fn(sp, CFG, cache, mesh)
    got, _ = jax.jit(fwd)(sp, jnp.asarray(TOKS), cache)
    d = np.abs(np.asarray(got) - np.asarray(ref)).max() / np.abs(np.asarray(ref)).max()
    assert d < 2e-2, d


# -- checkpoint + converter ---------------------------------------------------


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, qparams):
    from torch_bnb_fp4_tpu.convert.checkpoint import load_checkpoint, save_checkpoint

    save_checkpoint(str(tmp_path / "ck"), CFG, qparams)
    cfg2, loaded = load_checkpoint(str(tmp_path / "ck"))
    assert cfg2.n_experts == CFG.n_experts
    a, _ = forward(qparams, CFG, jnp.asarray(TOKS), KVCache.zeros(CFG, 2, 8))
    b, _ = forward(loaded, cfg2, jnp.asarray(TOKS), KVCache.zeros(cfg2, 2, 8))
    assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_streaming_convert_matches_inmemory(tmp_path, weights, qparams):
    """CLI-style streaming conversion (multi-shard, experts as their own
    streaming groups) is bit-identical to in-memory quantization."""
    from safetensors.numpy import save_file

    from torch_bnb_fp4_tpu.convert import convert_hf_model, load_checkpoint

    src = tmp_path / "hf"
    src.mkdir()
    keys = sorted(weights)
    save_file({k: weights[k] for k in keys[::2]}, str(src / "model-00001-of-00002.safetensors"))
    save_file({k: weights[k] for k in keys[1::2]}, str(src / "model-00002-of-00002.safetensors"))
    with open(src / "config.json", "w") as f:
        json.dump(dict(
            vocab_size=CFG.vocab_size, hidden_size=CFG.dim,
            num_hidden_layers=CFG.n_layers, num_attention_heads=CFG.n_heads,
            num_key_value_heads=CFG.n_kv_heads, intermediate_size=CFG.ffn_dim,
            model_type="mixtral", num_local_experts=CFG.n_experts,
            num_experts_per_tok=CFG.experts_per_tok,
        ), f)
    stats = {}
    cfg2 = convert_hf_model(str(src), str(tmp_path / "out"), verbose=False, stats_out=stats)
    assert cfg2.n_experts == CFG.n_experts
    cfg3, params = load_checkpoint(str(tmp_path / "out"))
    a, _ = forward(qparams, CFG, jnp.asarray(TOKS), KVCache.zeros(CFG, 2, 8))
    b, _ = forward(params, cfg3, jnp.asarray(TOKS), KVCache.zeros(cfg3, 2, 8))
    assert np.array_equal(np.asarray(a), np.asarray(b))
    # experts streamed as their own groups: raw-float peak stays bounded by
    # attention groups + one expert, NOT the whole stacked MoE layer
    assert stats["groups"] == 3 + CFG.n_layers * (1 + CFG.n_experts)


# -- serving ------------------------------------------------------------------


@pytest.mark.slow
def test_engine_serves_moe(qparams):
    from torch_bnb_fp4_tpu.serve import Engine, EngineConfig, Request

    eng = Engine(qparams, CFG, EngineConfig(max_batch=2, max_len=32, inner_steps=2))
    reqs = [
        Request(uid=1, prompt=[3, 7, 2], max_new_tokens=6),
        Request(uid=2, prompt=[9, 11], max_new_tokens=5),
    ]
    res = eng.run(reqs)
    for r in reqs:
        want = np.asarray(generate(
            qparams, CFG, jnp.asarray([r.prompt], jnp.int32), max_new_tokens=r.max_new_tokens
        ))[0].tolist()
        assert res[r.uid].tokens == want, r.uid


# -- zero-copy expert kernel --------------------------------------------------


@pytest.mark.slow
def test_expert_kernel_matches_materialized_view():
    """apply_expert_linear (scalar-prefetch expert index inside the Pallas
    grid) is BIT-identical to materializing the expert (expert_view) and
    running apply_linear — GEMV and GEMM shapes, static and traced indices,
    fp4 and nf4-lut codebooks."""
    from torch_bnb_fp4_tpu.models import quantize_linear
    from torch_bnb_fp4_tpu.models.linear import apply_expert_linear

    rng = np.random.default_rng(0)
    E, N, K = 4, 256, 1024
    for qt in ("fp4", "nf4"):
        qs = [
            quantize_linear(
                rng.standard_normal((N, K)).astype(np.float32) * 0.02,
                rng.standard_normal(N).astype(np.float32) * 0.01 if qt == "fp4" else None,
                quant_type=qt,
            )
            for _ in range(E)
        ]
        sq = stack_linears(qs)
        for m in (1, 24):
            x = jnp.asarray(rng.standard_normal((m, K)) * 0.05, jnp.bfloat16)
            for e in (0, E - 1):
                ref = np.asarray(expert_view(sq, e)(x))
                got = np.asarray(apply_expert_linear(sq, e, x))
                got_tr = np.asarray(
                    jax.jit(lambda s, i, xx: apply_expert_linear(s, i, xx))(sq, jnp.int32(e), x)
                )
                assert np.array_equal(ref, got), (qt, m, e)
                assert np.array_equal(ref, got_tr), (qt, m, e, "traced")


@pytest.mark.slow
def test_expert_kernel_w4a8_path():
    """M >= 512 engages the int8-MXU m-inner kernel; the expert wrapper must
    stay bit-identical to the materialized path there too."""
    from torch_bnb_fp4_tpu.models import quantize_linear
    from torch_bnb_fp4_tpu.models.linear import apply_expert_linear

    rng = np.random.default_rng(1)
    qs = [quantize_linear(rng.standard_normal((128, 1024)).astype(np.float32) * 0.02)
          for _ in range(2)]
    sq = stack_linears(qs)
    x = jnp.asarray(rng.standard_normal((512, 1024)) * 0.05, jnp.bfloat16)
    ref = np.asarray(expert_view(sq, 1)(x))
    got = np.asarray(apply_expert_linear(sq, jnp.int32(1), x))
    assert np.array_equal(ref, got)
