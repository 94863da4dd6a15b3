"""Fused QKV / gate|up projection tests: fused forward must match unfused
(same codes/scales per column, same K-block dot order), single-chip and TP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_bnb_fp4_tpu.models import (
    KVCache,
    ModelConfig,
    forward,
    fuse_params,
    quantize_params,
)
from torch_bnb_fp4_tpu.models import transformer as T

# multi-second scan/compile tests: deselect with -m 'not slow' (<2min fast path)
pytestmark = pytest.mark.slow

CFG = ModelConfig.tiny_test()


@pytest.fixture(scope="module")
def weights():
    return T.random_weights(CFG, seed=13)


def test_fused_forward_matches_unfused(weights):
    params = quantize_params(CFG, weights)
    fused = fuse_params(params)
    assert fused.layers[0].wq is None and fused.layers[0].wqkv is not None
    tokens = jnp.asarray([[4, 5, 6, 7]], jnp.int32)
    l1, c1 = forward(params, CFG, tokens, KVCache.zeros(CFG, 1, 6))
    l2, c2 = forward(fused, CFG, tokens, KVCache.zeros(CFG, 1, 6))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(c1.k[0], np.float32), np.asarray(c2.k[0], np.float32), rtol=1e-3, atol=1e-4
    )


def test_fused_tp_matches_single_device(weights):
    from torch_bnb_fp4_tpu.parallel import (
        make_mesh,
        quantize_params_tp,
        shard_cache,
        shard_params,
        tp_forward_fn,
    )

    n_model = 4
    mesh = make_mesh(n_model=n_model, n_data=1)
    params_tp = shard_params(quantize_params_tp(CFG, weights, tp=n_model, fuse=True), mesh)
    assert params_tp.layers[0].wqkv is not None
    params_1 = quantize_params(CFG, weights)

    b, l, max_len = 2, 5, 8
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (b, l)), jnp.int32)
    ref, _ = forward(params_1, CFG, tokens, KVCache.zeros(CFG, b, max_len))

    cache = shard_cache(KVCache.zeros(CFG, b, max_len), mesh)
    fwd = jax.jit(tp_forward_fn(params_tp, CFG, cache, mesh))
    got, _ = fwd(params_tp, tokens, cache)
    got, ref = np.asarray(got), np.asarray(ref)
    assert np.abs(got - ref).max() < 0.05, np.abs(got - ref).max()
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999


def test_fused_tp_decode_steps(weights):
    """Fused params through the TP mesh decode path (prefill + 2 steps),
    teacher-forced against the unfused single-device oracle."""
    from torch_bnb_fp4_tpu.parallel import (
        make_mesh,
        quantize_params_tp,
        shard_cache,
        shard_params,
        tp_forward_fn,
    )

    mesh = make_mesh(n_model=4, n_data=1)
    params_tp = shard_params(quantize_params_tp(CFG, weights, tp=4, fuse=True), mesh)
    params_1 = quantize_params(CFG, weights)

    b, max_len = 1, 6
    seq = jnp.asarray([[2, 7, 1, 8, 2]], jnp.int32)
    prompt, forced = seq[:, :3], seq[:, 3:]

    cache1 = KVCache.zeros(CFG, b, max_len)
    ref = []
    lg, cache1 = forward(params_1, CFG, prompt, cache1)
    ref.append(np.asarray(lg[:, -1]))
    for i in range(forced.shape[1]):
        lg, cache1 = forward(params_1, CFG, forced[:, i : i + 1], cache1)
        ref.append(np.asarray(lg[:, -1]))

    cache = shard_cache(KVCache.zeros(CFG, b, max_len), mesh)
    fwd = jax.jit(tp_forward_fn(params_tp, CFG, cache, mesh))
    got = []
    lg, cache = fwd(params_tp, prompt, cache)
    got.append(np.asarray(lg[:, -1]))
    for i in range(forced.shape[1]):
        lg, cache = fwd(params_tp, forced[:, i : i + 1], cache)
        got.append(np.asarray(lg[:, -1]))

    for r, t in zip(ref, got):
        assert np.abs(r - t).max() < 0.05
        assert np.corrcoef(r.ravel(), t.ravel())[0, 1] > 0.999


def test_fused_checkpoint_load(tmp_path, weights):
    from torch_bnb_fp4_tpu.convert import load_checkpoint, save_checkpoint

    params = quantize_params(CFG, weights)
    save_checkpoint(str(tmp_path / "c"), CFG, params)
    cfg2, fused = load_checkpoint(str(tmp_path / "c"), fuse=True)
    assert fused.layers[0].wqkv is not None
    tokens = jnp.asarray([[1, 2]], jnp.int32)
    l1, _ = forward(params, CFG, tokens, KVCache.zeros(CFG, 1, 2))
    l2, _ = forward(fused, cfg2, tokens, KVCache.zeros(cfg2, 1, 2))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-4)
