"""Continuous-batching engine tests (CPU interpret).

Oracle: engine output for each request == standalone generate() of the same
prompt (same params, greedy).  Also exercises slot recycling (more requests
than slots), EOS stop, and mixed prompt lengths in flight together.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from torch_bnb_fp4_tpu.models import ModelConfig, generate, quantize_params
from torch_bnb_fp4_tpu.models import transformer as T
from torch_bnb_fp4_tpu.serve import Engine, EngineConfig, Request

CFG = ModelConfig.tiny_test(n_layers=1)


@pytest.fixture(scope="module")
def params():
    return quantize_params(CFG, T.random_weights(CFG, seed=9))


def _oracle(params, prompt, n):
    out = generate(params, CFG, jnp.asarray([prompt], jnp.int32), max_new_tokens=n)
    return np.asarray(out)[0].tolist()


def test_single_request_matches_generate(params):
    eng = Engine(params, CFG, EngineConfig(max_batch=2, max_len=32))
    res = eng.run([Request(uid=1, prompt=[5, 6, 7], max_new_tokens=6)])
    assert res[1].tokens == _oracle(params, [5, 6, 7], 6)
    assert res[1].finish_reason == "length"


def test_continuous_batching_slot_recycling(params):
    """4 requests through 2 slots, different lengths, all match the oracle."""
    eng = Engine(params, CFG, EngineConfig(max_batch=2, max_len=32))
    reqs = [
        Request(uid=1, prompt=[1, 2, 3], max_new_tokens=5),
        Request(uid=2, prompt=[4, 5], max_new_tokens=8),
        Request(uid=3, prompt=[6, 7, 8, 9], max_new_tokens=3),
        Request(uid=4, prompt=[1], max_new_tokens=4),
    ]
    res = eng.run(reqs)
    assert set(res) == {1, 2, 3, 4}
    for r in reqs:
        assert res[r.uid].tokens == _oracle(params, r.prompt, r.max_new_tokens), r.uid


def test_eos_stops_early(params):
    # discover what the model emits, then use its 2nd token as "EOS";
    # generation must stop at the FIRST occurrence of that token
    probe = _oracle(params, [2, 3], 6)
    eos = probe[1]
    expected = probe[: probe.index(eos) + 1]
    eng = Engine(params, CFG, EngineConfig(max_batch=2, max_len=32))
    res = eng.run([Request(uid=7, prompt=[2, 3], max_new_tokens=6, eos_id=eos)])
    assert res[7].finish_reason == "eos"
    assert res[7].tokens == expected


def test_temperature_sampling_valid_and_seeded(params):
    """Sampled generation is deterministic per seed and differs across seeds
    (for a near-uniform random model)."""
    reqs = lambda: [Request(uid=1, prompt=[3, 4, 5], max_new_tokens=8)]
    out_a = Engine(params, CFG, EngineConfig(max_batch=1, max_len=32, temperature=1.0, seed=1)).run(reqs())
    out_b = Engine(params, CFG, EngineConfig(max_batch=1, max_len=32, temperature=1.0, seed=1)).run(reqs())
    out_c = Engine(params, CFG, EngineConfig(max_batch=1, max_len=32, temperature=1.0, seed=2)).run(reqs())
    assert out_a[1].tokens == out_b[1].tokens
    assert out_a[1].tokens != out_c[1].tokens
    assert all(0 <= t < CFG.vocab_size for t in out_a[1].tokens)
    # top-k restricts candidates but still returns valid tokens
    out_k = Engine(params, CFG, EngineConfig(max_batch=1, max_len=32, temperature=1.0, top_k=2, seed=3)).run(reqs())
    assert len(out_k[1].tokens) == 8


def test_prompt_too_long_rejected(params):
    eng = Engine(params, CFG, EngineConfig(max_batch=1, max_len=8))
    with pytest.raises(ValueError):
        eng.submit(Request(uid=1, prompt=list(range(9)), max_new_tokens=1))
