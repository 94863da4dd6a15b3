"""Prefix-cache (shared-prompt KV reuse) tests.

The core property is EXACTNESS: attention is causal, so the KV rows of a
prompt prefix depend only on the prefix itself — forking a live slot's rows
for a shared prefix instead of recomputing them must leave completions
token-for-token equal to the plain-decode oracle.  On top of that the donor
search is unit-tested and the stats counters assert reuse actually happened.

The reference has no serving layer and recomputes every prompt from scratch
(examples/speed_test_mistral_7b.py is a single model.generate call); prefix
caching is north-star serving scope (the shared-system-prompt pattern).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from torch_bnb_fp4_tpu.models import ModelConfig, generate, quantize_params
from torch_bnb_fp4_tpu.models import transformer as T
from torch_bnb_fp4_tpu.serve import Engine, EngineConfig, Request

# multi-second scan/compile tests: deselect with -m 'not slow' (<2min fast path)
pytestmark = pytest.mark.slow

CFG = ModelConfig.tiny_test(n_layers=1)

SYS = [7, 3, 9, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3,
       8, 4, 6, 2, 6, 4, 3, 3, 8, 3, 2, 7, 9, 5, 0, 2]  # 36-token "system prompt"


@pytest.fixture(scope="module")
def params():
    return quantize_params(CFG, T.random_weights(CFG, seed=3))


def _oracle(params, prompt, n):
    out = generate(params, CFG, jnp.asarray([prompt], jnp.int32), max_new_tokens=n)
    return np.asarray(out)[0].tolist()


def test_donor_search_units(params):
    eng = Engine(params, CFG, EngineConfig(max_batch=4, max_len=64, prefix_cache=True))
    eng.slot_req[1] = Request(uid=1, prompt=SYS + [11, 12])
    eng.slot_req[2] = Request(uid=2, prompt=SYS[:8])
    # 36 shared tokens -> snapped to 32; donor = the longer-prefix slot
    assert eng._find_prefix_donor(SYS + [13], 32) == (1, 32)
    # reuse capped at len(prompt)-1 then snapped: a 33-token prompt sharing
    # all 33 tokens can reuse at most 32
    assert eng._find_prefix_donor((SYS + [11, 12])[:33], 32) == (1, 32)
    # under one grain -> no donor
    assert eng._find_prefix_donor(SYS[:31] + [99], 32) is None
    assert eng._find_prefix_donor([99] * 40, 32) is None
    # grain snapping for chunked mode
    assert eng._find_prefix_donor(SYS + [13], 64) is None


def test_prefix_engine_matches_oracle(params):
    """Completions with prefix caching == plain decode, token for token;
    the second/third requests fork the first's KV (counters prove it)."""
    eng = Engine(
        params, CFG,
        EngineConfig(max_batch=4, max_len=64, inner_steps=2, prefix_cache=True),
    )
    reqs = [
        Request(uid=1, prompt=SYS + [11, 12], max_new_tokens=8),
        Request(uid=2, prompt=SYS + [21, 22, 23], max_new_tokens=8),
        Request(uid=3, prompt=SYS[:34] + [31], max_new_tokens=6),
        Request(uid=4, prompt=[5, 6, 7], max_new_tokens=5),  # no shared prefix
    ]
    res = eng.run(reqs)
    for r in reqs:
        assert res[r.uid].tokens == _oracle(params, r.prompt, r.max_new_tokens), r.uid
    st = eng.stats()
    assert st["prefix_hits"] >= 2, st
    assert st["prefix_tokens_reused"] >= 64, st


def test_prefix_identical_prompts(params):
    """Identical prompts: reuse snaps to < len(prompt); both exact."""
    prompt = SYS[:33]
    eng = Engine(
        params, CFG,
        EngineConfig(max_batch=2, max_len=64, prefix_cache=True),
    )
    res = eng.run([
        Request(uid=1, prompt=prompt, max_new_tokens=6),
        Request(uid=2, prompt=prompt, max_new_tokens=6),
    ])
    want = _oracle(params, prompt, 6)
    assert res[1].tokens == want and res[2].tokens == want
    assert eng.stats()["prefix_hits"] == 1


def test_prefix_with_chunked_prefill(params):
    """Prefix fork seeds the chunked-admission path (reuse snapped to the
    chunk size); completions stay oracle-exact."""
    eng = Engine(
        params, CFG,
        EngineConfig(max_batch=2, max_len=96, inner_steps=2,
                     prefill_chunk=32, prefix_cache=True),
    )
    reqs = [
        Request(uid=1, prompt=SYS + SYS[:8], max_new_tokens=6),
        Request(uid=2, prompt=SYS + [41, 42], max_new_tokens=8),
    ]
    res = eng.run(reqs)
    for r in reqs:
        assert res[r.uid].tokens == _oracle(params, r.prompt, r.max_new_tokens), r.uid
    st = eng.stats()
    assert st["prefix_hits"] == 1 and st["prefix_tokens_reused"] == 32, st


def test_prefix_on_data_model_mesh(params):
    """Prefix fork on a data=2 x model=2 mesh: the donor slot's KV rows live
    data-sharded; the fork's dynamic_slice crosses the sharded batch dim and
    the spliced result must still be oracle-exact."""
    from torch_bnb_fp4_tpu.parallel import make_mesh, shard_params, validate_tp

    validate_tp(CFG, 2)
    mesh = make_mesh(n_model=2, n_data=2)
    sparams = shard_params(params, mesh)
    eng = Engine(
        sparams, CFG,
        EngineConfig(max_batch=4, max_len=64, inner_steps=2, prefix_cache=True),
        mesh=mesh,
    )
    reqs = [
        Request(uid=1, prompt=SYS + [11, 12], max_new_tokens=6),
        Request(uid=2, prompt=SYS + [21, 22], max_new_tokens=6),
        Request(uid=3, prompt=[5, 6], max_new_tokens=4),
    ]
    res = eng.run(reqs)
    for r in reqs:
        assert res[r.uid].tokens == _oracle(params, r.prompt, r.max_new_tokens), r.uid
    assert eng.stats()["prefix_hits"] >= 1


def test_prefix_warmup_no_retrace(params):
    eng = Engine(
        params, CFG,
        EngineConfig(max_batch=2, max_len=64, inner_steps=2, prefix_cache=True),
    )
    eng.warmup(max_prompt_len=40)
    traced = dict(eng.traces)
    assert traced["fork"] >= 1
    res = eng.run([
        Request(uid=1, prompt=SYS + [11], max_new_tokens=5),
        Request(uid=2, prompt=SYS + [22, 23], max_new_tokens=5),
    ])
    assert eng.traces == traced, (traced, eng.traces)
    for r in (1, 2):
        pl = SYS + [11] if r == 1 else SYS + [22, 23]
        assert res[r].tokens == _oracle(params, pl, 5)
