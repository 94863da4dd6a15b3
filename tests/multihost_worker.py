"""Worker process for the 2-process multi-host test (run by
tests/test_multihost.py, not collected by pytest).

Each process owns 4 virtual CPU devices; `jax.distributed.initialize` joins
them into one 8-device system over a local TCP coordinator — the same
bring-up path a real multi-host TPU slice uses (parallel.init_multihost),
with TCP standing in for DCN.  Both processes run the identical SPMD
program: build the same tiny model, globalize the sharded params with
jax.make_array_from_callback, run the shard_map'd TP forward, allgather the
logits, and compare against the locally-computed single-device oracle.

Usage: python multihost_worker.py <process_id> <num_processes> <coordinator>
"""

import os
import sys

pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=nproc, process_id=pid)
assert jax.process_index() == pid
assert jax.device_count() == 4 * nproc, jax.device_count()
assert len(jax.local_devices()) == 4

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from torch_bnb_fp4_tpu.models import KVCache, ModelConfig, forward, quantize_params
from torch_bnb_fp4_tpu.models import transformer as T
from torch_bnb_fp4_tpu.parallel import (
    DATA_AXIS,
    cache_specs,
    make_mesh,
    param_specs,
    shard_cache,
    shard_params,
    tp_forward_fn,
    validate_tp,
)

cfg = ModelConfig.tiny_test(n_layers=1)
n_model, n_data = 4, nproc
validate_tp(cfg, n_model)
mesh = make_mesh(n_model=n_model, n_data=n_data)  # jax.devices() spans processes

weights = T.random_weights(cfg, seed=21)
params = quantize_params(cfg, weights)  # identical on every process (same seed)


def globalize(tree, specs):
    # per-tensor specs (tokens); params/cache go through the library's
    # shard_params/shard_cache, whose multi-process path this test pins
    def put(x, spec):
        x = np.asarray(jax.device_get(x))
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, tree, specs)


gparams = shard_params(params, mesh)
b, max_len, lp = n_data, 8, 3
cache = KVCache.zeros(cfg, b, max_len)
gcache = shard_cache(cache, mesh)
tokens = np.tile(np.asarray([[1, 2, 3]], np.int32), (b, 1))
gtokens = globalize(tokens, P(DATA_AXIS, None))

fwd = jax.jit(tp_forward_fn(gparams, cfg, gcache, mesh))
logits, gcache2 = fwd(gparams, gtokens, gcache)
full = multihost_utils.process_allgather(logits, tiled=True)
lengths = multihost_utils.process_allgather(gcache2.length, tiled=True)

# single-device oracle, computed locally by each process.  Tolerance matches
# tests/test_parallel.py: bf16 hidden states pick up ~1-2 ulps of
# XLA-reassociation noise per layer between the jitted shard_map body and the
# eager oracle; logits amplify it via cancellation (ceiling ~0.02 abs).
def close(got, want):
    got, want = np.asarray(got), np.asarray(want)
    assert np.abs(got - want).max() < 0.05, np.abs(got - want).max()
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999


want, _ = forward(params, cfg, jnp.asarray(tokens), KVCache.zeros(cfg, b, max_len))
close(full, want)
assert (np.asarray(lengths) == lp).all(), lengths

# one decode step through the same program (cache carried across processes);
# oracle continues the locally-computed single-device cache
gtok1 = globalize(np.full((b, 1), 7, np.int32), P(DATA_AXIS, None))
logits2, _ = fwd(gparams, gtok1, gcache2)
full2 = multihost_utils.process_allgather(logits2, tiled=True)
_, oc = forward(params, cfg, jnp.asarray(tokens), KVCache.zeros(cfg, b, max_len))
want2, _ = forward(params, cfg, jnp.full((b, 1), 7, jnp.int32), oc)
close(full2, want2)

print(f"MULTIHOST_OK pid={pid} devices={jax.device_count()} "
      f"mesh=data{n_data}xmodel{n_model}", flush=True)

# ---------------------------------------------------------------------------
# Engine across processes (VERDICT r2 next #3): the SAME continuous-batching
# host loop runs in lockstep on every process over the process-spanning
# data x model mesh — per-host request feeding (identical shared stream),
# one PRNG seed, slot state kept consistent by Engine._host_fetch's
# allgather of the data-sharded per-slot tokens.  Greedy completions must
# match the locally-computed single-process oracle token-for-token.
# ---------------------------------------------------------------------------
from torch_bnb_fp4_tpu.models import generate
from torch_bnb_fp4_tpu.serve import Engine, EngineConfig, Request

eng = Engine(
    gparams, cfg,
    EngineConfig(max_batch=2 * n_data, max_len=16, inner_steps=2),
    mesh=mesh,
)
reqs = [
    Request(uid=1, prompt=[1, 2, 3], max_new_tokens=5),
    Request(uid=2, prompt=[4, 5], max_new_tokens=6),
    Request(uid=3, prompt=[6, 7, 8, 9], max_new_tokens=4),
    Request(uid=4, prompt=[2, 2], max_new_tokens=3),
    Request(uid=5, prompt=[7], max_new_tokens=4),  # > max_batch: slot recycling
]
res = eng.run(reqs)
for r in reqs:
    want = np.asarray(
        generate(params, cfg, jnp.asarray([r.prompt], jnp.int32), max_new_tokens=r.max_new_tokens)
    )[0].tolist()
    got = res[r.uid].tokens
    assert got == want, (pid, r.uid, got, want)

# cross-process agreement on the full completion set (belt and braces)
blob = np.asarray([t for r in reqs for t in res[r.uid].tokens], np.int32)
all_blobs = multihost_utils.process_allgather(blob)
assert (np.asarray(all_blobs) == blob[None, :]).all(), "processes disagree on completions"

print(f"MULTIHOST_ENGINE_OK pid={pid} completions={len(res)}", flush=True)

# ---------------------------------------------------------------------------
# Serving features with host-side state across processes: prefix caching
# (donor search + KV fork) and speculative decoding (history-driven drafts)
# both depend on every process holding identical slot bookkeeping — one
# divergent branch desyncs the SPMD program streams.  Greedy completions
# must still match the single-process oracle exactly.
# ---------------------------------------------------------------------------
SYS = list(range(3, 39))  # 36-token shared prefix (>= one 32-token grain)
eng2 = Engine(
    gparams, cfg,
    EngineConfig(max_batch=2 * n_data, max_len=56, inner_steps=2,
                 prefix_cache=True, spec_tokens=2),
    mesh=mesh,
)
reqs2 = [
    Request(uid=1, prompt=SYS + [40, 41], max_new_tokens=5),
    Request(uid=2, prompt=SYS + [50], max_new_tokens=6),
    Request(uid=3, prompt=[9, 8], max_new_tokens=4),
]
res2 = eng2.run(reqs2)
for r in reqs2:
    want = np.asarray(
        generate(params, cfg, jnp.asarray([r.prompt], jnp.int32), max_new_tokens=r.max_new_tokens)
    )[0].tolist()
    assert res2[r.uid].tokens == want, (pid, r.uid, res2[r.uid].tokens, want)
st2 = eng2.stats()
assert st2["prefix_hits"] >= 1, st2
blob2 = np.asarray([t for r in reqs2 for t in res2[r.uid].tokens], np.int32)
all2 = multihost_utils.process_allgather(blob2)
assert (np.asarray(all2) == blob2[None, :]).all(), "processes disagree (prefix/spec)"

print(f"MULTIHOST_FEATURES_OK pid={pid} prefix_hits={st2['prefix_hits']}", flush=True)

# ---------------------------------------------------------------------------
# Multi-host SERVING at the product level: HTTP front-end on process 0,
# followers in serve.multihost.follow — each tick's submissions broadcast
# so every process's engine steps in lockstep (serve/multihost.py).
# ---------------------------------------------------------------------------
from torch_bnb_fp4_tpu.serve import MultihostEngineServer, follow

eng3 = Engine(
    gparams, cfg,
    EngineConfig(max_batch=2 * n_data, max_len=16, inner_steps=2),
    mesh=mesh,
)
CASES = ((1, [1, 2, 3], 4), (2, [4, 5], 3))
if pid == 0:
    import json as _json
    import threading
    import urllib.request

    srv = MultihostEngineServer(eng3, port=0).start()

    def post(body):
        r = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/v1/completions",
            data=_json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(r, timeout=300) as resp:
            return _json.loads(resp.read())

    out = {}

    def go(key, prompt, n):
        out[key] = post({"prompt": prompt, "max_tokens": n})

    ts = [threading.Thread(target=go, args=c) for c in CASES]
    for th in ts:
        th.start()
    for th in ts:
        th.join(timeout=300)
    for key, prompt, n in CASES:
        want = np.asarray(
            generate(params, cfg, jnp.asarray([prompt], jnp.int32), max_new_tokens=n)
        )[0].tolist()
        assert out[key]["tokens"] == want, (key, out[key], want)
    srv.stop()
else:
    follow(eng3)  # returns when process 0's server stops
# every process saw the same served tokens (engine state is lockstep)
served = np.asarray(
    [t for c in sorted(eng3.completions, key=lambda c: c.uid) for t in c.tokens],
    np.int32,
)
all_served = multihost_utils.process_allgather(served)
assert (np.asarray(all_served) == served[None, :]).all(), "HTTP serving desynced"

print(f"MULTIHOST_HTTP_OK pid={pid} served={len(eng3.completions)}", flush=True)
