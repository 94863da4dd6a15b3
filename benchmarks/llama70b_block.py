"""Llama-2-70B geometry on real TPU (BASELINE config 5 compute evidence).

A full 70B model does not fit one v5e (35GB packed FP4 vs 16GB HBM); the
multi-host sharding path is exercised by tests/test_multihost.py and
tests/test_parallel.py (the same shard_map program at any scale).  This
benchmark runs ONE full decoder block at the TRUE 70B dims (dim 8192,
ffn 28672, 64 q heads / 8 kv heads) on one chip — the per-layer compute
every shard of a tp=8 deployment would run (a tp=8 shard holds 1/8 of each
weight, so the per-device shapes are SMALLER than this; one full block is
the conservative upper bound) — and compares FP4 vs bf16 decode-step time.
"""

import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from torch_bnb_fp4_tpu.models import KVCache, ModelConfig
from torch_bnb_fp4_tpu.models import transformer as T
from torch_bnb_fp4_tpu.utils import calibrate_rtt
from torch_bnb_fp4_tpu.utils.synth import synth_params

REP = 100


def main():
    cfg = dataclasses.replace(ModelConfig.llama2_70b(), n_layers=1)
    rtt = calibrate_rtt()
    print(f"backend={jax.default_backend()} rtt={rtt*1e3:.1f}ms "
          f"dim={cfg.dim} ffn={cfg.ffn_dim} heads={cfg.n_heads}/{cfg.n_kv_heads}",
          flush=True)

    from functools import partial

    results = {}
    for name, quantized in (("fp4", True), ("bf16", False)):
        # the fp4 engine quantizes lm_head too (bench.py default): at 70B a
        # dense bf16 lm_head (0.52GB) would dominate a single block's step
        c = dataclasses.replace(cfg, quantize_lm_head=quantized)
        params = synth_params(c, quantized=quantized, seed=0, fuse=quantized)
        jax.block_until_ready(params)
        cache = KVCache.zeros(cfg, 1, 64)
        tok = jnp.zeros((1,), jnp.int32)

        @partial(jax.jit, static_argnames=("n",))
        def run(params, tok, cache, n, c=c):
            def body(carry, _):
                tok, cache = carry
                logits, cache = T.forward(params, c, tok[:, None], cache)
                return (jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache), ()

            (tok, _), _ = jax.lax.scan(body, (tok, cache), None, length=n)
            return tok

        int(run(params, tok, cache, REP)[0])
        int(run(params, tok, cache, 2 * REP)[0])
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            int(run(params, tok, cache, REP)[0])
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            int(run(params, tok, cache, 2 * REP)[0])
            best = min(best, max(time.perf_counter() - t0 - t1, 0.0))
        per = best / REP
        results[name] = per
        # one block's linear weights (fused lm_head excluded: n_layers=1 but
        # the step also runs embed + lm_head — report the step as measured)
        print(f"{name}: {per*1e6:.1f}us / block-step", flush=True)
        del params

    print(f"ratio fp4/bf16: {results['bf16']/results['fp4']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
