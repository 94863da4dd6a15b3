"""Batched-decode step attribution: where does the extra time go as decode
slots fill (batch 1 -> 16)?

The continuous-batching decode step runs all B slots through one (B, 1)
forward; weights stream once regardless of B, so the step SHOULD be nearly
flat in B (that amortization is the whole point of continuous batching —
round-2 measured 6.7 -> 10.3 ms from B=1 to 16 on Mistral-7B).  This script
splits the step into:

  linears   — the fused dequant matmuls only (same QuantLinears, (B, dim)
              activations, no attention/cache): the weight-bound floor
  full      — the real decode step (forward with KV cache at a given context)

full - linears = attention (KV read grows linearly in B*context) + cache
update + rope/norms + sampling argmax.  Run at two context lengths to split
the KV-linear part from the fixed part.

Usage: python benchmarks/batch_decode_attrib.py [model] [ctx] [steps]
       (defaults: mistral7b 1024 64)
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from torch_bnb_fp4_tpu.models import KVCache, ModelConfig, forward
from torch_bnb_fp4_tpu.utils.synth import synth_params


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def median_diff(run, args1, args2, rounds=5):
    """Interleaved difference timing (bench.py methodology): median of
    positive (long - short) wall times; RTT and fixed overheads cancel."""
    diffs = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        run(*args1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(*args2)
        t2 = time.perf_counter() - t0
        if t2 - t1 > 0:
            diffs.append(t2 - t1)
    if not diffs:
        return float("nan")
    diffs.sort()
    mid = len(diffs) // 2
    return diffs[mid] if len(diffs) % 2 else 0.5 * (diffs[mid - 1] + diffs[mid])


def time_full_step(params, cfg, batch, ctx, steps):
    import dataclasses

    cache = KVCache.zeros(cfg, batch, ctx + 2 * steps + 8)
    tok = jnp.zeros((batch,), jnp.int32)

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(2,))
    def run(params, tok, cache, n):
        # every call re-ages the cache to ctx rows: attention reads a fixed
        # realistic KV span, and repeated donated calls never overflow capacity
        cache = dataclasses.replace(cache, length=jnp.full_like(cache.length, ctx))

        def body(carry, _):
            tok, cache = carry
            logits, cache = forward(params, cfg, tok[:, None], cache)
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (tok, cache), ()

        (tok, cache), _ = jax.lax.scan(body, (tok, cache), None, length=n)
        return tok, cache

    def go(n):
        nonlocal cache
        t, c = run(params, tok, cache, n)
        int(t[0])
        # re-donate: rebuild an aged cache each call is wrong (shapes ok but
        # content irrelevant for timing); reuse the returned cache
        cache = c

    go(steps)
    go(2 * steps)  # compile both lengths
    return median_diff(lambda n: go(n), (steps,), (2 * steps,)) / steps


def time_linears_only(params, cfg, batch, steps):
    """The per-layer fused linears + lm_head on (B, dim) activations —
    weight DMA identical to the full step, no attention/cache/rope."""
    x = jnp.zeros((batch, cfg.dim), jnp.bfloat16)

    @partial(jax.jit, static_argnames=("n",))
    def run(params, x, n):
        def body(x, _):
            for lp in params.layers:
                qkv = lp.wqkv(x) if lp.wqkv is not None else jnp.concatenate(
                    [lp.wq(x), lp.wk(x), lp.wv(x)], axis=-1)
                # feed a dim-sized slice back through o/mlp to keep the
                # data dependency without attention
                h = lp.wo(qkv[:, : cfg.dim]).astype(jnp.bfloat16)
                gu = lp.w_gateup(h) if lp.w_gateup is not None else jnp.concatenate(
                    [lp.w_gate(h), lp.w_up(h)], axis=-1)
                gate, up = jnp.split(gu, 2, axis=-1)
                y = lp.w_down(jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up)
                x = (x + y[:, : cfg.dim]).astype(jnp.bfloat16)
            out = params.lm_head(x) if callable(params.lm_head) else x @ params.lm_head
            return (x + out[:, : cfg.dim]).astype(jnp.bfloat16), ()

        x, _ = jax.lax.scan(body, x, None, length=n)
        return x

    float(run(params, x, steps)[0, 0])
    float(run(params, x, 2 * steps)[0, 0])
    return median_diff(
        lambda n: float(run(params, x, n)[0, 0]), (steps,), (2 * steps,)
    ) / steps


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "mistral7b"
    ctx = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    cfg = {"mistral7b": ModelConfig.mistral_7b,
           "tinyllama": ModelConfig.tinyllama_1b,
           "tiny": ModelConfig.tiny_test}[model]()
    log(f"building {model} (synth, fused)...")
    t0 = time.perf_counter()
    params = synth_params(cfg, fuse=True)
    jax.block_until_ready(params.layers[0].wqkv.packed)
    log(f"  built in {time.perf_counter()-t0:.1f}s")

    print(f"{'B':>3} {'ctx':>5} {'full ms':>8} {'linears ms':>10} {'attn+rest ms':>12} {'agg tok/s':>9}")
    for batch in (1, 4, 8, 16):
        lin = time_linears_only(params, cfg, batch, steps) * 1e3
        rows = []
        for c in (ctx // 4, ctx):
            full = time_full_step(params, cfg, batch, c, steps) * 1e3
            rows.append((c, full))
            print(f"{batch:>3} {c:>5} {full:>8.2f} {lin:>10.2f} {full-lin:>12.2f} "
                  f"{batch/full*1e3:>9.0f}", flush=True)
        (c1, f1), (c2, f2) = rows
        if f2 > f1:
            per_kv = (f2 - f1) / (c2 - c1) * 1e3  # us per context token
            print(f"    kv-length cost: {per_kv:.2f} us/ctx-token at B={batch} "
                  f"(fixed part ~{f1 - per_kv*c1/1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
