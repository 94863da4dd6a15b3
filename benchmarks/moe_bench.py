"""Mixtral MoE perf probe (real TPU).

Three questions, each feeding a design decision:

1. Batch-1 decode step on a Mixtral-geometry model (8 of the 32 layers so
   FP4 weights fit one v5e chip): ms/step and the EFFECTIVE bandwidth vs the
   active-weight bytes (attention + experts_per_tok experts per layer).  The
   per-token dispatch `dynamic_index`es each active expert out of the stacked
   weights, which XLA materializes as a copy before the GEMV reads it — if
   achieved GB/s lands near HALF the dense-model number, that copy is the
   bottleneck and a scalar-prefetch expert kernel (index the expert inside
   the Pallas grid, zero copies) is the fix.

2. Prefill chunk (M=256): all-experts masked pass cost vs the ideal
   experts_per_tok/n_experts fraction of it.

3. Dispatch crossover: per-token vs all-experts strategies at B = 1..16
   single-token rows — calibrates the trace-time threshold in
   models/transformer.moe_forward (currently T*k <= E).

Run: python benchmarks/moe_bench.py [n_layers] [steps]
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from torch_bnb_fp4_tpu.models import KVCache, ModelConfig
from torch_bnb_fp4_tpu.models import transformer as T
from torch_bnb_fp4_tpu.models.transformer import moe_forward
from torch_bnb_fp4_tpu.utils import calibrate_rtt
from torch_bnb_fp4_tpu.utils.synth import synth_params

import dataclasses


def active_bytes_per_token(cfg: ModelConfig) -> float:
    """HBM bytes a decode step MUST read: packed+scale for attention linears
    and the experts_per_tok active experts' FFN, per layer (+ lm_head bf16)."""
    kv_dim = cfg.n_kv_heads * cfg.head_dim

    def packed(n, k):
        return n * k / 2 + (k // cfg.blocksize) * n * 4  # codes + f32 scales

    attn = packed(cfg.dim, cfg.dim) * 2 + packed(kv_dim, cfg.dim) * 2
    ffn = cfg.experts_per_tok * (
        packed(cfg.ffn_dim, cfg.dim) * 2 + packed(cfg.dim, cfg.ffn_dim)
    )
    router = cfg.n_experts * cfg.dim * 2
    return cfg.n_layers * (attn + ffn + router) + cfg.vocab_size * cfg.dim * 2


def main():
    n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = dataclasses.replace(ModelConfig.mixtral_8x7b(), n_layers=n_layers)
    params = synth_params(cfg, quantized=True, seed=0, fuse=True)
    jax.block_until_ready(params)
    rtt = calibrate_rtt()
    print(f"mixtral geometry, {n_layers} layers; rtt {rtt*1e3:.1f} ms", file=sys.stderr)

    # --- 1. batch-1 decode ---
    cache = KVCache.zeros(cfg, 1, 128)
    tok = jnp.zeros((1,), jnp.int32)

    @partial(jax.jit, static_argnames=("n",))
    def run(params, tok, cache, n):
        def body(carry, _):
            tok, cache = carry
            logits, cache = T.forward(params, cfg, tok[:, None], cache)
            return (jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache), ()

        (tok, _), _ = jax.lax.scan(body, (tok, cache), None, length=n)
        return tok

    int(run(params, tok, cache, steps)[0])
    best = min(
        (lambda t0: (int(run(params, tok, cache, steps)[0]), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(3)
    ) - rtt
    step = best / steps
    gbs = active_bytes_per_token(cfg) / step / 1e9
    print(f"decode: {step*1e3:.2f} ms/step  -> {1/step:.1f} tok/s  "
          f"effective {gbs:.0f} GB/s over active bytes "
          f"({active_bytes_per_token(cfg)/2**30:.2f} GiB/token)", flush=True)

    # --- 2. prefill chunk ---
    toks = jnp.zeros((1, 256), jnp.int32)

    @jax.jit
    def pre(params, toks):
        cache = KVCache.zeros(cfg, 1, 256)
        logits, _ = T.forward(params, cfg, toks, cache, last_only=True)
        return logits[:, -1]

    pre(params, toks).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(pre(params, toks)[0, 0])
        best = min(best, time.perf_counter() - t0 - rtt)
    tokps = 256 / best
    print(f"prefill M=256: {best*1e3:.1f} ms  -> {tokps:.0f} tok/s "
          f"(all-experts pass costs n_experts/experts_per_tok = "
          f"{cfg.n_experts/cfg.experts_per_tok:.0f}/1 of ideal FFN flops)", flush=True)

    # --- 3. dispatch crossover on ONE layer's MoE block ---
    moe = params.layers[0].moe
    REPS = 32  # loop-carried reps inside ONE jit: per-dispatch timing through
    # the tunnel has a ~1 ms noise floor (negative "times" after RTT
    # subtraction); chaining x -> moe(x) makes each rep data-dependent
    for b in (1, 2, 4, 8, 16):
        x = jnp.zeros((b, 1, cfg.dim), jnp.bfloat16)
        res = {}
        for label, force in (("per-token", False), ("all-experts", True)):

            @jax.jit
            def f(m, x, force=force):
                def body(x, _):
                    return moe_forward(m, cfg, x, force_dense=force).astype(x.dtype), ()

                x, _ = jax.lax.scan(body, x, None, length=REPS)
                return x

            f(moe, x).block_until_ready()
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(f(moe, x)[0, 0, 0])
                best = min(best, time.perf_counter() - t0 - rtt)
            res[label] = best / REPS
        print(f"B={b:>2}: per-token {res['per-token']*1e3:7.3f} ms   "
              f"all-experts {res['all-experts']*1e3:7.3f} ms   "
              f"-> {'per-token' if res['per-token'] < res['all-experts'] else 'all-experts'}",
              flush=True)


if __name__ == "__main__":
    main()
