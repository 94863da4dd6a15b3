"""Decompose batch-1 decode step time: one Mistral layer's FP4 kernels alone
vs the full layer (attention/norms/rope/cache included) vs the whole model
step — quantifies non-linear overhead per layer on real TPU."""

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


def bench(name, fn, *args, rep=REP):
    rtt = calibrate_rtt()

    @jax.jit
    def run(x, *a):
        def body(i, c):
            x2 = (x.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(x.dtype)
            o = fn(x2, *a)
            return c + jnp.sum(o.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, rep, body, 0.0)

    float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0 - rtt)
    per = best / rep
    print(f"{name}: {per*1e6:.1f}us", flush=True)
    return per


def main():
    cfg = ModelConfig.mistral_7b()
    cfg1 = ModelConfig(**{**cfg.__dict__, "n_layers": 1})
    params = synth_params(cfg1, quantized=True, seed=0)
    lp = params.layers[0]
    x = jnp.zeros((1, 1, cfg.dim), jnp.bfloat16)
    max_len = 64
    cache = KVCache.zeros(cfg1, 1, max_len)

    # linears only (the 7 fused kernels, chained for real data deps)
    def linears_only(h):
        q = lp.wq(h)
        k = lp.wk(h)
        v = lp.wv(h)
        o = lp.wo(q)
        g = lp.w_gate(o)
        u = lp.w_up(o)
        d = lp.w_down(g * u)
        return d + k[:, :1] + v[:, :1]

    bench("7 linears only ", linears_only, jnp.zeros((1, cfg.dim), jnp.bfloat16))

    # full layer
    positions = jnp.zeros((1, 1), jnp.int32) + 5
    kvp = jnp.arange(max_len, dtype=jnp.int32)
    kvv = jnp.ones((1, max_len), bool)

    def full_layer(x):
        y, kc, vc = T._layer_forward(lp, cfg1, x, positions, cache.k[0], cache.v[0], cache.length + 5, kvp, kvv)
        return y

    bench("full layer      ", full_layer, x)

    # full model step (32 layers)
    params32 = synth_params(cfg, quantized=True, seed=0)
    cache32 = KVCache.zeros(cfg, 1, max_len)
    tok = jnp.zeros((1,), jnp.int32)

    def step(tok_f, params, cache):
        logits, _ = T.forward(params, cfg, tok_f[:, None], cache)
        return jnp.argmax(logits[:, -1], axis=-1)

    def stepi(tok, params, cache):
        logits, _ = T.forward(params, cfg, tok[:, None], cache)
        return logits[:, -1]

    rtt = calibrate_rtt()

    @jax.jit
    def run(tok, params, cache):
        def body(i, c):
            t2 = (tok + (c * 1e-30).astype(jnp.int32)).astype(jnp.int32)
            o = stepi(t2, params, cache)
            return c + jnp.sum(o) * 1e-30

        return jax.lax.fori_loop(0, 20, body, 0.0)

    float(run(tok, params32, cache32))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(tok, params32, cache32))
        best = min(best, time.perf_counter() - t0 - rtt)
    print(f"full 32-layer step: {best/20*1e6:.1f}us", flush=True)


if __name__ == "__main__":
    main()
