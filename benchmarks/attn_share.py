"""Attention share of long-context prefill (VERDICT r4 next #5 gate).

Decision rule: if attention is >10% of prefill time at 8k/16k context,
implement a Pallas online-softmax (flash) attention; else record the
decomposition in PERF_NOTES and close the item.

Method: one Mistral-geometry decoder layer (FP4 fused linears), prefill of
an L-token chunk against an L-row cache, timed twice — once as-is and once
with ``_attention`` stubbed to a reshape (same output shape, no logits) —
the difference is the attention cost.  Also times ``_attention`` standalone
at (Lq=chunk, Lk=L) for the chunked-prefill regime (chunk=256 queries
against a long cache), which is the serving default path.

Usage: python benchmarks/attn_share.py [L ...]   (default 2048 8192 16384)
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from torch_bnb_fp4_tpu.models import ModelConfig, quantize_params
from torch_bnb_fp4_tpu.models import transformer as T


def median_diff(run, reps=4):
    """Interleaved difference timing of run(n) (jitted, carries data dep)."""
    run(1); run(2)  # compile
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter(); run(1); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); run(2); t2 = time.perf_counter() - t0
        if t2 - t1 > 0:
            diffs.append(t2 - t1)
    if not diffs:
        return float("nan")
    diffs.sort()
    mid = len(diffs) // 2
    return diffs[mid] if len(diffs) % 2 else 0.5 * (diffs[mid - 1] + diffs[mid])


def main():
    ls = [int(a) for a in sys.argv[1:]] or [2048, 8192, 16384]
    import dataclasses

    cfg1 = dataclasses.replace(ModelConfig.mistral_7b(), n_layers=1, vocab_size=256)
    params = quantize_params(cfg1, T.random_weights(cfg1, seed=0), fuse=True)
    rng = np.random.default_rng(0)

    real_attention = T._attention

    for L in ls:
        toks = jnp.asarray(rng.integers(0, 255, (1, L)), jnp.int32)

        def make(stub):
            if stub:
                T._attention = lambda q, k, v, *a, **kw: q.reshape(q.shape)
            else:
                T._attention = real_attention

            @partial(jax.jit, static_argnames=("reps",))
            def run(t, reps):
                def body(i, c):
                    t2 = (t + c.astype(jnp.int32)) % 256
                    cache = T.KVCache.zeros(cfg1, 1, L + 8)
                    logits, cache = T.forward(params, cfg1, t2, cache, last_only=True)
                    return c + logits[0, 0, 0] * 1e-30

                return jax.lax.fori_loop(0, reps, body, 0.0)

            # close over the current _attention binding at trace time
            f = lambda n: float(run(toks, n))
            return f

        t_full = median_diff(make(stub=False))
        t_stub = median_diff(make(stub=True))
        share = (t_full - t_stub) / t_full if t_full == t_full else float("nan")
        print(f"L={L}: layer prefill {t_full*1e3:8.1f} ms | no-attn "
              f"{t_stub*1e3:8.1f} ms | attention {100*share:5.1f}% of prefill",
              flush=True)

        # chunked regime: 256 queries against an L-row cache (ring-bounded
        # Lk for Mistral under sliding_kv: min(L, 4352)); dense vs the
        # Pallas flash kernel
        from torch_bnb_fp4_tpu.models.transformer import _attention_dense
        from torch_bnb_fp4_tpu.ops.attention import flash_attention

        for lk_label, lk in (("full", L), ("ring", min(L, 4352))):
            q = jnp.asarray(rng.standard_normal((1, 256, 32, 128)), jnp.bfloat16)
            k = jnp.asarray(rng.standard_normal((1, lk, 8, 128)), jnp.bfloat16)
            v = jnp.asarray(rng.standard_normal((1, lk, 8, 128)), jnp.bfloat16)
            qpos = jnp.arange(lk - 256, lk, dtype=jnp.int32)[None, :]
            kpos = jnp.arange(lk, dtype=jnp.int32)[None, :]
            valid = jnp.ones((1, lk), bool)

            for impl_label, impl in (
                ("dense", lambda *a: _attention_dense(*a)),
                ("flash", lambda *a: flash_attention(*a, interpret=False)),
            ):
                @partial(jax.jit, static_argnames=("reps",))
                def arun(q, reps, impl=impl):
                    def body(i, c):
                        q2 = (q.astype(jnp.float32) * (1 + c * 1e-30)).astype(q.dtype)
                        o = impl(q2, k, v, qpos, valid, kpos, 4096)
                        return c + o[0, 0, 0, 0].astype(jnp.float32) * 1e-30

                    return jax.lax.fori_loop(0, reps, body, 0.0)

                try:
                    ta = median_diff(lambda n: float(arun(q, n * 8))) / 8
                except Exception as e:  # noqa: BLE001
                    print(f"      chunk256 x Lk={lk} ({lk_label}) {impl_label}: "
                          f"SKIP {type(e).__name__}: {e}", flush=True)
                    continue
                print(f"      chunk256 x Lk={lk} ({lk_label}) {impl_label}: "
                      f"{ta*1e6:8.0f} us/chunk", flush=True)
    T._attention = real_attention


if __name__ == "__main__":
    main()
