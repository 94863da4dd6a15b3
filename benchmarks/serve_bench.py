"""Continuous-batching aggregate throughput: batched decode amortizes the
packed-weight reads, so tok/s scales ~linearly with batch until the MXU/VPU
balance shifts (BASELINE config 4).  Measures the jitted batched decode step
at several batch sizes on real TPU (engine bookkeeping is host-side and
negligible next to the step)."""

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


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "mistral7b"
    cfg = {"mistral7b": ModelConfig.mistral_7b, "tinyllama": ModelConfig.tinyllama_1b}[model]()
    import dataclasses

    cfg = dataclasses.replace(cfg, quantize_lm_head=True)
    params = synth_params(cfg, quantized=True, seed=0, fuse=True)
    jax.block_until_ready(params)
    rtt = calibrate_rtt()
    max_len = 128
    STEPS = 16

    for batch in (1, 4, 8, 16):
        cache = KVCache.zeros(cfg, batch, max_len)
        tok = jnp.zeros((batch,), jnp.int32)

        from functools import partial

        @partial(jax.jit, static_argnames=("n",))
        def run(params, tok, cache, n):
            def body(carry, _):
                tok, cache = carry
                logits, cache = T.forward(params, cfg, tok[:, None], cache)
                tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (tok, cache), ()

            (tok, _), _ = jax.lax.scan(body, (tok, cache), None, length=n)
            return tok

        int(run(params, tok, cache, STEPS)[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(run(params, tok, cache, STEPS)[0])
            best = min(best, time.perf_counter() - t0 - rtt)
        step = best / STEPS
        print(
            f"batch {batch:>2}: {step*1e3:.2f} ms/step -> {batch/step:.1f} tok/s aggregate "
            f"({1/step:.1f} per-seq)",
            flush=True,
        )


if __name__ == "__main__":
    main()
