"""End-to-end serving validation on real TPU (BASELINE config 4 evidence):

1. long-prompt prefill (2048 tokens, Mistral geometry) through the
   query-chunked attention — memory-safe and timed;
2. the actual continuous-batching Engine serving a request mix.

Note: through the axon tunnel every engine tick pays ~31ms host RTT; on a
real co-located host that overhead is microseconds, so the jitted step time
(benchmarks/serve_bench.py) is the deployable number.  This script shows the
ENGINE path works at scale on hardware.
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from torch_bnb_fp4_tpu.models import KVCache, ModelConfig, prefill
from torch_bnb_fp4_tpu.serve import Engine, EngineConfig, Request
from torch_bnb_fp4_tpu.utils.synth import synth_params


def main():
    cfg = dataclasses.replace(ModelConfig.mistral_7b(), quantize_lm_head=True)
    params = synth_params(cfg, quantized=True, seed=0, fuse=True)
    jax.block_until_ready(params)

    # 1. long prefill
    lp = 2048
    cache = KVCache.zeros(cfg, 1, lp + 8)
    prompt = jnp.zeros((1, lp), jnp.int32)
    t0 = time.perf_counter()
    logits, cache = prefill(params, cfg, prompt, cache)
    int(jnp.argmax(logits[0]))
    print(f"prefill {lp} tokens (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    logits, _ = prefill(params, cfg, prompt, KVCache.zeros(cfg, 1, lp + 8))
    int(jnp.argmax(logits[0]))
    dt = time.perf_counter() - t0
    print(f"prefill {lp} tokens (warm): {dt:.2f}s -> {lp/dt:.0f} tok/s prefill", flush=True)

    # 2. engine serving a request mix — run the mix twice: the first run
    # pays one-time compiles (per prompt-length bucket + per inner-scan
    # depth), the second is the warm serving number
    rng = np.random.default_rng(0)

    def mk_reqs(base):
        return [
            Request(uid=base + i,
                    prompt=rng.integers(0, cfg.vocab_size, int(rng.integers(8, 33))).tolist(),
                    max_new_tokens=24)
            for i in range(16)
        ]

    eng = Engine(params, cfg, EngineConfig(max_batch=8, max_len=160))
    for label, base in (("cold (incl compiles)", 0), ("warm", 100)):
        t0 = time.perf_counter()
        res = eng.run(mk_reqs(base))
        dt = time.perf_counter() - t0
        done = {u: c for u, c in res.items() if u >= base}
        ntok = sum(len(c.tokens) for c in done.values())
        s = eng.stats()
        print(f"engine {label}: {len(done)} completions, {ntok} tokens in {dt:.1f}s "
              f"({ntok/dt:.1f} tok/s wall incl tunnel RTT; occupancy {s['avg_batch_occupancy']:.2f})",
              flush=True)
        assert len(done) == 16 and all(len(c.tokens) == 24 for c in done.values())
    print("OK", flush=True)


if __name__ == "__main__":
    main()
