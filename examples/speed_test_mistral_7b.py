"""Mistral-7B speed test — name-for-name parity with the reference's
examples/speed_test_mistral_7b.py (tok/s before vs after enabling the
library, SURVEY.md §3.5), TPU-shaped.

The reference loads the real HF checkpoint, times HF generate with bnb
4-bit, swaps layers with recursively_replace_with_fp4_linear, and times
again.  Here the "before" is the bf16 model and the "after" is the FP4
engine; weights come from a packed checkpoint (``--ckpt``, produced by
``python -m torch_bnb_fp4_tpu.convert <hf_dir> <out>``) or are synthesized
on device when no checkpoint is given (decode speed is weight-value
independent).

Usage:
    python examples/speed_test_mistral_7b.py [--ckpt PACKED_DIR]
        [--max-new-tokens N] [--prompt-len N]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from torch_bnb_fp4_tpu.models import KVCache, ModelConfig, prefill
from torch_bnb_fp4_tpu.models import transformer as T
from torch_bnb_fp4_tpu.utils.synth import synth_params


def time_generate(params, cfg, prompt_len, n_tokens, label):
    cache = KVCache.zeros(cfg, 1, prompt_len + n_tokens + 1)
    prompt = jnp.zeros((1, prompt_len), jnp.int32)
    t0 = time.perf_counter()
    first, cache = prefill(params, cfg, prompt, cache)
    tok = jnp.argmax(first, axis=-1).astype(jnp.int32)
    tok.block_until_ready()
    prefill_s = time.perf_counter() - t0

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def decode(params, tok, cache, n):
        def body(carry, _):
            tok, cache = carry
            logits, cache = T.forward(params, cfg, tok[:, None], cache)
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (tok, cache), tok

        (_, _), toks = jax.lax.scan(body, (tok, cache), None, length=n)
        return toks

    # warmup+compile; scalar fetch = real sync (block_until_ready returns
    # early through the axon tunnel, see PERF_NOTES.md)
    int(decode(params, tok, cache, n_tokens)[-1, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        toks = decode(params, tok, cache, n_tokens)
        int(toks[-1, 0])
        best = min(best, time.perf_counter() - t0)
    dt = best
    print(f"{label}: prefill(+compile) {prefill_s:.1f}s, "
          f"decode {n_tokens} tokens in {dt:.2f}s -> {n_tokens/dt:.1f} tok/s", flush=True)
    return n_tokens / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="packed FP4 checkpoint dir (else synthetic weights)")
    ap.add_argument("--max-new-tokens", type=int, default=32)
    ap.add_argument("--prompt-len", type=int, default=32)
    args = ap.parse_args()

    if args.ckpt:
        from torch_bnb_fp4_tpu.convert import load_checkpoint

        cfg, fp4_params = load_checkpoint(args.ckpt, fuse=True)
    else:
        print("no --ckpt: synthesizing Mistral-7B-geometry weights on device", flush=True)
        cfg = dataclasses.replace(ModelConfig.mistral_7b(), quantize_lm_head=True)
        fp4_params = synth_params(cfg, quantized=True, seed=0, fuse=True)
    jax.block_until_ready(fp4_params)

    fp4 = time_generate(fp4_params, cfg, args.prompt_len, args.max_new_tokens, "FP4 (this library)")
    del fp4_params
    import gc

    gc.collect()
    bf16_params = synth_params(cfg, quantized=False, seed=0)
    jax.block_until_ready(bf16_params)
    bf16 = time_generate(bf16_params, cfg, args.prompt_len, args.max_new_tokens, "bf16 baseline    ")
    print(f"speedup: {fp4/bf16:.2f}x", flush=True)


if __name__ == "__main__":
    main()
