"""End-to-end serving demo — parity with the reference's
examples/speed_test_mistral_7b.py (generation timed before/after enabling the
library, SURVEY.md §3.5), TPU-shaped: instead of converting a live model at
boot, it loads (or first builds) a packed-FP4 checkpoint and serves a batch
of prompts through the continuous-batching engine, reporting tok/s for the
FP4 engine vs the bf16 twin.

Real HF weights need only a model dir:
    python -m torch_bnb_fp4_tpu.convert <hf_dir> <packed_dir>
    python examples/serve_demo.py --ckpt <packed_dir>
Without --ckpt it builds a small random-weight model in-process.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from torch_bnb_fp4_tpu.models import ModelConfig, dense_params, quantize_params
from torch_bnb_fp4_tpu.models import transformer as T
from torch_bnb_fp4_tpu.serve import Engine, EngineConfig, Request


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="packed checkpoint dir (from torch_bnb_fp4_tpu.convert)")
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--max-new-tokens", type=int, default=32)
    ap.add_argument("--max-batch", type=int, default=4)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    if args.ckpt:
        from torch_bnb_fp4_tpu.convert import load_checkpoint

        cfg, params = load_checkpoint(args.ckpt)
        weights = None
    else:
        cfg = ModelConfig.tiny_test(n_layers=2)
        weights = T.random_weights(cfg, seed=0)
        params = quantize_params(cfg, weights)

    reqs = [
        Request(
            uid=i,
            prompt=rng.integers(0, cfg.vocab_size, rng.integers(3, 9)).tolist(),
            max_new_tokens=args.max_new_tokens,
        )
        for i in range(args.requests)
    ]

    def serve(p, label):
        eng = Engine(p, cfg, EngineConfig(max_batch=args.max_batch, max_len=64))
        t0 = time.perf_counter()
        res = eng.run([Request(**vars(r)) for r in reqs])
        dt = time.perf_counter() - t0
        ntok = sum(len(c.tokens) for c in res.values())
        print(f"{label}: {len(res)} completions, {ntok} tokens in {dt:.2f}s -> {ntok/dt:.1f} tok/s")
        return res

    fp4 = serve(params, "FP4 engine ")
    if weights is not None:
        bf16 = serve(dense_params(cfg, weights), "bf16 engine")
        agree = sum(fp4[u].tokens == bf16[u].tokens for u in fp4)
        print(f"token-identical completions fp4 vs bf16: {agree}/{len(fp4)} "
              "(disagreement expected: 4-bit weights)")
    for u in sorted(fp4)[:3]:
        print(f"  uid={u} -> {fp4[u].tokens[:12]}{'...' if len(fp4[u].tokens) > 12 else ''}")


if __name__ == "__main__":
    main()
