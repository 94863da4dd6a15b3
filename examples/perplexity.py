"""Teacher-forced perplexity of a packed-FP4 checkpoint (vs its bf16 twin).

North-star accuracy evidence (BASELINE.json: "Match the reference's ...
Mistral-7B perplexity at 4-bit"): given a converted checkpoint and a token
stream, reports token-level NLL/perplexity; with ``--hf-dir`` it also builds
the bf16 twin from the same floats and reports the delta — the quantity that
must be ~0 for FP4 to be deployment-equivalent.  (This host has no network
access to fetch real weights; tests/test_perplexity.py pins the harness on a
fabricated checkpoint, and the same command runs unchanged on a host with a
real downloaded model.)

Usage:
    python examples/perplexity.py --ckpt PACKED_DIR [--hf-dir HF_DIR]
        [--tokens tokens.npy] [--seq-len 512] [--max-tokens 16384]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def nll_of_stream(params, cfg, tokens: np.ndarray, seq_len: int) -> tuple[float, int]:
    """Mean next-token NLL over a flat token stream, chunked into segments.

    Each segment is teacher-forced through one forward (fresh cache); the
    first position of each segment has no target context and is skipped.
    Returns (mean_nll, n_scored_tokens).
    """
    from torch_bnb_fp4_tpu.models import KVCache, forward

    n_seg = len(tokens) // seq_len
    total, count = 0.0, 0

    @jax.jit
    def seg_nll(params, seg):
        logits, _ = forward(params, cfg, seg[None, :], KVCache.zeros(cfg, 1, seq_len))
        logp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), axis=-1)
        tgt = seg[1:]
        return -jnp.take_along_axis(logp, tgt[:, None], axis=1).sum()

    for i in range(n_seg):
        seg = jnp.asarray(tokens[i * seq_len : (i + 1) * seq_len], jnp.int32)
        total += float(seg_nll(params, seg))
        count += seq_len - 1
    return total / max(count, 1), count


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="packed checkpoint dir (convert CLI output)")
    ap.add_argument("--hf-dir", help="original HF dir: also score the bf16 twin and report the delta")
    ap.add_argument("--tokens", help=".npy int token stream; default: seeded random tokens "
                    "(exercises the harness; use real tokenized text for a real PPL)")
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--max-tokens", type=int, default=16384)
    args = ap.parse_args()

    from torch_bnb_fp4_tpu.convert import load_checkpoint

    cfg, params = load_checkpoint(args.ckpt, fuse=True)
    if args.tokens:
        tokens = np.load(args.tokens).astype(np.int64).reshape(-1)[: args.max_tokens]
    else:
        tokens = np.random.default_rng(0).integers(0, cfg.vocab_size, args.max_tokens)
        print("note: random tokens — this measures fp4-vs-bf16 CONSISTENCY, not real PPL", flush=True)

    nll, n = nll_of_stream(params, cfg, tokens, args.seq_len)
    print(f"fp4:  nll {nll:.4f}  ppl {np.exp(nll):.2f}  ({n} tokens)", flush=True)

    if args.hf_dir:
        from torch_bnb_fp4_tpu.convert.hf import config_from_hf, iter_hf_tensors
        from torch_bnb_fp4_tpu.models import dense_params

        weights = dict(iter_hf_tensors(args.hf_dir))
        twin = dense_params(config_from_hf(args.hf_dir), weights)
        nll_b, _ = nll_of_stream(twin, cfg, tokens, args.seq_len)
        print(f"bf16: nll {nll_b:.4f}  ppl {np.exp(nll_b):.2f}", flush=True)
        print(f"delta nll (fp4 - bf16): {nll - nll_b:+.4f} "
              f"(ppl ratio {np.exp(nll - nll_b):.4f})", flush=True)


if __name__ == "__main__":
    main()
