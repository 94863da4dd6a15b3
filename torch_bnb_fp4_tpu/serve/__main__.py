"""Serve a packed-FP4 checkpoint over HTTP.

    python -m torch_bnb_fp4_tpu.serve --ckpt <packed_dir> [--port 8000]
        [--max-batch 8] [--max-len 2048] [--temperature 0] [--top-p 1.0]
        [--prefill-chunk 0] [--spec-tokens 0] [--prefix-cache]
        [--warmup-prompt-len N]

Without --ckpt a small random-weight model serves (smoke testing the API).
The reference has no server (SURVEY.md §1: nothing sits above its Python API
layer); this is the north-star serving surface: convert once offline, then
`python -m torch_bnb_fp4_tpu.serve` and POST token-id prompts.
"""

from __future__ import annotations

import argparse
import logging


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", help="packed checkpoint dir (torch_bnb_fp4_tpu.convert output)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=2048)
    ap.add_argument("--inner-steps", type=int, default=8)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--prefill-chunk", type=int, default=0)
    ap.add_argument("--spec-tokens", type=int, default=0)
    ap.add_argument("--prefix-cache", action="store_true")
    ap.add_argument("--logprobs", action="store_true",
                    help="emit per-token logprobs on every completion")
    ap.add_argument("--kv-dtype", default="bfloat16",
                    choices=["bfloat16", "float8_e4m3fn"])
    ap.add_argument("--tokenizer", default=None, metavar="DIR",
                    help="local HF tokenizer dir: enables {'text': ...} "
                         "prompts and decoded 'text' in completions")
    ap.add_argument("--warmup-prompt-len", type=int, default=0,
                    help="pre-compile all serving programs for prompts up to "
                         "this length before accepting traffic")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()
    logging.basicConfig(level=logging.DEBUG if args.verbose else logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")

    from ..models import ModelConfig, quantize_params
    from ..models import transformer as T
    from . import Engine, EngineConfig, EngineServer

    if args.ckpt:
        from ..convert import load_checkpoint

        cfg, params = load_checkpoint(args.ckpt)
    else:
        cfg = ModelConfig.tiny_test(n_layers=2)
        params = quantize_params(cfg, T.random_weights(cfg, seed=0))
        logging.info("no --ckpt: serving a tiny random-weight model")

    eng = Engine(params, cfg, EngineConfig(
        max_batch=args.max_batch, max_len=args.max_len,
        inner_steps=args.inner_steps, temperature=args.temperature,
        top_p=args.top_p, top_k=args.top_k, prefill_chunk=args.prefill_chunk,
        spec_tokens=args.spec_tokens, prefix_cache=args.prefix_cache,
        kv_dtype=args.kv_dtype, logprobs=args.logprobs,
    ))
    if args.warmup_prompt_len:
        logging.info("warming up (prompts to %d)...", args.warmup_prompt_len)
        eng.warmup(max_prompt_len=args.warmup_prompt_len)

    tok = None
    if args.tokenizer:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.tokenizer, local_files_only=True)

    srv = EngineServer(eng, host=args.host, port=args.port, tokenizer=tok).start()
    print(f"serving on http://{srv.host}:{srv.port}  (Ctrl-C to stop)")
    try:
        srv._http_thread.join()
    except KeyboardInterrupt:
        print("shutting down")
        srv.stop()


if __name__ == "__main__":
    main()
