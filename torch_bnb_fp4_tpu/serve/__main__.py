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
    ap.add_argument("--prefix-store", type=int, default=0,
                    help="keep up to N retired requests' KV device-side so a "
                         "shared system prompt hits the prefix cache after "
                         "its donor finishes (N decode-slots' worth of HBM; "
                         "LRU; requires --prefix-cache)")
    ap.add_argument("--no-sliding-kv", action="store_true",
                    help="disable rolling sliding-window KV rings (rings "
                         "halve windowed models' KV HBM under --prefill-chunk)")
    ap.add_argument("--prefill-shadow", action="store_true",
                    help="attach int8 prefill shadows (+1 byte/weight HBM): "
                         "prefill GEMMs at M>=256 run as pure int8 matmuls, "
                         "measured 1.3-1.4x XLA dense bf16 where the fused "
                         "path is 0.6-1.2x; decode/GEMV latency unchanged.")
    ap.add_argument("--logprobs", action="store_true",
                    help="emit per-token logprobs on every completion")
    ap.add_argument("--multihost", action="store_true",
                    help="multi-process serving: jax.distributed.initialize() "
                         "(env/TPU-metadata bring-up, or set --coordinator), "
                         "HTTP on process 0, follower engine loops elsewhere")
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address for --multihost off-pod runs "
                         "(with JAX_NUM_PROCESSES/JAX_PROCESS_ID env vars)")
    ap.add_argument("--tp", type=int, default=0,
                    help="model-axis width (0 = all devices on the model axis"
                         " after the data axis takes process count)")
    ap.add_argument("--kv-dtype", default="bfloat16",
                    choices=["bfloat16", "float8_e4m3fn"])
    ap.add_argument("--lora", action="append", default=None, metavar="DIR|NAME=DIR",
                    help="HF PEFT LoRA adapter dir to serve over the base "
                         "(exact low-rank delta; base bytes untouched).  "
                         "Repeatable as NAME=DIR for multi-adapter serving: "
                         "requests then pick an adapter with {'adapter': "
                         "NAME} (omitted = base model)")
    ap.add_argument("--lora-merge", action="store_true",
                    help="fold the --lora adapter into the base weights and "
                         "requantize (zero runtime overhead, FP4 envelope on "
                         "the delta)")
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

    mesh = None
    if args.multihost:
        import jax

        from ..parallel import init_multihost, make_mesh, shard_params, validate_tp

        init_multihost(coordinator_address=args.coordinator)
        n_data = jax.process_count()
        n_model = args.tp or jax.device_count() // n_data
        logging.info("multihost: %d processes, mesh data=%d x model=%d",
                     n_data, n_data, n_model)

    if args.ckpt:
        from ..convert import load_checkpoint

        cfg, params = load_checkpoint(
            args.ckpt, tp=(n_model if args.multihost else 1))
    else:
        cfg = ModelConfig.tiny_test(n_layers=2)
        params = quantize_params(cfg, T.random_weights(cfg, seed=0))
        logging.info("no --ckpt: serving a tiny random-weight model")

    adapter_ids = None
    if args.lora:
        from ..models import (attach_lora, attach_multi_lora,
                              load_peft_adapter, merge_lora)

        if len(args.lora) > 1 or "=" in args.lora[0]:
            # multi-adapter serving: every --lora must be NAME=DIR
            named = {}
            for spec in args.lora:
                if "=" not in spec:
                    ap.error(f"multi-adapter --lora needs NAME=DIR, got {spec!r}")
                name, path = spec.split("=", 1)
                named[name] = load_peft_adapter(path)
            if args.lora_merge:
                ap.error("--lora-merge only applies to a single unnamed --lora")
            params, adapter_ids = attach_multi_lora(params, cfg, named)
            logging.info("attached %d LoRA adapters for per-request serving: %s",
                         len(named), sorted(adapter_ids))
        else:
            adapter = load_peft_adapter(args.lora[0])
            params = (merge_lora if args.lora_merge else attach_lora)(params, cfg, adapter)
            logging.info("%s LoRA adapter %s (r=%d, alpha=%g, %d modules)",
                         "merged" if args.lora_merge else "attached", args.lora[0],
                         adapter.r, adapter.alpha, len(adapter.weights))

    if args.prefill_shadow:
        from ..models import attach_prefill_shadow

        params = attach_prefill_shadow(
            params, tp=(n_model if args.multihost else 1))
        logging.info("attached int8 prefill shadows (+1 byte/weight HBM)")

    if args.multihost:
        validate_tp(cfg, n_model)
        mesh = make_mesh(n_model=n_model, n_data=n_data)
        params = shard_params(params, mesh)
        if args.max_batch % n_data:
            ap.error(f"--max-batch must be a multiple of process count {n_data}")

    eng = Engine(params, cfg, EngineConfig(
        max_batch=args.max_batch, max_len=args.max_len,
        inner_steps=args.inner_steps, temperature=args.temperature,
        top_p=args.top_p, top_k=args.top_k, prefill_chunk=args.prefill_chunk,
        spec_tokens=args.spec_tokens, prefix_cache=args.prefix_cache,
        prefix_store=args.prefix_store, sliding_kv=not args.no_sliding_kv,
        kv_dtype=args.kv_dtype, logprobs=args.logprobs,
    ), mesh=mesh, adapter_ids=adapter_ids)
    if args.warmup_prompt_len:
        logging.info("warming up (prompts to %d)...", args.warmup_prompt_len)
        eng.warmup(max_prompt_len=args.warmup_prompt_len)

    tok = None
    if args.tokenizer:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.tokenizer, local_files_only=True)

    if args.multihost:
        import jax

        from . import MultihostEngineServer, follow

        if jax.process_index() != 0:
            logging.info("follower process %d: engine loop in lockstep",
                         jax.process_index())
            follow(eng)  # returns when process 0's server stops
            return
        srv = MultihostEngineServer(eng, host=args.host, port=args.port,
                                    tokenizer=tok).start()
    else:
        srv = EngineServer(eng, host=args.host, port=args.port, tokenizer=tok).start()
    print(f"serving on http://{srv.host}:{srv.port}  (Ctrl-C to stop)")
    try:
        srv._http_thread.join()
    except KeyboardInterrupt:
        print("shutting down")
        srv.stop()


if __name__ == "__main__":
    main()
