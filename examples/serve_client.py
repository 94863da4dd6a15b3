"""Minimal client for the HTTP serving front-end (stdlib only).

    # terminal 1: serve (random tiny model without --ckpt; see
    #              python -m torch_bnb_fp4_tpu.serve --help)
    python -m torch_bnb_fp4_tpu.serve --port 8000

    # terminal 2:
    python examples/serve_client.py --prompt 1,2,3 --max-tokens 16
    python examples/serve_client.py --prompt 1,2,3 --stream
    python examples/serve_client.py --stats

With a server started with --tokenizer, pass --text instead of --prompt.
The reference's end-to-end flow is a single in-process model.generate
(examples/speed_test_mistral_7b.py:106-130); this is the same flow over the
serving API.
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--prompt", help="comma-separated token ids")
    ap.add_argument("--text", help="text prompt (server must run with --tokenizer)")
    ap.add_argument("--max-tokens", type=int, default=16)
    ap.add_argument("--temperature", type=float, default=None)
    ap.add_argument("--top-p", type=float, default=None)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--stats", action="store_true")
    args = ap.parse_args()
    base = f"http://{args.host}:{args.port}"

    if args.stats:
        with urllib.request.urlopen(f"{base}/v1/stats", timeout=60) as r:
            print(json.dumps(json.loads(r.read()), indent=2))
        return

    body: dict = {"max_tokens": args.max_tokens, "stream": args.stream}
    if args.text is not None:
        body["text"] = args.text
    elif args.prompt is not None:
        body["prompt"] = [int(t) for t in args.prompt.split(",")]
    else:
        ap.error("need --prompt, --text, or --stats")
    if args.temperature is not None:
        body["temperature"] = args.temperature
    if args.top_p is not None:
        body["top_p"] = args.top_p

    req = urllib.request.Request(
        f"{base}/v1/completions", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        if not args.stream:
            print(json.dumps(json.loads(r.read()), indent=2))
            return
        for line in r:  # SSE: first {"uid"}, then {"token"} each, then {"done"}
            line = line.strip()
            if not line.startswith(b"data: "):
                continue
            obj = json.loads(line[6:])
            if "token" in obj:
                print(obj["token"], end=" ", flush=True)
            elif "done" in obj:
                print("\n" + json.dumps(obj["done"], indent=2))
            elif "error" in obj:
                print(f"error: {obj['error']}", file=sys.stderr)


if __name__ == "__main__":
    main()
