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




def jitter(model="mistral7b", chunks=(0,), prompt_len=1024):
    """Decode-tick latency distribution UNDER ADMISSION LOAD (VERDICT r2
    next #4 'done' criterion): p50/p99 per-decoded-token tick latency while
    long prompts are being admitted mid-stream, chunked vs unchunked.
    Several chunk settings run in one process (params built once) so the
    numbers share one tunnel session; raw loaded tick times are printed so
    one tunnel hiccup cannot masquerade as a structural p99.

    Run: python benchmarks/serve_bench.py jitter [model] [chunk ...]"""
    import dataclasses

    from torch_bnb_fp4_tpu.serve import Engine, EngineConfig, Request

    import os

    cfg = {"mistral7b": ModelConfig.mistral_7b, "tinyllama": ModelConfig.tinyllama_1b}[model]()
    cfg = dataclasses.replace(cfg, quantize_lm_head=True)
    params = synth_params(cfg, quantized=True, seed=0, fuse=True)
    jax.block_until_ready(params)
    if os.environ.get("SHADOW"):  # SHADOW=1: int8 prefill shadows attached
        from torch_bnb_fp4_tpu.models import attach_prefill_shadow

        params = attach_prefill_shadow(params)
        jax.block_until_ready(params)
        print("int8 prefill shadows attached", file=sys.stderr, flush=True)
    for chunk in chunks:
        rng = np.random.default_rng(0)
        ecfg = EngineConfig(max_batch=4, max_len=prompt_len + 512, inner_steps=4,
                            prefill_chunk=chunk, admit_budget=0 if chunk else 1)
        eng = Engine(params, cfg, ecfg)
        print(f"warmup (chunk={chunk})...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        eng.warmup(prompt_lens=[8, prompt_len])
        print(f"warmup done in {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
        prompt = lambda n: rng.integers(1, cfg.vocab_size, n).tolist()
        # steady decode on 3 slots...
        for u in range(3):
            eng.submit(Request(uid=u, prompt=prompt(8), max_new_tokens=256))
        for _ in range(8):
            eng.step()
        eng.step_times.clear()
        for _ in range(24):
            eng.step()
        quiet = np.asarray(eng.step_times)
        # ...then admit 1024-token prompts mid-stream
        eng.step_times.clear()
        uid = 100
        for burst in range(3):
            eng.submit(Request(uid=uid, prompt=prompt(prompt_len), max_new_tokens=8)); uid += 1
            for _ in range(10):
                eng.step()
        loaded = np.asarray(eng.step_times)
        p = lambda a, q: float(np.percentile(a, q) * 1e3)
        print(f"{model} chunk={chunk}: quiet  p50 {p(quiet,50):6.1f} ms/tok  p99 {p(quiet,99):6.1f}")
        print(f"{model} chunk={chunk}: loaded p50 {p(loaded,50):6.1f} ms/tok  p99 {p(loaded,99):6.1f}  "
              f"p99/p50 {np.percentile(loaded,99)/np.percentile(loaded,50):.2f}", flush=True)
        print(f"  loaded ticks (ms/tok): {np.sort(np.round(loaded*1e3,1))[::-1][:12]}", flush=True)


def prefix(model="mistral7b", sys_len=1024):
    """Shared-system-prompt admission cost with vs without prefix caching:
    wall time of the tick that admits a request whose first ``sys_len``
    tokens match a live slot's prompt.  With prefix_cache the engine forks
    the donor's KV rows and prefills only the suffix; without it the full
    prompt prefills.  Both pay one ~31ms host RTT for the first-token fetch.

    Run: python benchmarks/serve_bench.py prefix [model] [sys_len]"""
    import dataclasses

    from torch_bnb_fp4_tpu.serve import Engine, EngineConfig, Request

    cfg = {"mistral7b": ModelConfig.mistral_7b, "tinyllama": ModelConfig.tinyllama_1b}[model]()
    cfg = dataclasses.replace(cfg, quantize_lm_head=True)
    params = synth_params(cfg, quantized=True, seed=0, fuse=True)
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    sysp = rng.integers(1, cfg.vocab_size, sys_len).tolist()
    for pc in (False, True):
        eng = Engine(params, cfg, EngineConfig(
            max_batch=4, max_len=sys_len + 128, inner_steps=4, prefix_cache=pc))
        print(f"warmup (prefix_cache={pc})...", file=sys.stderr, flush=True)
        eng.warmup(prompt_lens=[sys_len + 8])
        # donor: occupies slot 0 and keeps decoding while B-requests arrive
        eng.submit(Request(uid=1, prompt=sysp + [7, 8], max_new_tokens=120))
        for _ in range(4):
            eng.step()
        times = []
        for i in range(4):
            eng.submit(Request(uid=10 + i, prompt=sysp + [11 + i, 3], max_new_tokens=4))
            t0 = time.perf_counter()
            eng.step()  # the admission tick (prefill or fork+suffix, + decode)
            times.append(time.perf_counter() - t0)
            while any(r is not None and r.uid == 10 + i for r in eng.slot_req):
                eng.step()
        st = eng.stats()
        print(f"{model} sys_len={sys_len} prefix_cache={pc}: admission tick "
              f"{min(times)*1e3:.1f} ms (best of {len(times)}; incl. ~31ms RTT)  "
              f"hits={st['prefix_hits']} reused={st['prefix_tokens_reused']}",
              flush=True)


def store(model="mistral7b", sys_len=1024):
    """Retired-prefix store: admission cost for a request sharing a system
    prompt with a request that ALREADY FINISHED (zero overlap — the case the
    live-slot prefix cache cannot serve, VERDICT r4 weak #4).  A/B: plain
    engine vs prefix_cache + prefix_store=2.

    Run: python benchmarks/serve_bench.py store [model] [sys_len]"""
    import dataclasses

    from torch_bnb_fp4_tpu.serve import Engine, EngineConfig, Request

    cfg = {"mistral7b": ModelConfig.mistral_7b, "tinyllama": ModelConfig.tinyllama_1b}[model]()
    cfg = dataclasses.replace(cfg, quantize_lm_head=True)
    params = synth_params(cfg, quantized=True, seed=0, fuse=True)
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    sysp = rng.integers(1, cfg.vocab_size, sys_len).tolist()
    for ps in (0, 2):
        eng = Engine(params, cfg, EngineConfig(
            max_batch=4, max_len=sys_len + 128, inner_steps=4,
            prefix_cache=bool(ps), prefix_store=ps))
        print(f"warmup (prefix_store={ps})...", file=sys.stderr, flush=True)
        eng.warmup(prompt_lens=[sys_len + 8])
        # donor runs TO COMPLETION; the engine idles before the sharer arrives
        eng.run([Request(uid=1, prompt=sysp + [7, 8], max_new_tokens=8)])
        times = []
        for i in range(4):
            eng.submit(Request(uid=10 + i, prompt=sysp + [11 + i, 3], max_new_tokens=4))
            t0 = time.perf_counter()
            eng.step()  # the admission tick: full prefill vs stored-row fork
            times.append(time.perf_counter() - t0)
            while any(r is not None and r.uid == 10 + i for r in eng.slot_req):
                eng.step()
        st = eng.stats()
        print(f"{model} sys_len={sys_len} prefix_store={ps}: admission tick "
              f"{min(times)*1e3:.1f} ms (best of {len(times)}; incl. ~31ms RTT)  "
              f"hits={st['prefix_hits']} reused={st['prefix_tokens_reused']} "
              f"entries={st['prefix_store_entries']}",
              flush=True)


def spec(model="mistral7b", new_tokens=256):
    """Speculative-decoding throughput A/B (round-3 backlog item 5): batch-1
    greedy decode with prompt-lookup speculation on vs off, plus the measured
    acceptance (``spec_tokens_per_forward``).  Speculation pays off when the
    model's own output is self-repetitive; with synthetic weights that is
    seed-dependent, so the script first probes the plain greedy output for
    tail periodicity and labels the result accordingly — on repetitive output
    every accepted draft token is a near-free extra token (the verify forward
    is weight-bound), on non-repetitive output the A/B shows the overhead of
    rejected drafts instead.

    Run: python benchmarks/serve_bench.py spec [model] [new_tokens]"""
    import dataclasses

    from torch_bnb_fp4_tpu.serve import Engine, EngineConfig, Request

    cfg = {"mistral7b": ModelConfig.mistral_7b, "tinyllama": ModelConfig.tinyllama_1b}[model]()
    cfg = dataclasses.replace(cfg, quantize_lm_head=True)
    params = synth_params(cfg, quantized=True, seed=0, fuse=True)
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    # A prompt whose trailing n-gram recurs gives the drafter somewhere to
    # start; whether drafts get ACCEPTED depends on the model's continuation.
    base = rng.integers(1, cfg.vocab_size, 24).tolist()
    prompt = base + base[:8] + base[:8]
    max_len = len(prompt) + new_tokens + 16

    results = {}
    for k in (0, 4):
        ecfg = EngineConfig(max_batch=1, max_len=max_len, inner_steps=4,
                            spec_tokens=k, spec_ngram=3)
        eng = Engine(params, cfg, ecfg)
        print(f"warmup (spec_tokens={k})...", file=sys.stderr, flush=True)
        eng.warmup(prompt_lens=[len(prompt)])
        # untimed full run to trigger any remaining traces, then timed run
        res = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=new_tokens)])
        toks = res[0].tokens
        t0 = time.perf_counter()
        res = eng.run([Request(uid=1, prompt=prompt, max_new_tokens=new_tokens)])
        dt = time.perf_counter() - t0
        assert res[1].tokens == toks, "speculative run must be token-exact"
        acc = eng.stats()["spec_tokens_per_forward"]
        results[k] = (len(toks) / dt, acc)
        if k == 0:
            # tail periodicity probe: does the greedy output repeat?
            tail = toks[-64:]
            period = next((p for p in range(1, 33) if tail[p:] == tail[:-p]), 0)
            print(f"{model}: plain greedy output tail period = "
                  f"{period if period else 'none (aperiodic)'}", flush=True)
    base_tps, _ = results[0]
    spec_tps, acc = results[4]
    print(f"{model} batch-1 greedy, {new_tokens} new tokens:")
    print(f"  spec off: {base_tps:6.1f} tok/s")
    print(f"  spec on : {spec_tps:6.1f} tok/s  ({spec_tps/base_tps:.2f}x)  "
          f"acceptance {acc:.2f} tokens/verify-forward", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "spec":
        spec(sys.argv[2] if len(sys.argv) > 2 else "mistral7b",
             int(sys.argv[3]) if len(sys.argv) > 3 else 256)
        sys.exit(0)
    if len(sys.argv) > 1 and sys.argv[1] == "jitter":
        # jitter [model] [prompt_len] [chunk ...]
        jitter(sys.argv[2] if len(sys.argv) > 2 else "mistral7b",
               tuple(int(a) for a in sys.argv[4:]) or (0,),
               prompt_len=int(sys.argv[3]) if len(sys.argv) > 3 else 1024)
        sys.exit(0)
    if len(sys.argv) > 1 and sys.argv[1] == "prefix":
        prefix(sys.argv[2] if len(sys.argv) > 2 else "mistral7b",
               int(sys.argv[3]) if len(sys.argv) > 3 else 1024)
        sys.exit(0)
    if len(sys.argv) > 1 and sys.argv[1] == "store":
        store(sys.argv[2] if len(sys.argv) > 2 else "mistral7b",
              int(sys.argv[3]) if len(sys.argv) > 3 else 1024)
        sys.exit(0)
    main()
