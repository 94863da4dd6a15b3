"""Per-shape-class GEMV block-config sweep (round-3 lever #1).

Round 2 found the decode step bandwidth-shaped with the SMALL kernels
dragging the average (o_proj ~420 GB/s vs gate|up 666; PERF_NOTES "Round-3
decode plan"), and its block_k<512 sweep invalidated because the K-blocked
scale tile clamps bk up to 512.  The m-outer kernel now carries its scale as
a full-K stripe, so sub-512 block_k is really measurable.

Method per PERF_NOTES: interleaved difference timing (rep vs 2*rep inside
one jit, loop-carried dep through the small activation input, one scalar
fetch), run totals >> 31ms RTT, configs interleaved round-robin so chip
drift hits all configs equally.  Run alone on the chip.
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from torch_bnb_fp4_tpu.ops import format as fmt
from torch_bnb_fp4_tpu.ops import kernels as K

# Mistral-7B decode shape classes (K, N) and sweep configs (block_k, block_n)
SHAPES = {
    "o":    (4096, 4096),
    "qkv":  (4096, 6144),
    "down": (14336, 4096),
    "gu":   (4096, 28672),
}
CONFIGS = {
    "o":    [(512, 4096), (1024, 4096), (2048, 4096)],
    "qkv":  [(512, 6144), (1024, 6144), (2048, 6144)],
    "down": [(512, 4096), (1024, 4096), (2048, 4096)],
    "gu":   [(512, 8192), (512, 14336), (1024, 14336), (512, 28672)],
}
TARGET_S = 0.12  # per-rep-run total; >> 31ms RTT


def build(k, n, bk, bn, rep):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    pk, sc = map(jnp.asarray, fmt.pack_tpu_pairk(w, variant="ramp"))
    x = jnp.asarray(rng.standard_normal((1, k)), jnp.bfloat16)

    @partial(jax.jit, static_argnames=("reps",))
    def run(x, pk, sc, reps):
        def body(i, c):
            x2 = (x.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(x.dtype)
            o = K.gemv_fp4_pk(x2, pk, sc, block_k=bk, block_n=bn,
                              variant="ramp", interpret=False)
            return c + jnp.sum(o.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, reps, body, 0.0)

    return run, x, pk, sc


def main():
    names = sys.argv[1:] or list(SHAPES)
    jobs = []  # (label, runner, args, rep, bytes)
    for name in names:
        k, n = SHAPES[name]
        nbytes = k * n // 2 + (k // 64) * n * 4 + k * 2 + n * 2
        exp_t = nbytes / 550e9  # pessimistic expected time
        rep = max(200, int(TARGET_S / exp_t) // 50 * 50)
        for bk, bn in CONFIGS[name]:
            run, x, pk, sc = build(k, n, bk, bn, rep)
            jobs.append((f"{name} bk={bk:<5} bn={bn:<5}", run, (x, pk, sc), rep, nbytes))

    # compile + warm both rep variants
    for label, run, args, rep, _ in jobs:
        t0 = time.perf_counter()
        float(run(*args, reps=rep))
        float(run(*args, reps=2 * rep))
        print(f"compiled {label} ({time.perf_counter()-t0:.1f}s)", file=sys.stderr, flush=True)

    samples = {label: [] for label, *_ in jobs}
    for rnd in range(6):
        for label, run, args, rep, _ in jobs:
            t0 = time.perf_counter()
            float(run(*args, reps=rep))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(run(*args, reps=2 * rep))
            t2 = time.perf_counter() - t0
            if t2 - t1 > 0:
                samples[label].append((t2 - t1) / rep)
        print(f"round {rnd} done", file=sys.stderr, flush=True)
    best = {k: (float(np.median(v)) if v else float("inf")) for k, v in samples.items()}

    print(f"{'config':<24} {'us':>8} {'GB/s':>8}")
    for label, run, args, rep, nbytes in jobs:
        t = best[label]
        print(f"{label:<24} {t*1e6:8.1f} {nbytes/t/1e9:8.1f}", flush=True)


if __name__ == "__main__":
    main()
