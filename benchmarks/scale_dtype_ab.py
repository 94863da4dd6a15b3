"""A/B: f32 vs bf16 scales on the production GEMV shapes (same process,
interleaved difference timing).  Scale bytes are 5-11% of each kernel's DMA;
bf16 halves them."""

import sys
import time
from functools import partial

import ml_dtypes
import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from torch_bnb_fp4_tpu.ops import format as fmt
from torch_bnb_fp4_tpu.ops import kernels as K

SHAPES = {
    "o":    (4096, 4096),
    "qkv":  (4096, 6144),
    "down": (14336, 4096),
    "gu":   (4096, 28672),
}
TARGET_S = 0.12


def build(k, n, scale_dtype, rep):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    pk, sc = map(jnp.asarray, fmt.pack_tpu_pairk(w, variant="ramp", scale_dtype=scale_dtype))

    x = jnp.asarray(rng.standard_normal((1, k)), jnp.bfloat16)

    @partial(jax.jit, static_argnames=("reps",))
    def run(x, pk, sc, reps):
        def body(i, c):
            x2 = (x.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(x.dtype)
            o = K.gemv_fp4_pk(x2, pk, sc, variant="ramp", interpret=False)
            return c + jnp.sum(o.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, reps, body, 0.0)

    nbytes = pk.size + sc.size * sc.dtype.itemsize + x.size * 2 + n * 2
    return run, (x, pk, sc), nbytes


def main():
    names = sys.argv[1:] or list(SHAPES)
    jobs = []
    for name in names:
        k, n = SHAPES[name]
        exp = (k * n // 2) / 550e9
        rep = max(200, int(TARGET_S / exp) // 50 * 50)
        for tag, dt in (("f32", np.float32), ("bf16", ml_dtypes.bfloat16)):
            run, args, nbytes = build(k, n, dt, rep)
            jobs.append((f"{name} scale={tag}", run, args, rep, nbytes))

    for label, run, args, rep, _ in jobs:
        float(run(*args, reps=rep)); float(run(*args, reps=2 * rep))
        print(f"compiled {label}", file=sys.stderr, flush=True)

    samples = {label: [] for label, *_ in jobs}
    for rnd in range(6):
        for label, run, args, rep, _ in jobs:
            t0 = time.perf_counter(); float(run(*args, reps=rep)); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(run(*args, reps=2 * rep)); t2 = time.perf_counter() - t0
            if t2 - t1 > 0:
                samples[label].append((t2 - t1) / rep)
        print(f"round {rnd} done", file=sys.stderr, flush=True)
    # median of positive diffs: a single deflated diff (tunnel hiccup in the
    # short run) must not win, as a min() would let it
    best = {k: (float(np.median(v)) if v else float("inf")) for k, v in samples.items()}

    print(f"{'config':<22} {'us':>8} {'GB/s':>8}")
    for label, run, args, rep, nbytes in jobs:
        t = best[label]
        print(f"{label:<22} {t*1e6:8.1f} {nbytes/t/1e9:8.1f}", flush=True)


if __name__ == "__main__":
    main()
