"""Small-M fused GEMM bandwidth (the batched-decode regime), real TPU.

Batched continuous-batching decode dispatches M = batch rows (4-32) through
the pair-K fused GEMM.  In this regime the kernel is still HBM-bound (same
packed bytes as the GEMV), so the metric that matters is effective GB/s over
the packed weight bytes — if it lands well under the GEMV's ~650 GB/s, the
batched-decode aggregate throughput has kernel headroom to claim.

Run: python benchmarks/smallm_bench.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from torch_bnb_fp4_tpu.ops import format as fmt
from torch_bnb_fp4_tpu.ops import kernels as K
from torch_bnb_fp4_tpu.utils import calibrate_rtt

REP = 4096  # ~130-600ms per timed sample at 30-150us/iter: samples must be
# >=100ms against the ~25-30ms (+-ms jitter) tunnel RTT or the subtraction
# goes negative (PERF_NOTES measurement methodology)


def bench(fn, x, *args):
    rtt = calibrate_rtt()

    @jax.jit
    def run(x, *a):
        def body(i, c):
            x2 = (x.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(x.dtype)
            o = fn(x2, *a)
            return c + jnp.sum(o.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, REP, body, 0.0)

    float(run(x, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, *args))
        best = min(best, time.perf_counter() - t0 - rtt)
    return best / REP


def main():
    ms = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    rng = np.random.default_rng(0)
    k, n = 4096, 14336
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    pk, sc = fmt.pack_tpu_pairk(w, variant="ramp")
    packed, scale = jnp.asarray(pk), jnp.asarray(sc)
    wbytes = packed.nbytes + scale.nbytes

    x1 = jnp.asarray(rng.standard_normal((1, k)), jnp.bfloat16)
    t = bench(lambda a, b, c: K.gemv_fp4_pk(a, b, c, variant="ramp"), x1, packed, scale)
    print(f"{k}x{n}: gemv  M=1    {t*1e6:7.1f}us  {wbytes/t/1e9:6.0f} GB/s", flush=True)

    for m in ms:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        t = bench(lambda a, b, c: K.matmul_fp4_pk(a, b, c, variant="ramp"), x, packed, scale)
        print(f"{k}x{n}: pairk M={m:<4}  {t*1e6:7.1f}us  {wbytes/t/1e9:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
