"""Prefill (GEMM) benchmark: fused pair-K FP4 matmul vs bf16 dense, real TPU.

At M >> 1 the decode cost (fixed per weight tile) amortizes over rows and the
kernel should approach MXU-bound parity with bf16.  Sweeps M and block_m.
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

REP = 50


def bench(name, fn, x, *args):
    rtt = calibrate_rtt()

    @jax.jit
    def run(x, *a):
        def body(i, c):
            x2 = (x.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(x.dtype)
            o = fn(x2, *a)
            return c + o[0, 0].astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(0, REP, body, 0.0)

    float(run(x, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, *args))
        best = min(best, time.perf_counter() - t0 - rtt)
    per = best / REP
    print(f"{name}: {per*1e6:.1f}us", flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    k, n = 4096, 14336
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    packed, scale = fmt.pack_tpu_pairk(w)
    packed, scale = jnp.asarray(packed), jnp.asarray(scale)
    wb = jnp.asarray(w.T, jnp.bfloat16)

    for m in (64, 256, 1024):
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        flops = 2 * m * k * n
        tb = bench(f"bf16 dense  M={m}", lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16), x, wb)
        print(f"   -> {flops/tb/1e12:.1f} TF/s", flush=True)
        for bm in (128, 256, 512):
            if bm > m and bm != 128:
                continue
            tq = bench(f"fp4 pairk   M={m} bm={bm}", lambda a, b, c, bm=bm: K.matmul_fp4_pk(a, b, c, block_m=bm, interpret=False), x, packed, scale)
            print(f"   -> {flops/tq/1e12:.1f} TF/s  ({tb/tq:.2f}x bf16)", flush=True)


if __name__ == "__main__":
    main()
