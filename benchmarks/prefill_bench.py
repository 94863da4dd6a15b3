"""Prefill (GEMM) benchmark: fused pair-K FP4 matmul vs bf16 dense, real TPU.

Measured landscape (v5e, 4096x14336, ramp variant, round 2):
  * M <= 64 (short prompts / batched decode): bf16 is HBM-bound (~145-155us)
    while FP4 moves 4x fewer bytes -> FP4 wins 2.0-2.8x.
  * M = 128: crossover (~0.95x).
  * M >= 256: BOTH sides are MXU-bound (identical FLOPs), so FP4's ceiling is
    parity minus decode cost.  Best measured 0.86x at M=2048 (bm=512 bk=1024
    bn=3584).  Decomposition probe: XLA dense 1270us; the same dots written
    as a Pallas grid 1332us (+5% schedule gap); + scratch round-trip 1335us
    (scratch is free); + decode/prescale 1473us (the per-tile decode
    serializes ahead of each tile's first dot).  A fused-dequant GEMM cannot
    beat dense bf16 in the MXU-bound regime; it pays for itself in the
    memory-bound regimes (decode, small-M prefill) where the 4x byte
    advantage is live.
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
            return c + jnp.sum(o.astype(jnp.float32)) * 1e-30

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
    packs = {}
    for v in ("exact", "ramp"):
        pk, sc = fmt.pack_tpu_pairk(w, variant=v)
        packs[v] = (jnp.asarray(pk), jnp.asarray(sc))
    wb = jnp.asarray(w.T, jnp.bfloat16)

    for m in (256, 1024, 2048):
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        flops = 2 * m * k * n
        tb = bench(f"bf16 dense  M={m}", lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16), x, wb)
        print(f"   -> {flops/tb/1e12:.1f} TF/s", flush=True)
        for v in ("exact", "ramp"):
            packed, scale = packs[v]
            for bm in (256, 512):
                if bm > m:
                    continue
                tq = bench(f"fp4 pairk[{v}] M={m} bm={bm}", lambda a, b, c, bm=bm, v=v: K.matmul_fp4_pk(a, b, c, block_m=bm, variant=v, interpret=False), x, packed, scale)
                print(f"   -> {flops/tq/1e12:.1f} TF/s  ({tb/tq:.2f}x bf16)", flush=True)


if __name__ == "__main__":
    main()
