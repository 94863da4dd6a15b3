"""Correctness + speed sanity check — parity with the reference's
sanity_check.py (195 LoC validation harness, SURVEY.md §3.5).

Correctness: twin-model elementwise diff between an FP4-quantized MLP and its
exact twin, across the three dispatch shapes the reference probes
((1,1,H) GEMV-3d, (1,H) GEMV-2d, (1,L,H) GEMM — sanity_check.py:141-147);
acceptance band 0.045-0.065 with torch-style init (sanity_check.py:177-179).

Speed: bf16 dense vs FP4 fused, GEMV and GEMM, on the reference's TestModel
geometry (768 -> 2048 x4 -> 64, sanity_check.py:38-50) padded to TPU lane
quanta.  On CPU this runs the kernels in interpret mode (slow, correctness
only); on TPU it reports real times.

Usage: python examples/sanity_check.py [--skip-speed]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from torch_bnb_fp4_tpu.models import DenseLinear, dense_linear, quantize_linear


class MLP:
    """The reference TestModel: 768 -> 2048 x4 -> 64 (padded: 64 -> 128)."""

    GEOM = [(768, 2048), (2048, 2048), (2048, 2048), (2048, 2048), (2048, 2048), (2048, 128)]

    def __init__(self, rng, quantized: bool, dtype=jnp.float32):
        self.layers = []
        for k_in, n_out in self.GEOM:
            bound = 1.0 / np.sqrt(k_in)
            w = rng.uniform(-bound, bound, (n_out, k_in)).astype(np.float32)
            b = rng.uniform(-bound, bound, n_out).astype(np.float32)
            self.layers.append(
                quantize_linear(w, b) if quantized else dense_linear(w, b, dtype=dtype)
            )

    def __call__(self, x):
        for lin in self.layers:
            x = lin(x)
        return x


def check_correctness(rng) -> bool:
    k_in = 1024
    bound = 1.0 / np.sqrt(k_in)
    w = rng.uniform(-bound, bound, (1024, k_in)).astype(np.float32)
    b = rng.uniform(-bound, bound, 1024).astype(np.float32)
    q = quantize_linear(w, b)
    ok = True
    for shape in [(1, 1, k_in), (1, k_in), (1, 256, k_in)]:
        x = rng.standard_normal(shape).astype(np.float32)
        y = np.asarray(q(jnp.asarray(x)))
        exact = x.reshape(-1, k_in) @ w.T + b
        err = float(np.abs(y.reshape(-1, 1024) - exact).mean())
        band = 0.045 <= err <= 0.065
        ok &= band
        print(f"  shape {str(shape):>14}  mean |err| = {err:.4f}  "
              f"{'OK (in reference band 0.045-0.065)' if band else 'OUT OF BAND'}")
    return ok


def _time(fn, *args, rep=100):
    f = jax.jit(lambda x, *a: jax.lax.fori_loop(
        0, rep,
        lambda i, c: c + fn(x * (1 + c * 1e-30).astype(x.dtype), *a)[0, 0].astype(jnp.float32) * 1e-30,
        0.0,
    ))
    float(f(*args))
    t0 = time.perf_counter()
    float(f(*args))
    return (time.perf_counter() - t0) / rep


class BnbStyleMLP:
    """The same quantized MLP computed the way bitsandbytes' GEMM path does
    (reference QuantData._dequant_linear, __init__.py:423-436): dequantize
    the FULL weight to a temp tensor in HBM, then a dense matmul — the
    three-way comparison column the reference's sanity_check prints
    (pytorch / bnb / lib, sanity_check.py:80-99)."""

    def __init__(self, quant: "MLP"):
        self.layers = quant.layers

    def __call__(self, x):
        from torch_bnb_fp4_tpu.models import dequantize_weight

        for lin in self.layers:
            wt = dequantize_weight(lin, out_dtype=x.dtype).T  # (k, n) in HBM
            y = jnp.dot(x, wt, preferred_element_type=jnp.float32)
            if lin.bias is not None:
                y = y + lin.bias.astype(jnp.float32)
            x = y.astype(x.dtype)
        return x


def check_speed(rng):
    """Three-way table per dtype (reference sanity_check.py:80-122 prints
    pytorch/bnb/lib for fp32, fp16, bf16).  Here: dense XLA matmul /
    bnb-style (dequant-to-HBM + dense matmul, the reference's GEMM strategy)
    / our fused kernel.  bf16 is the serving path; the f32 fused path trades
    speed for HIGHEST-precision dots (reference parity: true-fp32 cuBLAS)."""
    quant = MLP(rng, quantized=True)
    bnb_style = BnbStyleMLP(quant)
    for dtype in (jnp.float32, jnp.bfloat16):
        dense = MLP(rng, quantized=False, dtype=dtype)
        rows = []
        for mode, m in (("gemv", 1), ("gemm", 256)):
            x = jnp.asarray(rng.standard_normal((m, 768)), dtype)
            td = _time(lambda x: dense(x), x)
            tb = _time(lambda x: bnb_style(x), x)
            tq = _time(lambda x: quant(x), x)
            rows.append((mode, td * 1e6, tb * 1e6, tq * 1e6))
        nm = jnp.dtype(dtype).name
        print(f"\n  [{nm}]")
        print(f"  {'mode':<6} {'dense us':>12} {'bnb-style us':>14} {'fp4 fused us':>14} "
              f"{'vs dense':>9} {'vs bnb':>8}")
        for mode, td, tb, tq in rows:
            print(f"  {mode:<6} {td:>12.1f} {tb:>14.1f} {tq:>14.1f} "
                  f"{td / tq:>8.2f}x {tb / tq:>7.2f}x")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-speed", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}")
    print("correctness (reference acceptance band):")
    ok = check_correctness(rng)
    if not args.skip_speed:
        print("speed (6-layer MLP, reference TestModel geometry):")
        check_speed(rng)
    print("PASSED" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
