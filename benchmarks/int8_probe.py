"""Feasibility probe for the w4a8 prefill path (VERDICT r3 item #2):
does Mosaic on v5e compile (a) f32 -> int8 round/cast, (b) int8 x int8 ->
int32 jnp.dot on the MXU, (c) int8 VMEM scratch stores — and what do the
dots cost vs bf16?

Run alone on the chip: prints PROBE_OK / timing lines or the Mosaic error.
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_i8(x_ref, w_ref, o_ref, acc_ref, w8_ref, *, nk):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # (a) in-kernel round/cast to int8 (weight requant) + (c) i8 scratch
    w8_ref[:] = jnp.round(w_ref[:].astype(jnp.float32) * 127.0).astype(jnp.int8)
    # activation row-quant: per-row absmax over this K tile
    x = x_ref[:].astype(jnp.float32)
    r = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    r = jnp.where(r == 0, 1.0, r)
    x8 = jnp.round(x * (127.0 / r)).astype(jnp.int8)
    # (b) int8 MXU dot with int32 accumulation
    d = jax.lax.dot_general(
        x8, w8_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc_ref[:] += d.astype(jnp.float32) * (r / (127.0 * 127.0))

    @pl.when(kk == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def main():
    m, k, n = 2048, 4096, 4096
    bm, bk, bn = 512, 1024, 2048
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.01, jnp.bfloat16)
    nk = k // bk

    f = pl.pallas_call(
        partial(_kernel_i8, nk=nk),
        grid=(m // bm, n // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bk, bn), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )

    y = jax.jit(f)(x, w)
    y.block_until_ready()
    # sanity vs bf16 matmul (both sides quantize, so loose bound)
    ref = (x.astype(jnp.float32) @ w.astype(jnp.float32))
    err = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - ref)) / jnp.mean(jnp.abs(ref)))
    print(f"PROBE_OK int8 path compiles; rel err vs f32 matmul = {err:.4f}", flush=True)

    # timing: int8 kernel vs XLA dense bf16
    @partial(jax.jit, static_argnames=("reps",))
    def run_i8(x, w, reps):
        def body(i, c):
            x2 = (x.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(x.dtype)
            o = f(x2, w)
            return c + jnp.sum(o.astype(jnp.float32)) * 1e-30
        return jax.lax.fori_loop(0, reps, body, 0.0)

    @partial(jax.jit, static_argnames=("reps",))
    def run_bf(x, w, reps):
        def body(i, c):
            x2 = (x.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(x.dtype)
            o = jnp.dot(x2, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return c + jnp.sum(o.astype(jnp.float32)) * 1e-30
        return jax.lax.fori_loop(0, reps, body, 0.0)

    rep = 50
    for name, fn in (("int8", run_i8), ("bf16", run_bf)):
        float(fn(x, w, rep)); float(fn(x, w, 2 * rep))
        diffs = []
        for _ in range(3):
            t0 = time.perf_counter(); float(fn(x, w, rep)); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(fn(x, w, 2 * rep)); t2 = time.perf_counter() - t0
            if t2 - t1 > 0:
                diffs.append(t2 - t1)
        t = min(diffs) / rep
        tf = 2 * m * k * n / t / 1e12
        print(f"{name}: {t*1e6:.0f}us  {tf:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
