"""Microbenchmark: FP4 decode strategy shootout inside Pallas on real TPU.

Usage: python benchmarks/decode_variants.py [variant ...]

Decode cost per weight is THE determinant of batch-1 GEMV speed (the kernel
is VPU-bound, not HBM-bound: measured ~5.7 Tops/s effective on v5e).  This
harness times candidate decode implementations over a (512, 1024) uint8 tile.

Timing notes for the axon tunnel: block_until_ready() returns early, so every
measurement runs REP iterations inside one jit with a loop-carried data
dependency and a single float() host fetch; tunnel RTT (~30ms) is calibrated
out.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from torch_bnb_fp4_tpu.ops import format as fmt
from torch_bnb_fp4_tpu.ops.kernels import _decode_fp4_f32

SH = (512, 1024)
REP = 500


def calibrate_rtt():
    f = jax.jit(lambda x: x + 1.0)
    float(f(1.0))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(1.0))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench(name, kern, data, rtt, extra=()):
    try:
        pc = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(SH, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(extra)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

        @jax.jit
        def run(d, *e):
            def body(i, c):
                d2 = d + (i & 1).astype(jnp.uint8)  # defeat loop-invariant hoisting
                o = pc(d2, *e)
                return c + jnp.sum(o) * 1e-30

            return jax.lax.fori_loop(0, REP, body, 0.0)

        float(run(data, *extra))
        t0 = time.perf_counter()
        float(run(data, *extra))
        t = time.perf_counter() - t0
        per = (t - rtt) / REP
        nw = SH[0] * SH[1] * 2
        print(f"{name}: {per*1e6:.2f}us/pass -> {nw/per/1e12:.3f} T weights/s", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"{name} FAILED: {str(ex)[:300]}".replace("\n", " "), flush=True)


def kern_bits(x_ref, o_ref):
    w = x_ref[:].astype(jnp.int32)
    o_ref[:] = _decode_fp4_f32(w >> 4) + _decode_fp4_f32(w & 0xF)


def kern_int(x_ref, o_ref):
    w = x_ref[:].astype(jnp.int32)

    def dec(n):
        b = n & 1
        e = (n >> 1) & 3
        num = (256 | (b << 7)) >> e
        num = jnp.where((n & 6) == 0, b, num)
        return num * (1 - ((n >> 2) & 2))

    o_ref[:] = (dec(w >> 4) + dec(w & 0xF)).astype(jnp.float32)


def kern_tree(x_ref, c_ref, o_ref):
    w = x_ref[:].astype(jnp.int32)

    def tree(codes):
        leaves = [c_ref[0, i] for i in range(16)]
        for level in range(4):
            bit = (codes & (1 << level)) != 0
            leaves = [
                jnp.where(bit, leaves[2 * i + 1], leaves[2 * i])
                for i in range(len(leaves) // 2)
            ]
        return leaves[0]

    o_ref[:] = tree(w >> 4) + tree(w & 0xF)


def kern_take(x_ref, c_ref, o_ref):
    w = x_ref[:].astype(jnp.int32)
    tab = jnp.broadcast_to(c_ref[:], (SH[0], 16))
    hi = jnp.take_along_axis(tab, w >> 4, axis=1)
    lo = jnp.take_along_axis(tab, w & 0xF, axis=1)
    o_ref[:] = hi + lo


def kern_byte_lut_f32(x_ref, c_ref, o_ref):
    # decode PAIRS via a 256-entry f32 table of hi+lo sums is wrong for
    # independent scaling, but measures raw 256-gather speed
    w = x_ref[:].astype(jnp.int32)
    tab = jnp.broadcast_to(c_ref[:], (SH[0], 256))
    o_ref[:] = jnp.take_along_axis(tab, w, axis=1)


VARIANTS = {
    "bits": (kern_bits, 0),
    "int": (kern_int, 0),
    "tree": (kern_tree, 16),
    "take": (kern_take, 16),
    "byte_lut": (kern_byte_lut_f32, 256),
}


def main():
    rng = np.random.default_rng(0)
    data = jax.device_put(jnp.asarray(rng.integers(0, 256, SH).astype(np.uint8)))
    rtt = calibrate_rtt()
    print(f"rtt {rtt*1e3:.1f}ms backend={jax.default_backend()}")
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        kern, tab_n = VARIANTS[name]
        extra = ()
        if tab_n:
            tab = np.zeros(tab_n, np.float32)
            tab[:16] = fmt.FP4_CODE[: min(16, tab_n)]
            if tab_n == 256:
                codes = np.arange(256)
                tab = (fmt.FP4_CODE[codes >> 4] + fmt.FP4_CODE[codes & 0xF]).astype(np.float32)
            extra = (jnp.asarray(tab).reshape(1, tab_n),)
        bench(name, kern, data, rtt, extra)


def kern_gather(x_ref, c_ref, o_ref):
    # tpu.dynamic_gather: tab/indices/out all (BK, BN); out[i,j] = tab[i, idx[i,j]]
    # codebook lives in the first 16 lanes of each row.
    w = x_ref[:].astype(jnp.int32)
    tab = jnp.broadcast_to(c_ref[:], SH)  # (1, BN) -> (BK, BN)
    hi = jnp.take_along_axis(tab, w >> 4, axis=1)
    lo = jnp.take_along_axis(tab, w & 0xF, axis=1)
    o_ref[:] = hi + lo


def _register_gather():
    tab = np.zeros(SH[1], np.float32)
    tab[:16] = fmt.FP4_CODE
    VARIANTS["gather"] = (kern_gather, None)
    return jnp.asarray(tab).reshape(1, SH[1])


GATHER_TAB = _register_gather()


if __name__ == "__main__":
    main()
