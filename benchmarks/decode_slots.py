"""Slot-cost attribution for the pair decode: time variants of the 17-op
sequence with steps removed/substituted (results wrong, timing right) to find
which ops cost real VPU slots.  DMA is constant-index (loaded once)."""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from torch_bnb_fp4_tpu.utils import calibrate_rtt
from torch_bnb_fp4_tpu.utils.synth import synth_quant_linear

q = synth_quant_linear(jax.random.PRNGKey(0), 14336, 4096)
REP, NBLK = 300, 8


def v_full(X):  # 17 nominal ops (production)
    t = (X << 12) | X
    q2 = t & 0x00070007
    bits = 0x41804180 + (q2 << 6)
    s1 = ((q2 + 0x00060006) >> 3) & 0x00010001
    bits = bits & (s1 * 0xFFFF)
    one = q2 & (s1 ^ 0x00010001)
    bits = bits | (one * 0x3F80)
    return bits | ((t & 0x00080008) << 12)


def v_nosign(X):  # -3
    t = (X << 12) | X
    q2 = t & 0x00070007
    bits = 0x41804180 + (q2 << 6)
    s1 = ((q2 + 0x00060006) >> 3) & 0x00010001
    bits = bits & (s1 * 0xFFFF)
    one = q2 & (s1 ^ 0x00010001)
    return bits | (one * 0x3F80)


def v_ramponly(X):  # 6 nominal: ramp + sign only
    t = (X << 12) | X
    q2 = t & 0x00070007
    bits = 0x41804180 + (q2 << 6)
    return bits | ((t & 0x00080008) << 12)


def v_nomuls(X):  # muls -> shift/or (wrong values, same nominal count +1)
    t = (X << 12) | X
    q2 = t & 0x00070007
    bits = 0x41804180 + (q2 << 6)
    s1 = ((q2 + 0x00060006) >> 3) & 0x00010001
    bits = bits & ((s1 << 16) | s1)
    one = q2 & (s1 ^ 0x00010001)
    bits = bits | (one << 13)
    return bits | ((t & 0x00080008) << 12)


def v_dropmask(X):  # drop the two exception-mask muls entirely (-4)
    t = (X << 12) | X
    q2 = t & 0x00070007
    bits = 0x41804180 + (q2 << 6)
    s1 = ((q2 + 0x00060006) >> 3) & 0x00010001
    bits = bits & s1
    one = q2 & (s1 ^ 0x00010001)
    bits = bits | one
    return bits | ((t & 0x00080008) << 12)


VARIANTS = {
    "full(17)": v_full,
    "nosign(14)": v_nosign,
    "ramponly(6)": v_ramponly,
    "muls->shifts(18)": v_nomuls,
    "nomaskmuls(15)": v_dropmask,
}


def bench(name, decode):
    def kern(p_ref, o_ref, acc_ref):
        kk = pl.program_id(0)

        @pl.when(kk == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        bits = decode(p_ref[:].astype(jnp.int32))
        w = pltpu.bitcast(bits, jnp.bfloat16)
        acc_ref[:] += w[0:1, :].astype(jnp.float32) + w[511:512, :].astype(jnp.float32)

        @pl.when(kk == NBLK - 1)
        def _():
            o_ref[:] = acc_ref[:]

    n = q.packed.shape[1]
    pc = pl.pallas_call(
        kern,
        grid=(NBLK,),
        in_specs=[pl.BlockSpec((256, n), lambda kk: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n), lambda kk: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )
    rtt = calibrate_rtt()

    @jax.jit
    def run(x8):
        def body(i, c):
            x2 = x8 + (c * 1e-30).astype(jnp.uint8)
            o = pc(x2)
            return c + jnp.ravel(o)[0] * 1e-30

        return jax.lax.fori_loop(0, REP, body, 0.0)

    x8 = jnp.zeros(q.packed.shape, jnp.uint8)
    float(run(x8))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(x8))
        best = min(best, time.perf_counter() - t0 - rtt)
    per = best / REP
    lanes = 256 * q.packed.shape[1] * NBLK
    print(f"{name}: {per*1e6:.1f}us  ({per*3.85e12/lanes:.1f} slots/lane @3.85T)", flush=True)


if __name__ == "__main__":
    for name, fn in VARIANTS.items():
        bench(name, fn)
