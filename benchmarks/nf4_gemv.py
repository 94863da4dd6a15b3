"""NF4 pair-K LUT GEMV vs bf16 matvec vs FP4 ramp (VERDICT r2 next #7).

Round 2 served NF4 through the split-K gather kernel at ~1.6x SLOWER than
the bf16 matvec; the pair-K "lut" decode (two 16-bit bit-pattern gathers per
byte) should land near the exact-FP4 kernel (~93us on 4096x14336, i.e.
~1.6x FASTER than bf16).  Interleaved difference timing, run alone."""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from torch_bnb_fp4_tpu.ops import format as fmt
from torch_bnb_fp4_tpu.ops import kernels as K

K_DIM, N_DIM, REP = 4096, 14336, 300


def main():
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((N_DIM, K_DIM)) * 0.05).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((1, K_DIM)), jnp.bfloat16)

    from torch_bnb_fp4_tpu.convert import quantize_pack_pairk, quantize_pack_pairk_lut

    pk_nf, sc_nf = map(jnp.asarray, quantize_pack_pairk_lut(w, fmt.NF4_CODE))
    cb = jnp.asarray(fmt.NF4_CODE)
    pk_r, sc_r = map(jnp.asarray, quantize_pack_pairk(w, variant="ramp"))
    wt = jnp.asarray(w.T, jnp.bfloat16)

    # correctness first
    y = np.asarray(K.gemv_fp4_pk(x, pk_nf, sc_nf, None, cb, variant="lut", interpret=False), np.float32)
    golden = np.asarray(x, np.float32) @ fmt.unpack_tpu_pairk_lut(np.asarray(pk_nf), np.asarray(sc_nf), fmt.NF4_CODE)
    rel = np.abs(y - golden).mean() / np.abs(golden).mean()
    print(f"nf4-lut on-chip rel err vs golden: {rel:.5f}", flush=True)
    assert rel < 2e-2, rel

    @partial(jax.jit, static_argnames=("kind", "reps"))
    def run(x, kind, reps):
        def body(i, c):
            x2 = (x.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(x.dtype)
            if kind == "nf4":
                o = K.gemv_fp4_pk(x2, pk_nf, sc_nf, None, cb, variant="lut", interpret=False)
            elif kind == "ramp":
                o = K.gemv_fp4_pk(x2, pk_r, sc_r, variant="ramp", interpret=False)
            else:
                o = jnp.dot(x2, wt, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return c + jnp.sum(o.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, reps, body, 0.0)

    kinds = ("nf4", "ramp", "bf16")
    for kind in kinds:
        float(run(x, kind, REP)); float(run(x, kind, 2 * REP))
        print(f"compiled {kind}", file=sys.stderr, flush=True)
    samples = {k: [] for k in kinds}
    for rnd in range(6):
        for kind in kinds:
            t0 = time.perf_counter(); float(run(x, kind, REP)); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(run(x, kind, 2 * REP)); t2 = time.perf_counter() - t0
            if t2 - t1 > 0:
                samples[kind].append((t2 - t1) / REP)
    for kind in kinds:
        t = float(np.median(samples[kind]))
        print(f"{kind:>5}: {t*1e6:7.1f} us", flush=True)
    tb = float(np.median(samples["bf16"]))
    tn = float(np.median(samples["nf4"]))
    print(f"nf4-lut vs bf16 matvec: {tb/tn:.2f}x", flush=True)


if __name__ == "__main__":
    main()
