"""Validate w4a8 sweep winners with RTT-proof run totals.

The block sweep (w4a8_sweep.py) uses rep=10 at M>=512, so each timed run is
~1-10ms against a ~25ms tunnel RTT — good enough to RANK configs, not to
BELIEVE absolute numbers (its M=512 winner printed 504 TF/s, above the 394
TOPS int8 peak).  This script re-times the default config vs named candidate
configs with rep chosen so every sample is >= ~300ms of device time
(difference method: t(2*rep) - t(rep), median of 5 interleaved rounds), plus
the XLA dense bf16 reference.

Usage: python benchmarks/w4a8_validate.py [M ...]   (default 512 2048)
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from torch_bnb_fp4_tpu.convert import quantize_pack_pairk
from torch_bnb_fp4_tpu.ops import kernels as K

K_DIM, N_DIM = 4096, 14336

# (label, block_m, block_k, block_n); None = library default.
# Round-5 additions target the M=128-512 regime (VERDICT r4 next #1):
# shallower-K / deeper-N tiles spread the per-(j,kk) decode+requant pass
# over more MXU work per tile at small nm.
CANDIDATES = [
    ("default", None, None, None),
    ("bm512_bk1024_bn2048", 512, 1024, 2048),
    ("bm256_bk2048_bn3584", 256, 2048, 3584),
    ("bm256_bk2048_bn2048", 256, 2048, 2048),
    ("bm256_bk1024_bn7168", 256, 1024, 7168),
    ("bm128_bk1024_bn4096", 128, 1024, 4096),
    ("bm128_bk512_bn7168", 128, 512, 7168),
    ("bm128_bk2048_bn7168", 128, 2048, 7168),
    ("bm64_bk2048_bn4096", 64, 2048, 4096),
    ("bm512_bk2048_bn2048", 512, 2048, 2048),
    ("bm256_bk1024_bn2048", 256, 1024, 2048),
]


def main():
    import os

    cands = CANDIDATES
    filt = os.environ.get("W4A8_CANDS")  # comma-separated label filter
    if filt:
        keep = set(filt.split(","))
        cands = [c for c in CANDIDATES if c[0] in keep]
    ms = [int(a) for a in sys.argv[1:]] or [512, 2048]
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((N_DIM, K_DIM)) / np.sqrt(K_DIM)).astype(np.float32)
    pk, sc = map(jnp.asarray, quantize_pack_pairk(w, variant="ramp"))
    wt = jnp.asarray(w.T, jnp.bfloat16)

    for m in ms:
        x = jnp.asarray(rng.standard_normal((m, K_DIM)), jnp.bfloat16)
        flops = 2 * m * K_DIM * N_DIM

        def make(bm, bk, bn):
            kw = {}
            if bm is not None:
                kw = dict(block_m=bm, block_k=bk, block_n=bn)

            # reps is a TRACED fori_loop bound: one compile per candidate,
            # any rep count afterwards (a static-reps jit recompiles per rep
            # value — the probe then measures XLA compile time and the rep
            # sizing collapses, the round-5 harness bug)
            @jax.jit
            def run(x, reps):
                def body(i, c):
                    x2 = (x.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(x.dtype)
                    o = K.matmul_fp4_pk(x2, pk, sc, variant="ramp", a8=True,
                                        interpret=False, **kw)
                    return c + jnp.sum(o.astype(jnp.float32)) * 1e-30

                return jax.lax.fori_loop(0, reps, body, 0.0)

            return run

        @jax.jit
        def dense(x, reps):
            def body(i, c):
                x2 = (x.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(x.dtype)
                o = jnp.dot(x2, wt, preferred_element_type=jnp.float32)
                return c + jnp.sum(o) * 1e-30

            return jax.lax.fori_loop(0, reps, body, 0.0)

        @jax.jit
        def bf16_fused(x, reps):
            def body(i, c):
                x2 = (x.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(x.dtype)
                o = K.matmul_fp4_pk(x2, pk, sc, variant="ramp", a8=False,
                                    interpret=False)
                return c + jnp.sum(o.astype(jnp.float32)) * 1e-30

            return jax.lax.fori_loop(0, reps, body, 0.0)

        w8, g8 = K.make_int8_shadow(pk, sc, variant="ramp", interpret=False)

        @jax.jit
        def w8shadow(x, reps):
            def body(i, c):
                x2 = (x.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(x.dtype)
                o = K.matmul_w8(x2, w8, g8, interpret=False)
                return c + jnp.sum(o.astype(jnp.float32)) * 1e-30

            return jax.lax.fori_loop(0, reps, body, 0.0)

        runs = {"dense": dense, "bf16-fused": bf16_fused, "w8shadow": w8shadow}
        for label, bm, bk, bn in cands:
            if bm is not None and bm > m:
                continue
            try:
                r = make(bm, bk, bn)
                float(r(x, 2))
                runs[label] = r
            except Exception as e:  # noqa: BLE001
                print(f"M={m} {label}: SKIP {type(e).__name__}: {e}", flush=True)

        # rep so one run is ~300ms device time; probe on the COMPILED fn
        reps = {}
        for label, r in runs.items():
            float(r(x, 32))  # ensure compiled & warm
            t0 = time.perf_counter(); float(r(x, 64)); t = (time.perf_counter() - t0) / 64
            reps[label] = max(64, int(0.3 / max(t, 1e-7)))
        samples = {label: [] for label in runs}
        for rnd in range(5):
            for label, r in runs.items():
                rep = reps[label]
                t0 = time.perf_counter(); float(r(x, rep)); t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); float(r(x, 2 * rep)); t2 = time.perf_counter() - t0
                if t2 - t1 > 0:
                    samples[label].append((t2 - t1) / rep)
        td = float(np.median(samples["dense"]))
        for label in runs:
            v = samples[label]
            if not v:
                print(f"M={m} {label}: no positive samples", flush=True)
                continue
            t = float(np.median(v))
            print(
                f"M={m} {label:22s}: {t*1e6:7.0f}us ({flops/t/1e12:5.1f} TF/s) "
                f"rep={reps[label]} vs dense {td/t:.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
