"""Round-5 re-sweep of the small-GEMV block shapes with the FIXED harness.

Round 3 concluded "the small-kernel lever is dead" from sweeps whose rep
sizing was broken (static-reps jit => probes measured compile time, samples
were ~ms against ~26ms tunnel jitter).  This script re-tests the o_proj and
qkv decode GEMVs with traced-rep loops, full-output consumption, and >=
200ms per sample — if a block shape really is +20-30% on the small kernels,
the batch-1 headline gains ~5%.

Usage: python benchmarks/smallk_sweep2.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from torch_bnb_fp4_tpu.convert import quantize_pack_pairk
from torch_bnb_fp4_tpu.ops import kernels as K

SHAPES = [("o_proj", 4096, 4096), ("qkv", 4096, 6144), ("down", 14336, 4096)]
# (block_k, block_n) candidates; None = library default
CANDS = [None, (256, 4096), (512, 4096), (512, 2048), (1024, 4096), (2048, 4096)]


def main():
    rng = np.random.default_rng(0)
    for name, kd, nd in SHAPES:
        w = (rng.standard_normal((nd, kd)) * 0.05).astype(np.float32)
        pk, sc = map(jnp.asarray, quantize_pack_pairk(w, variant="ramp"))
        x = jnp.asarray(rng.standard_normal((1, kd)), jnp.bfloat16)
        nbytes = pk.size + sc.size * 4

        runs = {}
        for cand in CANDS:
            label = "default" if cand is None else f"bk{cand[0]}_bn{cand[1]}"
            kw = {} if cand is None else dict(block_k=cand[0], block_n=cand[1])

            @jax.jit
            def run(x, reps, kw=kw):
                def body(i, c):
                    x2 = (x.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(x.dtype)
                    o = K.gemv_fp4_pk(x2, pk, sc, variant="ramp",
                                      interpret=False, **kw)
                    return c + jnp.sum(o.astype(jnp.float32)) * 1e-30

                return jax.lax.fori_loop(0, reps, body, 0.0)

            try:
                float(run(x, 2))
                runs[label] = run
            except Exception as e:  # noqa: BLE001
                print(f"{name} {label}: SKIP {type(e).__name__}: {e}", flush=True)

        rtt_f = jax.jit(lambda v: v + 1.0); float(rtt_f(1.0))
        t0 = time.perf_counter(); float(rtt_f(1.0)); rtt = time.perf_counter() - t0
        reps = {}
        for label, r in runs.items():
            float(r(x, 64))
            t0 = time.perf_counter(); float(r(x, 256))
            probe = max((time.perf_counter() - t0 - rtt) / 256, 1e-7)
            reps[label] = max(256, int(0.2 / probe))
        samples = {label: [] for label in runs}
        for rnd in range(5):
            for label, r in runs.items():
                rep = reps[label]
                try:
                    t0 = time.perf_counter(); float(r(x, rep)); t1 = time.perf_counter() - t0
                    t0 = time.perf_counter(); float(r(x, 2 * rep)); t2 = time.perf_counter() - t0
                except Exception as e:  # noqa: BLE001 — worker restart: wait + go on
                    print(f"{name} {label}: sample lost ({type(e).__name__})", flush=True)
                    time.sleep(20)
                    continue
                if t2 - t1 > 0:
                    samples[label].append((t2 - t1) / rep)
        for label in runs:
            v = sorted(samples[label])
            if not v:
                continue
            t = v[len(v) // 2] if len(v) % 2 else 0.5 * (v[len(v) // 2 - 1] + v[len(v) // 2])
            print(f"{name} {label:14s}: {t*1e6:6.1f}us  {nbytes/t/1e9:6.1f} GB/s "
                  f"(rep={reps[label]})", flush=True)


if __name__ == "__main__":
    main()
