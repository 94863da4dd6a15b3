"""w4a8 block-shape sweep (PERF_NOTES round-3: "a8 block_m/block_n sweep not
yet done").  The int8 m-inner kernel reached 245 TF/s at defaults
(bm=256, bk=1024, bn=2048) vs the 394 TOPS int8 peak — this sweeps the block
space at the MXU-bound Ms with same-process interleaved difference timing
(median of positive diffs; single cross-session numbers on this chip are
noise, PERF_NOTES round-1).

Usage: python benchmarks/w4a8_sweep.py [M ...]   (default 512 2048)
"""

import itertools
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


def main():
    ms = [int(a) for a in sys.argv[1:]] or [512, 2048]
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((N_DIM, K_DIM)) / np.sqrt(K_DIM)).astype(np.float32)
    pk, sc = map(jnp.asarray, quantize_pack_pairk(w, variant="ramp"))

    grid = [
        (bm, bk, bn)
        for bm, bk, bn in itertools.product(
            (128, 256, 512), (512, 1024, 2048), (1024, 2048, 3584, 7168)
        )
        # m-inner engagement needs nm > 1 and the f32 acc stripe under 48MB
        # (matmul_fp4_pk:866); w8 scratch (bk, bn) int8 + packed/x tiles under
        # the 100MB vmem budget keeps the big corners out
        if bk * bn <= 2048 * 3584
    ]

    for m in ms:
        x = jnp.asarray(rng.standard_normal((m, K_DIM)), jnp.bfloat16)
        flops = 2 * m * K_DIM * N_DIM

        def make(bm, bk, bn):
            @partial(jax.jit, static_argnames=("reps",))
            def run(x, reps):
                def body(i, c):
                    x2 = (x.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(x.dtype)
                    o = K.matmul_fp4_pk(
                        x2, pk, sc, variant="ramp", a8=True, interpret=False,
                        block_m=bm, block_k=bk, block_n=bn,
                    )
                    return c + jnp.sum(o.astype(jnp.float32)) * 1e-30

                return jax.lax.fori_loop(0, reps, body, 0.0)

            return run

        rep = max(10, int(40e9 / flops))
        results = {}
        runs = {}
        for cfg in grid:
            bm, bk, bn = cfg
            if bm > m:
                continue
            try:
                r = make(*cfg)
                float(r(x, 2))  # compile + smoke
                runs[cfg] = r
            except Exception as e:  # noqa: BLE001 - skip invalid block combos
                print(f"M={m} bm={bm} bk={bk} bn={bn}: SKIP {type(e).__name__}", flush=True)
        for rnd in range(3):
            for cfg, r in runs.items():
                t0 = time.perf_counter(); float(r(x, rep)); t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); float(r(x, 2 * rep)); t2 = time.perf_counter() - t0
                if t2 - t1 > 0:
                    results.setdefault(cfg, []).append((t2 - t1) / rep)
        rows = sorted(
            ((float(np.median(v)), cfg) for cfg, v in results.items() if v),
        )
        for t, (bm, bk, bn) in rows[:8]:
            print(
                f"M={m} bm={bm:4d} bk={bk:4d} bn={bn:4d}: {t*1e6:7.0f}us "
                f"({flops/t/1e12:5.1f} TF/s)",
                flush=True,
            )
        print(f"M={m}: {len(rows)} configs timed; best above", flush=True)


if __name__ == "__main__":
    main()
