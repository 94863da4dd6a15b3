"""Block-shape sweep for the small-M (batched decode) fused GEMM regime.

smallm_bench.py measured the default m-outer pair-K GEMM at 522-550 GB/s for
M=8..32 vs the GEMV's 651 — this sweeps (block_k, block_n) at the same
methodology (>=250ms loop-carried samples) to see whether the 16% gap is a
tiling artifact or inherent to the multi-row kernel.

Run: python benchmarks/smallm_sweep.py [M ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from torch_bnb_fp4_tpu.ops import format as fmt
from torch_bnb_fp4_tpu.ops import kernels as K
from smallm_bench import bench

def main():
    ms = [int(a) for a in sys.argv[1:]] or [8, 16]
    rng = np.random.default_rng(0)
    k, n = 4096, 14336
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    pk, sc = fmt.pack_tpu_pairk(w, variant="ramp")
    packed, scale = jnp.asarray(pk), jnp.asarray(sc)
    wbytes = packed.nbytes + scale.nbytes

    for m in ms:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        for bk in (512, 1024, 2048):
            for bn in (2048, 3584, 7168):
                t = bench(
                    lambda a, b, c, bk=bk, bn=bn: K.matmul_fp4_pk(
                        a, b, c, variant="ramp", block_k=bk, block_n=bn
                    ),
                    x, packed, scale,
                )
                print(f"M={m:<3} bk={bk:<5} bn={bn:<5} {t*1e6:7.1f}us  "
                      f"{wbytes/t/1e9:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
