"""w4a8 prefill A/B: int8-activation fused kernel vs bf16 fused kernel vs
XLA dense bf16, across the MXU-bound M range (VERDICT r2 next #2).

Round 2 established the bf16 fused ceiling at ~0.86-0.87x dense for
M >= 256 (parity-minus-decode); the int8 MXU path runs at 2x bf16 rate
(probe: 240 vs 190 TFLOP/s incl. quantization), so w4a8 should BEAT dense.
Also prints the twin-model-style mean abs error of both paths so the speed
comes with its accuracy price tag.  Interleaved difference timing."""

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
    ms = [int(a) for a in sys.argv[1:]] or [256, 512, 2048]
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((N_DIM, K_DIM)) / np.sqrt(K_DIM)).astype(np.float32)
    pk, sc = map(jnp.asarray, quantize_pack_pairk(w, variant="ramp"))
    wt = jnp.asarray(w.T, jnp.bfloat16)

    for m in ms:
        x = jnp.asarray(rng.standard_normal((m, K_DIM)), jnp.bfloat16)
        y_ref = np.asarray(x, np.float32) @ w.T
        y8 = np.asarray(K.matmul_fp4_pk(x, pk, sc, variant="ramp", a8=True, interpret=False), np.float32)
        yb = np.asarray(K.matmul_fp4_pk(x, pk, sc, variant="ramp", a8=False, interpret=False), np.float32)
        e8 = np.abs(y8 - y_ref).mean()
        eb = np.abs(yb - y_ref).mean()
        print(f"M={m}: mean|err| a8={e8:.4f} bf16-path={eb:.4f} (ratio {e8/eb:.3f})", flush=True)

        @partial(jax.jit, static_argnames=("kind", "reps"))
        def run(x, kind, reps):
            def body(i, c):
                x2 = (x.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(x.dtype)
                if kind == "a8":
                    o = K.matmul_fp4_pk(x2, pk, sc, variant="ramp", a8=True, interpret=False)
                elif kind == "bf":
                    o = K.matmul_fp4_pk(x2, pk, sc, variant="ramp", a8=False, interpret=False)
                else:
                    o = jnp.dot(x2, wt, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                return c + jnp.sum(o.astype(jnp.float32)) * 1e-30

            return jax.lax.fori_loop(0, reps, body, 0.0)

        rep = max(20, int(60e9 / (2 * m * K_DIM * N_DIM)))
        kinds = ("a8", "bf", "dense")
        for kind in kinds:
            float(run(x, kind, rep)); float(run(x, kind, 2 * rep))
        samples = {kk: [] for kk in kinds}
        for rnd in range(5):
            for kind in kinds:
                t0 = time.perf_counter(); float(run(x, kind, rep)); t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); float(run(x, kind, 2 * rep)); t2 = time.perf_counter() - t0
                if t2 - t1 > 0:
                    samples[kind].append((t2 - t1) / rep)
        ts = {kk: float(np.median(v)) for kk, v in samples.items()}
        tf = lambda t: 2 * m * K_DIM * N_DIM / t / 1e12
        print(
            f"M={m}: a8 {ts['a8']*1e6:7.0f}us ({tf(ts['a8']):5.1f} TF/s) | "
            f"bf16-fused {ts['bf']*1e6:7.0f}us ({tf(ts['bf']):5.1f}) | "
            f"dense {ts['dense']*1e6:7.0f}us ({tf(ts['dense']):5.1f}) | "
            f"a8 vs dense {ts['dense']/ts['a8']:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
