"""Profiling / tracing helpers (SURVEY.md §5 tracing row).

The reference has no tracing story (timing only via torch.utils.benchmark,
sanity_check.py:53-56).  Here: jax.profiler traces viewable in Perfetto /
TensorBoard, a roofline estimator for the FP4 kernels, and the loop-carried
timing method that survives the axon tunnel's early-returning
block_until_ready (PERF_NOTES.md).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tbfp4_trace"):
    """Capture a jax.profiler trace around a block; open in Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def calibrate_rtt() -> float:
    """Median host<->device round-trip of a trivial jitted fetch."""
    f = jax.jit(lambda x: x + 1.0)
    float(f(1.0))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(1.0))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def time_fn(fn, *args, rep: int = 100, rtt: float | None = None) -> float:
    """Seconds per call of ``fn(*args)``: rep iterations inside one jit with a
    loop-carried data dependency through the first arg + ONE host fetch."""
    if rtt is None:
        rtt = calibrate_rtt()

    @jax.jit
    def run(x, *a):
        def body(i, c):
            x2 = (x.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(x.dtype)
            o = fn(x2, *a)
            return c + jnp.sum(o.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, rep, body, 0.0)

    float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0 - rtt)
    return best / rep


# per-chip peaks for roofline estimates (bf16 MXU TFLOP/s, HBM GB/s)
CHIP_PEAKS = {
    "v4": (275.0, 1228.0),
    "v5e": (197.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v6e": (918.0, 1640.0),
}


def detect_chip(default: str = "v5e") -> str:
    """Map the local device's ``device_kind`` onto a CHIP_PEAKS key so
    rooflines self-adjust across TPU generations (kernels pick block shapes
    at trace time; this is the reporting side)."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return default
    for key in ("v6e", "v5p", "v5e", "v4"):
        if key in kind:
            return key
    if "v5 lite" in kind or "v5lite" in kind:
        return "v5e"
    if "trillium" in kind:
        return "v6e"
    return default


def fp4_matmul_roofline(m: int, k: int, n: int, chip: str = "v5e", achieved_s: float | None = None, int8: bool = False) -> dict:
    """Roofline for the fused FP4 matmul: bytes = packed K*N/2 + absmax +
    activations; flops = 2*m*k*n.  ``int8=True`` scores against the int8 MXU
    peak (2x bf16 — the w4a8 path's ceiling).  Returns the bound and
    (optionally) the fraction of roofline achieved."""
    peak_tf, peak_gbs = CHIP_PEAKS[chip]
    if int8:
        peak_tf *= 2.0
    bytes_moved = k * n / 2 + (k // 64) * n * 4 + m * k * 2 + m * n * 2
    flops = 2 * m * k * n
    t_mem = bytes_moved / (peak_gbs * 1e9)
    t_mxu = flops / (peak_tf * 1e12)
    bound = "memory" if t_mem > t_mxu else "compute"
    out = dict(bound=bound, t_mem_us=t_mem * 1e6, t_mxu_us=t_mxu * 1e6,
               roofline_us=max(t_mem, t_mxu) * 1e6)
    if achieved_s is not None:
        out["fraction_of_roofline"] = max(t_mem, t_mxu) / achieved_s
    return out
