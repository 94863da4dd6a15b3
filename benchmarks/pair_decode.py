"""Prototype: pair-K packed FP4 decode with integer bf16-bit assembly + MXU
block-rescale.  Measures the candidate GEMV against the current kernel and
the bf16 matvec baseline on real TPU.

Scheme:
  * packed_pk uint8 (K/2, N): byte (k2, n) = code(Wt[2k2+1, n]) << 4 |
    code(Wt[2k2, n]).  pltpu.bitcast(i32 (R, N) -> bf16) yields (2R, N) with
    the LOW 16 bits of lane (r, n) in row 2r and the HIGH bits in row 2r+1
    (verified on v5e) — so one bitcast turns the decoded pair-bits tile into
    the (BK, BN) bf16 weight tile with K contiguous.
  * decode: FP4 magnitudes * 192 are exact integers {0,1,128,192,64,96,32,48}
    = (1 + b0/2) * 2^(8-e) for m >= 2 — the bf16 bit pattern is
    (135-e)<<7 | b0<<6, assembled for BOTH nibbles at once in one i32 lane
    (~15 int ops per byte ~= 7.5 lane-slots per weight-pair).
  * the per-block absmax/192 scale multiplies the (BM, BN) block partial
    AFTER the MXU dot (1/64 of an op per weight), not each weight.
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

REP = 200


def decode_pair_bits(x_u8_as_i32):
    """(R, C) i32 holding bytes -> (R, C) i32 holding two bf16 bit patterns
    (value = 192 * FP4_CODE[nibble]); low 16 bits = low nibble's value.
    17 vector ops per byte-pair.

    Identities: the six regular magnitudes {32,48,64,96,128,192} sorted by
    magnitude index q=2..7 are exactly bf16 bits 0x4180 + q*0x40 (exponent
    steps of 0x80 interleave with the 1.5x mantissa bit 0x40); [q >= 2] per
    half = bit 3 of (q + 6); the m<2 exception value is q * 0x3F80 (q in
    {0,1} there)."""
    X = x_u8_as_i32
    t = (X << 12) | X
    q2 = t & 0x00070007
    bits = 0x41804180 + (q2 << 6)
    s1 = ((q2 + 0x00060006) >> 3) & 0x00010001
    bits = bits & (s1 * 0xFFFF)
    one = q2 & (s1 ^ 0x00010001)
    bits = bits | (one * 0x3F80)
    return bits | ((t & 0x00080008) << 12)


_GLUT = None


def _gather_tables():
    """(1, 128) f32 tables whose BITS are the u16 deltas for lo (bits 0-15)
    and hi (bits 16-31) nibbles."""
    global _GLUT
    if _GLUT is None:
        import ml_dtypes

        d = (192.0 * fmt.FP4_CODE[remap_rank(np.arange(16))]).astype(ml_dtypes.bfloat16).view(np.uint16).astype(np.uint32)
        lo = np.zeros((1, 128), np.uint32)
        hi = np.zeros((1, 128), np.uint32)
        lo[0, :16] = d
        hi[0, :16] = d << 16
        _GLUT = (
            jnp.asarray(lo.view(np.float32)),
            jnp.asarray(hi.view(np.float32)),
        )
    return _GLUT


def decode_pair_bits_gather(X, tlo, thi):
    """Gather variant: 2 dynamic_gathers per byte (tables hold the full u16
    delta incl sign and the 0/1 exceptions)."""
    rows, cols = X.shape
    lo = X & 0xF
    hi = X >> 4
    tl = jnp.broadcast_to(tlo, (rows, 128))
    th = jnp.broadcast_to(thi, (rows, 128))
    out = None
    for c0 in range(0, cols, 128):
        gl = jnp.take_along_axis(tl, lo[:, c0 : c0 + 128], axis=1)
        gh = jnp.take_along_axis(th, hi[:, c0 : c0 + 128], axis=1)
        bits = jax.lax.bitcast_convert_type(gl, jnp.int32) | jax.lax.bitcast_convert_type(gh, jnp.int32)
        out = bits if out is None else jnp.concatenate([out, bits], axis=1)
    return out


def test_decode_exact():
    """All 256 bytes decode to exactly 192*code[lo], 192*code[hi]."""
    bytes_in = jnp.arange(256, dtype=jnp.int32).reshape(8, 32)
    bits = np.asarray(decode_pair_bits(bytes_in)).view(np.uint32).reshape(-1)
    u16 = np.stack([(bits & 0xFFFF), (bits >> 16)], -1).astype(np.uint16)
    import ml_dtypes

    vals = u16.view(ml_dtypes.bfloat16).astype(np.float32)  # (256, 2)
    b = np.arange(256)
    # stored nibbles are rank-remapped; remap is an involution
    want_lo = 192.0 * fmt.FP4_CODE[remap_rank(b & 0xF)]
    want_hi = 192.0 * fmt.FP4_CODE[remap_rank(b >> 4)]
    np.testing.assert_array_equal(vals[:, 0], want_lo)
    np.testing.assert_array_equal(vals[:, 1], want_hi)
    print("decode_pair_bits exact for all 256 bytes", flush=True)


# --------------------------------------------------------------------------
# Candidate GEMV kernel (pair-K)
# --------------------------------------------------------------------------

def gemv_pairs_kernel(x_ref, p_ref, s_ref, o_ref, acc_ref, *, bs, nk, impl, tabs):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    X = p_ref[:].astype(jnp.int32)
    if impl == "arith":
        bits = decode_pair_bits(X)  # (BK2, BN)
    else:
        bits = decode_pair_bits_gather(X, *tabs)
    w = pltpu.bitcast(bits, jnp.bfloat16)  # (BK, BN), K contiguous
    bk = w.shape[0]
    x = x_ref[:]  # (BM, BK) bf16
    nblk = bk // bs
    acc = acc_ref[:]
    for b in range(nblk):
        part = jnp.dot(
            x[:, b * bs : (b + 1) * bs],
            w[b * bs : (b + 1) * bs, :],
            preferred_element_type=jnp.float32,
        )
        acc = acc + part * s_ref[b][None, :]
    acc_ref[:] = acc

    @pl.when(kk == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def gemv_pairs(x, packed_pk, scale, bs=64, block_k=2048, block_n=None, impl="arith", semantics=None):
    k2, n = packed_pk.shape
    k = 2 * k2
    m = x.shape[0]
    if block_n is None:
        block_n = n
    nk = k // block_k
    grid = (n // block_n, nk)
    tabs = _gather_tables() if impl == "gather" else None
    in_specs = [
        pl.BlockSpec((m, block_k), lambda j, kk: (0, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_k // 2, block_n), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_k // bs, block_n), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, packed_pk, scale]
    if tabs is not None:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        operands += list(tabs)

    def kern(x_ref, p_ref, s_ref, *rest):
        ts = tuple(t[:] for t in rest[:-2]) if tabs is not None else ()
        o_ref, acc_ref = rest[-2:]
        gemv_pairs_kernel(x_ref, p_ref, s_ref, o_ref, acc_ref, bs=bs, nk=nk, impl=impl, tabs=ts)

    kwargs = {
        "compiler_params": pltpu.CompilerParams(
            dimension_semantics=semantics, vmem_limit_bytes=100 * 2**20
        )
    }
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, block_n), lambda j, kk: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((m, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n, bytes_accessed=k2 * n + m * k * 2, transcendentals=0
        ),
        **kwargs,
    )(*operands)


def remap_rank(c):
    """FP4 magnitude index m -> rank in value order (involution: the six
    regular magnitudes sorted ascending are m = 6,7,4,5,2,3, i.e. flip bit 2
    of m iff bit 1 is set; m<2 and the sign bit pass through)."""
    c = np.asarray(c)
    return (c & 8) | ((c & 7) ^ ((c & 2) << 1))


def pack_pairs(w, bs=64):
    """w (N, K) -> packed_pk (K/2, N) u8 (rank-remapped nibbles),
    scale (K/bs, N) f32 (absmax/192)."""
    codes, absmax = fmt.quantize_codes(w, bs)  # flat over (N, K)
    codes = remap_rank(codes).astype(np.uint8)
    n, k = w.shape
    ct = codes.reshape(n, k).T  # (K, N)
    pk = (ct[1::2].astype(np.uint8) << 4) | ct[0::2]
    sc = (absmax.reshape(n, k // bs).T / 192.0).astype(np.float32)
    return np.ascontiguousarray(pk), np.ascontiguousarray(sc)


def correctness(rng):
    n, k = 256, 1024
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    pk, sc = pack_pairs(w)
    x = (rng.standard_normal((8, k)) * 0.5).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    y = np.asarray(gemv_pairs(xb, jnp.asarray(pk), jnp.asarray(sc), block_k=1024), np.float32)
    wt = fmt.unpack_tpu(*fmt.pack_tpu(w))  # golden dequant (K, N)
    golden = np.asarray(xb, np.float32) @ wt
    err = np.abs(y - golden).max() / (np.abs(golden).max() + 1e-9)
    print(f"gemv_pairs rel err vs golden: {err:.2e}", flush=True)
    assert err < 2e-2, err


def calibrate_rtt():
    f = jax.jit(lambda x: x + 1.0)
    float(f(1.0))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(1.0))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench(name, fn, x, *args):
    """Times fn(x, *args) with a loop-carried dependency through x so XLA
    cannot hoist the call out of the loop (PERF_NOTES.md methodology)."""
    rtt = calibrate_rtt()

    @jax.jit
    def run(x, *a):
        def body(i, c):
            x2 = x * (1.0 + c * 1e-30).astype(x.dtype)
            o = fn(x2, *a)
            return c + jnp.sum(o.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, REP, body, 0.0)

    float(run(x, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, *args))
        best = min(best, time.perf_counter() - t0 - rtt)
    per = best / REP
    print(f"{name}: {per*1e6:.1f}us", flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    test_decode_exact()
    correctness(rng)

    # headline shape: x(1,4096) @ W(4096 -> 14336)
    k, n = 4096, 14336
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((8, k)), jnp.bfloat16)  # BM=8 padded
    pk, sc = pack_pairs(w)
    pk, sc = jnp.asarray(pk), jnp.asarray(sc)

    # correctness of the gather variant once
    wt = fmt.unpack_tpu(*fmt.pack_tpu(w))
    golden = np.asarray(x, np.float32) @ wt
    try:
        yg = np.asarray(gemv_pairs(x, pk, sc, block_k=1024, block_n=896, impl="gather"), np.float32)
        print(f"gather impl rel err: {np.abs(yg-golden).max()/np.abs(golden).max():.2e}", flush=True)
    except Exception as e:
        print(f"gather impl FAILED: {str(e)[:150]}", flush=True)

    # decoded bf16 w tile (bk x bn) materializes in VMEM
    SEM = ("parallel", "arbitrary")
    for bk, bn in ((256, 3584), (256, 7168), (512, 3584), (512, 7168), (512, 1792), (1024, 3584), (1024, 7168)):
        tag = f"pairs[arith17] bk={bk} bn={bn}"
        try:
            bench(tag, lambda a, b, c, bk=bk, bn=bn: gemv_pairs(a, b, c, block_k=bk, block_n=bn, semantics=SEM), x, pk, sc)
        except Exception as e:
            print(f"{tag}: FAILED {str(e)[:120]}", flush=True)

    # current kernel + bf16 baseline
    from torch_bnb_fp4_tpu.ops import kernels as K

    packed, absmax = fmt.pack_tpu(w)
    packed, absmax = jnp.asarray(packed), jnp.asarray(absmax)
    x1 = x[:1]
    bench("current gemv_fp4", lambda a, b, c: K.gemv_fp4(a, b, c, interpret=False), x1, packed, absmax)
    wb = jnp.asarray(w.T, jnp.bfloat16)
    bench("bf16 matvec", lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16), x1, wb)


if __name__ == "__main__":
    main()
