"""QuantizedLinear: the TPU-native counterpart of the reference's
``TorchFP4Linear`` + ``QuantData`` (torch_bnb_fp4/__init__.py:340-714).

Design departures (SURVEY.md §7 "Design stance"):
  * No nn.Module surgery or runtime dtype latching — a ``QuantLinear`` is an
    immutable pytree of device arrays produced offline (or by
    :func:`quantize_linear` in-process), applied functionally.
  * The reference's runtime dispatch policy (QuantData.forward,
    __init__.py:560-618: GEMV when exactly one row, else dequant+GEMM) becomes
    trace-time shape specialization: under ``jit`` the input shape is static,
    so dispatch costs nothing and both paths share one fused kernel family.
  * Padding: kernels need K % (2*blocksize) == 0 and N % 128 == 0.  The pack
    step zero-pads N (code 0 dequantizes to absmax*0 = 0) and the apply step
    slices the result; K padding pads x with zeros.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import format as fmt
from ..ops import kernels as K


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuantLinear:
    """Blockwise-FP4 linear layer state (pytree).

    y = x @ dequant(packed).T-style contraction + bias, where ``packed`` is
    the split-K TPU layout of W (n_out, k_in) — see ops/format.pack_tpu.
    Equivalent state to reference QuantData (__init__.py:345-401): packed
    bytes, absmax, shape, bias, codebook choice.
    """

    packed: jax.Array  # uint8 (k_pad // 2, n_pad)
    absmax: jax.Array  # f32 (k_pad // blocksize, n_pad)
    bias: jax.Array | None  # (n_out,) or None
    n_out: int = dataclasses.field(metadata=dict(static=True))
    k_in: int = dataclasses.field(metadata=dict(static=True))
    blocksize: int = dataclasses.field(default=64, metadata=dict(static=True))
    # None -> exact arithmetic FP4 decode; else a (16,) table (e.g. NF4)
    codebook: jax.Array | None = None

    @property
    def n_pad(self) -> int:
        return self.packed.shape[1]

    @property
    def k_pad(self) -> int:
        return 2 * self.packed.shape[0]

    def __call__(self, x: jax.Array, **kw) -> jax.Array:
        return apply_linear(self, x, **kw)


def quantize_linear(
    w: np.ndarray,
    bias: np.ndarray | None = None,
    *,
    blocksize: int = 64,
    quant_type: str = "fp4",
) -> QuantLinear:
    """Quantize a weight matrix (n_out, k_in) into a QuantLinear.

    In-process equivalent of the reference's swap path
    (swap_linear_with_bnb_linear + TorchFP4Linear.from_linear,
    __init__.py:695-747).  ``quant_type``: "fp4" or "nf4".
    """
    w = np.asarray(w, dtype=np.float32)
    n_out, k_in = w.shape
    code = fmt.FP4_CODE if quant_type == "fp4" else fmt.NF4_CODE
    # pad K to the kernel quantum (Mosaic block-shape alignment, see
    # ops/kernels.K_QUANTUM), N to lane granularity
    k_pad = _round_up(k_in, max(K.K_QUANTUM, 2 * blocksize))
    n_pad = _round_up(n_out, 128)
    if (k_pad, n_pad) != (k_in, n_out):
        wp = np.zeros((n_pad, k_pad), dtype=np.float32)
        wp[:n_out, :k_in] = w
    else:
        wp = w
    packed, absmax = fmt.pack_tpu(wp, blocksize=blocksize, code=code)
    return QuantLinear(
        packed=jnp.asarray(packed),
        absmax=jnp.asarray(absmax),
        bias=None if bias is None else jnp.asarray(bias),
        n_out=n_out,
        k_in=k_in,
        blocksize=blocksize,
        codebook=None if quant_type == "fp4" else jnp.asarray(code),
    )


def apply_linear(q: QuantLinear, x: jax.Array, *, block_m: int = 256, interpret: bool | None = None) -> jax.Array:
    """Forward pass. x: (..., k_in) -> (..., n_out).

    Trace-time dispatch (replacing reference QuantData.forward runtime policy,
    __init__.py:560-618): one total row -> GEMV fast path, else fused GEMM.
    """
    *lead, k = x.shape
    assert k == q.k_in, (x.shape, q.k_in)
    m = int(np.prod(lead)) if lead else 1
    if m == 0:
        # zero-element early-out (reference QuantData.forward, __init__.py:580-589)
        return jnp.zeros((*lead, q.n_out), dtype=x.dtype)
    x2 = x.reshape(m, k)
    if k != q.k_pad:
        x2 = jnp.pad(x2, ((0, 0), (0, q.k_pad - k)))
    bias = None
    if q.bias is not None:
        bias = q.bias
        if q.n_pad != q.n_out:
            bias = jnp.pad(bias, (0, q.n_pad - q.n_out))
    if m == 1:
        out = K.gemv_fp4(
            x2, q.packed, q.absmax, bias, q.codebook, blocksize=q.blocksize, interpret=interpret
        )
    else:
        out = K.matmul_fp4(
            x2,
            q.packed,
            q.absmax,
            bias,
            q.codebook,
            blocksize=q.blocksize,
            block_m=block_m,
            interpret=interpret,
        )
    if q.n_pad != q.n_out:
        out = out[:, : q.n_out]
    return out.reshape(*lead, q.n_out)


def dequantize_weight(q: QuantLinear, out_dtype=jnp.bfloat16, interpret: bool | None = None) -> jax.Array:
    """Materialize W (n_out, k_in) — reference dequantize_fp4 parity
    (__init__.py:88-123); used for lm_head-style fallbacks and tests."""
    wt = K.dequantize_tpu(
        q.packed,
        q.absmax,
        q.codebook,
        blocksize=q.blocksize,
        out_dtype=out_dtype,
        interpret=interpret,
    )
    return wt[: q.k_in, : q.n_out].T
