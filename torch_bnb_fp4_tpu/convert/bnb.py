"""bitsandbytes interop: exact conversion of bnb-quantized state.

The reference consumes bnb ``QuantState`` directly (packed uint8 + absmax +
code, torch_bnb_fp4/__init__.py:377-390); this module converts that state
into our layouts EXACTLY — same codes, same absmax grid, no requantization —
so models already quantized with bitsandbytes (e.g. via HF
``BitsAndBytesConfig(load_in_4bit=True, bnb_4bit_quant_type="fp4")``) load
bit-for-bit.

bnb flat layout: codes packed two per byte high-nibble-first over the
row-major flat weight; one absmax per ``blocksize`` flat elements
(SURVEY.md §1 "The FP4 format").  Blocks must not straddle rows
(K % blocksize == 0 — true for every transformer geometry).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.linear import QuantLinear
from ..ops import format as fmt


def dequantize_nested_absmax(
    absmax_u8: np.ndarray,
    absmax2: np.ndarray,
    code2: np.ndarray,
    offset: float,
    nested_blocksize: int = 256,
) -> np.ndarray:
    """Decode bnb DOUBLE-QUANTIZED absmax to f32.

    bnb's double quantization (bnb_4bit_use_double_quant=True) stores the
    per-block absmax as uint8 codes into a 256-entry dynamic-quant codebook,
    blockwise-scaled by ``absmax2`` (one f32 per ``nested_blocksize`` codes)
    with a global mean ``offset``:  absmax = code2[u8] * absmax2[blk] + offset.
    The REFERENCE refuses such checkpoints (README.md:221-224 requires
    double_quant=False); decoding them here means this framework accepts the
    HF default BitsAndBytesConfig(bnb_4bit_use_double_quant=True).
    """
    u8 = np.asarray(absmax_u8, np.uint8).reshape(-1)
    code2 = np.asarray(code2, np.float32)
    absmax2 = np.asarray(absmax2, np.float32).reshape(-1)
    n = u8.size
    vals = code2[u8]
    blk = np.arange(n) // nested_blocksize
    return (vals * absmax2[blk] + np.float32(offset)).astype(np.float32)


def from_bnb_state(
    packed_flat: np.ndarray,
    absmax_flat: np.ndarray,
    shape: tuple[int, int],
    *,
    blocksize: int = 64,
    quant_type: str = "fp4",
    bias: np.ndarray | None = None,
    layout: str | None = None,
    device: bool = True,
) -> QuantLinear:
    """Build a QuantLinear from bnb flat state for a (n_out, k_in) weight.

    Exact: the 4-bit codes and the absmax grid are preserved; only the
    storage layout changes (pairk additionally folds absmax/192 into the
    scale, one f32 rounding — see ops/format.pack_tpu_pairk).

    ``device=False`` keeps the leaves as NUMPY arrays — for host-side tools
    (the streaming converter writes them straight to disk; a jnp round-trip
    there costs a device put + fetch per layer, which on a tunneled TPU host
    turns a seconds-long conversion into minutes).
    """
    n_out, k_in = shape
    if k_in % blocksize != 0:
        raise ValueError(
            f"K={k_in} not a multiple of blocksize={blocksize}: bnb's flat "
            "blocks straddle rows; requantize from full precision instead"
        )
    if layout is None:
        layout = "pairk"  # nf4 imports ride the pair-K LUT fast path
    codes = fmt.unpack_flat(np.asarray(packed_flat)).reshape(n_out, k_in)
    absmax = np.asarray(absmax_flat, np.float32).reshape(n_out, k_in // blocksize)

    # pad to kernel quanta (zero codes dequantize to 0; scale pad value moot)
    kq = 8 * blocksize if layout == "pairk" else max(1024, 2 * blocksize)
    k_pad = (k_in + kq - 1) // kq * kq
    n_pad = (n_out + 127) // 128 * 128
    if (k_pad, n_pad) != (k_in, n_out):
        cp = np.zeros((n_pad, k_pad), np.uint8)
        cp[:n_out, :k_in] = codes
        ap = np.ones((n_pad, k_pad // blocksize), np.float32)
        ap[:n_out, : k_in // blocksize] = absmax
        codes, absmax = cp, ap

    if layout == "pairk" and quant_type == "fp4":
        ct = fmt.RANK_REMAP[codes].T  # (K, N)
        packed = ((ct[1::2].astype(np.uint8) << 4) | ct[0::2]).astype(np.uint8)
        scale = (absmax.T / fmt.PAIRK_VALUE_SCALE).astype(np.float32)
        hi, lo = scale, None
    elif layout == "pairk":
        # nf4: bnb's table is sorted ascending, so the stored 4-bit codes
        # ARE ranks — pair them directly, scale = absmax (codebook max 1.0).
        # Decode gathers the bf16-rounded table (~2^-9 relative on the code
        # values; the 4-bit codes and absmax grid are preserved exactly).
        ct = codes.T  # (K, N)
        packed = ((ct[1::2].astype(np.uint8) << 4) | ct[0::2]).astype(np.uint8)
        hi, lo = absmax.T.astype(np.float32), None
    else:
        ct = codes.T  # (K, N)
        half = ct.shape[0] // 2
        packed = ((ct[:half].astype(np.uint8) << 4) | (ct[half:] & 0xF)).astype(np.uint8)
        at = absmax.T  # (K/bs, N)
        hi, lo = np.ascontiguousarray(at[: at.shape[0] // 2]), np.ascontiguousarray(at[at.shape[0] // 2 :])
    code = fmt.FP4_CODE if quant_type == "fp4" else fmt.NF4_CODE
    put = jnp.asarray if device else np.asarray
    return QuantLinear(
        packed=put(packed),
        absmax_hi=put(hi),
        absmax_lo=None if lo is None else put(lo),
        bias=None if bias is None else put(np.asarray(bias, np.float32)),
        n_out=n_out,
        k_in=k_in,
        blocksize=blocksize,
        layout=layout,
        k_shards=1,
        variant=("lut" if layout == "pairk" and quant_type == "nf4" else "exact"),
        codebook=None if quant_type == "fp4" else put(code),
    )


def from_bnb_torch_layer(linear, layout: str | None = None) -> QuantLinear:
    """Convert a live bnb ``Linear4bit``/``LinearFP4`` (torch) — the
    reference's TorchFP4Linear.from_linear input (__init__.py:695-714).
    Handles double-quantized states (quant_state.state2) the reference
    rejects."""
    w = linear.weight
    qs = getattr(w, "quant_state", None)
    if qs is None:
        raise ValueError("layer is not bnb-quantized (no quant_state)")
    packed = w.data.detach().cpu().numpy().reshape(-1)
    state2 = getattr(qs, "state2", None)
    if state2 is not None:  # double quantization: decode nested absmax
        absmax = dequantize_nested_absmax(
            qs.absmax.detach().cpu().numpy(),
            state2.absmax.detach().cpu().numpy(),
            state2.code.detach().cpu().numpy(),
            float(qs.offset),
            nested_blocksize=state2.blocksize,
        )
    else:
        absmax = np.asarray(qs.absmax.detach().cpu().numpy(), np.float32)
    shape = tuple(qs.shape)
    bias = None if linear.bias is None else linear.bias.detach().cpu().float().numpy()
    quant_type = getattr(qs, "quant_type", "fp4")
    return from_bnb_state(
        packed, absmax, shape, blocksize=qs.blocksize, quant_type=quant_type,
        bias=bias, layout=layout,
    )
