"""QuantLinear: the TPU-native counterpart of the reference's
``TorchFP4Linear`` + ``QuantData`` (torch_bnb_fp4/__init__.py:340-714).

Design departures (SURVEY.md §7 "Design stance"):
  * No nn.Module surgery or runtime dtype latching — a ``QuantLinear`` is an
    immutable pytree of device arrays produced offline (or by
    :func:`quantize_linear` in-process), applied functionally.
  * The reference's runtime dispatch policy (QuantData.forward,
    __init__.py:560-618: GEMV when exactly one row, else dequant+GEMM) becomes
    trace-time shape specialization: under ``jit`` the input shape is static,
    so dispatch costs nothing and both paths share one fused kernel family.
  * Padding: kernels want K % 1024 == 0 (or a small aligned TP shard) and
    N % 128 == 0.  The pack step zero-pads N (code 0 dequantizes to
    absmax*0 = 0) and the apply step slices the result; K padding pads x with
    zeros.
  * Sharding-native state: absmax is stored as its hi/lo nibble-plane halves
    (two arrays) and the K axis may be pre-sliced into ``k_shards``
    self-contained packings (ops/format.pack_tpu_sharded) so both
    column-parallel (shard dim 1) and row-parallel (shard dim 0) tensor
    parallelism are plain contiguous NamedShardings over every leaf.
"""

from __future__ import annotations

import dataclasses

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
    the (possibly K-sharded) split-K TPU layout of W (n_out, k_in) — see
    ops/format.pack_tpu_sharded.  Equivalent state to reference QuantData
    (__init__.py:345-401): packed bytes, absmax, shape, bias, codebook.
    """

    packed: jax.Array  # uint8 (k_pad // 2, n_pad)
    # layout "pairk": absmax_hi holds the (k_pad//blocksize, n_pad) f32 scale
    # (= absmax/192) and absmax_lo is None.  layout "splitk": hi/lo nibble-
    # plane scales, each (k_pad // (2*blocksize), n_pad) f32.
    absmax_hi: jax.Array
    absmax_lo: jax.Array | None
    bias: jax.Array | None  # (n_out,) or None
    n_out: int = dataclasses.field(metadata=dict(static=True))
    k_in: int = dataclasses.field(metadata=dict(static=True))
    blocksize: int = dataclasses.field(default=64, metadata=dict(static=True))
    # "pairk" (FP4 hot path, shards contiguously in both dims) or "splitk"
    layout: str = dataclasses.field(default="pairk", metadata=dict(static=True))
    # number of self-contained K-slices in a splitk packing (row-parallel TP)
    k_shards: int = dataclasses.field(default=1, metadata=dict(static=True))
    # pairk codebook variant (ops/format.PAIRK_MAGS192): "exact" = bit-exact
    # bnb FP4 (16-op decode), "zramp"/"ramp" = pack-time remaps with 12/7-op
    # decode (slightly MORE accurate for Gaussian weights); "lut" = arbitrary
    # codebook via bit-pattern gathers (NF4) with ``codebook`` set.  splitk
    # ignores it.
    variant: str = dataclasses.field(default="exact", metadata=dict(static=True))
    # None -> exact arithmetic FP4 decode; else a (16,) table (e.g. NF4)
    codebook: jax.Array | None = None
    # optional int8 PREFILL SHADOW (attach_int8_shadow): a pre-materialized
    # int8 requantization of the weights (+1 byte/weight HBM) that lets
    # M >= a8_min_m GEMMs skip the in-kernel decode+requant pass entirely —
    # the serialized-VPU floor of the fused w4a8 path at M=256-512
    # (PERF_NOTES round 5).  w8 (k_pad, n_pad) int8; w8_scale
    # (k_pad // w8_block_k, n_pad) f32 per-K-tile column scales.
    w8: jax.Array | None = None
    w8_scale: jax.Array | None = None
    w8_block_k: int = dataclasses.field(default=1024, metadata=dict(static=True))

    @property
    def n_pad(self) -> int:
        # trailing axes so a STACKED linear (leading expert axis over every
        # leaf, models/transformer.stack_linears) reports per-expert shapes
        return self.packed.shape[-1]

    @property
    def k_pad(self) -> int:
        return 2 * self.packed.shape[-2]

    def __call__(self, x: jax.Array, **kw) -> jax.Array:
        return apply_linear(self, x, **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseLinear:
    """Unquantized linear with the same calling convention as QuantLinear.

    Exists so the bf16 baseline (the denominator of the north-star
    ``FP4 tokens/s / bf16 tokens/s`` ratio) runs through the exact same model
    code, and so unquantized layers (e.g. an ignore-listed lm_head, reference
    __init__.py:788) slot into the same pytrees."""

    w: jax.Array  # (k_in, n_out) — stored pre-transposed for x @ w
    bias: jax.Array | None
    n_out: int = dataclasses.field(metadata=dict(static=True))
    k_in: int = dataclasses.field(metadata=dict(static=True))

    def __call__(self, x: jax.Array, out_dtype=None, **_kw) -> jax.Array:
        y = jnp.dot(x, self.w, preferred_element_type=jnp.float32)
        if self.bias is not None:
            y = y + self.bias.astype(jnp.float32)
        return y.astype(out_dtype if out_dtype is not None else x.dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LoRALinear:
    """A low-rank adapter riding a (usually quantized) base linear:
    ``y = base(x) + scale * (x @ a) @ b`` — QLoRA-style serving, the flagship
    use of bnb 4-bit bases (the reference ecosystem's raison d'être; the
    reference library itself stops at the plain linear).  The base stays
    packed FP4 — adapters are hot-attachable without touching base bytes —
    and the delta is two skinny MXU matmuls (rank r is 8-64; their FLOPs and
    HBM traffic are ~r/k_in of the base's, <2% at practical ranks).

    Under TP: column-parallel targets replicate ``a`` and shard ``b``'s
    output dim; row-parallel targets shard ``a``'s INPUT dim (each device's
    x-shard multiplies its A rows, so the delta partial-sums through the SAME
    psum as the base partial) and replicate ``b`` (parallel/tp.py).
    """

    base: Any  # QuantLinear | DenseLinear
    a: jax.Array  # (k_in, r)
    b: jax.Array  # (r, n_out)
    scale: float = dataclasses.field(metadata=dict(static=True))  # alpha / r

    @property
    def n_out(self) -> int:
        return self.base.n_out

    @property
    def k_in(self) -> int:
        return self.base.k_in

    @property
    def bias(self):
        return self.base.bias

    @property
    def rank(self) -> int:
        return self.a.shape[-1]

    def __call__(self, x: jax.Array, out_dtype=None, **kw) -> jax.Array:
        y = self.base(x, out_dtype=jnp.float32, **kw)
        # delta in the activation dtype on the MXU, accumulated in f32
        d = jnp.dot(
            jnp.dot(x, self.a.astype(x.dtype)), self.b.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        y = y + jnp.float32(self.scale) * d
        return y.astype(out_dtype if out_dtype is not None else x.dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultiLoRALinear:
    """L stacked low-rank adapters over ONE shared (usually packed-FP4) base —
    multi-tenant QLoRA serving: every request picks its adapter per batch row
    (S-LoRA-style), so finetunes of the same base model serve from a single
    copy of the 4-bit weights.  ``y[i] = base(x)[i] + scale[idx[i]] *
    (x[i] @ a[idx[i]]) @ b[idx[i]]``.

    Stacks are rank-padded to the widest adapter (zero-padded columns add
    exact zeros to the delta) and SLOT 0 IS RESERVED as the zero adapter
    ("no adapter": a/b/scale all zero), so requests without an adapter ride
    the same program.  The per-row gather moves only (k+n)·r·2 bytes per row
    — r/k_in of the base's traffic, <2% at practical ranks, and independent
    of how many adapters are resident.

    Under TP the stacks shard like :class:`LoRALinear` with the adapter axis
    replicated: column-parallel targets replicate ``a`` / shard ``b``'s
    output dim; row-parallel targets shard ``a``'s input dim (the delta
    partial-sums through the SAME psum as the base partial) and replicate
    ``b`` (parallel/tp.py).

    Calls REQUIRE ``adapter_idx`` ((B,) i32, threaded via
    ``forward(adapter_idx=...)``) — a missing index fails loudly instead of
    silently serving the base model.
    """

    base: Any  # QuantLinear | DenseLinear
    a: jax.Array  # (L, k_in, r_max)
    b: jax.Array  # (L, r_max, n_out)
    scale: jax.Array  # (L,) f32: alpha_l / r_l (0 for the reserved slot 0)

    @property
    def n_out(self) -> int:
        return self.base.n_out

    @property
    def k_in(self) -> int:
        return self.base.k_in

    @property
    def bias(self):
        return self.base.bias

    @property
    def n_adapters(self) -> int:
        return self.a.shape[0]

    @property
    def rank(self) -> int:
        return self.a.shape[-1]

    def __call__(self, x: jax.Array, out_dtype=None, adapter_idx=None, **kw) -> jax.Array:
        if adapter_idx is None:
            raise ValueError(
                "MultiLoRALinear requires adapter_idx ((B,) i32 per batch row) "
                "— thread it through forward(adapter_idx=...)"
            )
        y = self.base(x, out_dtype=jnp.float32, **kw)
        idx = jnp.asarray(adapter_idx, jnp.int32)
        a = jnp.take(self.a, idx, axis=0).astype(x.dtype)  # (B, k, r)
        bm = jnp.take(self.b, idx, axis=0).astype(x.dtype)  # (B, r, n)
        h = jnp.einsum("b...k,bkr->b...r", x, a)
        d = jnp.einsum("b...r,brn->b...n", h, bm, preferred_element_type=jnp.float32)
        s = jnp.take(self.scale, idx, axis=0).astype(jnp.float32)  # (B,)
        y = y + s.reshape(s.shape + (1,) * (y.ndim - 1)) * d
        return y.astype(out_dtype if out_dtype is not None else x.dtype)


def multi_lora_linear(base, adapters, *, dtype=jnp.bfloat16) -> MultiLoRALinear:
    """Stack PEFT-convention adapters over ``base``.  ``adapters``: list of
    (lora_A (r, k_in), lora_B (n_out, r), alpha) — entry i lands in slot i+1
    (slot 0 is the reserved zero adapter); ``None`` entries become zero
    adapters too (this adapter does not target this module).  Ranks may
    differ; stacks pad to the widest."""
    rs = [0 if ab is None else np.asarray(ab[0], np.float32).shape[0] for ab in adapters]
    r_max = max(1, max(rs, default=0))
    n_l = len(adapters) + 1
    a = np.zeros((n_l, base.k_in, r_max), np.float32)
    b = np.zeros((n_l, r_max, base.n_out), np.float32)
    scale = np.zeros((n_l,), np.float32)
    for i, ab in enumerate(adapters):
        if ab is None:
            continue
        ai, bi, alpha = ab
        ai = np.asarray(ai, np.float32)
        bi = np.asarray(bi, np.float32)
        r = ai.shape[0]
        if ai.shape != (r, base.k_in) or bi.shape != (base.n_out, r):
            raise ValueError(
                f"adapter {i} shapes lora_A {ai.shape} / lora_B {bi.shape} do "
                f"not match base {base.n_out}x{base.k_in}"
            )
        a[i + 1, :, :r] = ai.T
        b[i + 1, :r, :] = bi.T
        scale[i + 1] = float(alpha) / r
    return MultiLoRALinear(
        base=base, a=jnp.asarray(a, dtype), b=jnp.asarray(b, dtype),
        scale=jnp.asarray(scale),
    )


def lora_linear(base, a: np.ndarray, b: np.ndarray, *, alpha: float, dtype=jnp.bfloat16) -> LoRALinear:
    """Wrap ``base`` with a PEFT-convention adapter: ``a`` is lora_A (r, k_in)
    and ``b`` is lora_B (n_out, r) in torch (out, in) orientation; scaling is
    alpha / r."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    r = a.shape[0]
    if a.shape != (r, base.k_in) or b.shape != (base.n_out, r):
        raise ValueError(
            f"adapter shapes lora_A {a.shape} / lora_B {b.shape} do not match "
            f"base {base.n_out}x{base.k_in}"
        )
    return LoRALinear(
        base=base,
        a=jnp.asarray(a.T, dtype),
        b=jnp.asarray(b.T, dtype),
        scale=float(alpha) / r,
    )


def dense_linear(w: np.ndarray, bias: np.ndarray | None = None, dtype=jnp.bfloat16) -> DenseLinear:
    """Build a DenseLinear from a torch-convention (n_out, k_in) weight."""
    w = np.asarray(w, np.float32)
    n_out, k_in = w.shape
    return DenseLinear(
        w=jnp.asarray(w.T, dtype),
        bias=None if bias is None else jnp.asarray(bias, dtype),
        n_out=n_out,
        k_in=k_in,
    )


def quantize_linear(
    w: np.ndarray,
    bias: np.ndarray | None = None,
    *,
    blocksize: int = 64,
    quant_type: str = "fp4",
    layout: str | None = None,
    k_shards: int = 1,
    variant: str = "ramp",
    scale_dtype=None,
) -> QuantLinear:
    """Quantize a weight matrix (n_out, k_in) into a QuantLinear.

    In-process equivalent of the reference's swap path
    (swap_linear_with_bnb_linear + TorchFP4Linear.from_linear,
    __init__.py:695-747).  ``quant_type``: "fp4" or "nf4".  ``layout``:
    defaults to "pairk" (the fast path; shards contiguously in both dims) —
    nf4 rides it too via the "lut" decode (codebook bit-pattern gathers;
    variant is forced to "lut").  ``k_shards``: splitk-only
    row-parallel pre-slicing.  ``variant``: pairk codebook for FRESH
    quantization — defaults to "ramp" (7-op decode, ~2x faster serving than
    "exact", slightly more accurate; see ops/format.PAIRK_MAGS192).  Use
    "exact" for strict bnb-FP4 code parity; bnb-imported state is always
    "exact" (convert/bnb.py).  ``scale_dtype`` (pairk only): None = auto —
    bfloat16 for the remap variants (halves the scale bytes every decode
    kernel streams, ~5% of step DMA; codes are re-quantized against the
    rounded scale), float32 for "exact" (strict parity).  Ignored for nf4.
    """
    w = np.asarray(w, dtype=np.float32)
    if w.ndim != 2:
        raise ValueError(f"quantize_linear expects a 2-D (n_out, k_in) weight, got shape {w.shape}")
    n_out, k_in = w.shape
    if quant_type not in ("fp4", "nf4"):
        raise ValueError(f"quant_type must be 'fp4' or 'nf4', got {quant_type!r}")
    if layout is None:
        # nf4 now ALSO defaults to pairk: the "lut" decode gathers arbitrary
        # codebook bit-patterns at near-FP4 speed (round-2 served NF4 through
        # the slow splitk gather kernel; VERDICT r2 missing #4)
        layout = "pairk" if k_shards == 1 else "splitk"
    if layout not in ("pairk", "splitk"):
        raise ValueError(f"layout must be 'pairk' or 'splitk', got {layout!r}")
    if layout == "pairk":
        if k_shards != 1:
            raise ValueError("pairk shards contiguously in both dims; k_shards applies to splitk only")
        if quant_type == "nf4":
            variant = "lut"
        elif variant not in fmt.PAIRK_VARIANTS:
            raise ValueError(f"variant must be one of {fmt.PAIRK_VARIANTS}, got {variant!r}")
    code = fmt.FP4_CODE if quant_type == "fp4" else fmt.NF4_CODE
    # pad K per shard to the kernel quantum when unsharded; sharded layers are
    # required to be pre-aligned (real model dims are) so shards stay equal
    if layout == "pairk":
        k_pad = _round_up(k_in, 8 * blocksize)
    elif k_shards == 1:
        k_pad = _round_up(k_in, max(K.K_QUANTUM, 2 * blocksize))
    else:
        k_pad = _round_up(k_in, k_shards * 2 * blocksize)
    n_pad = _round_up(n_out, 128)
    if (k_pad, n_pad) != (k_in, n_out):
        wp = np.zeros((n_pad, k_pad), dtype=np.float32)
        wp[:n_out, :k_in] = w
    else:
        wp = w
    if layout == "pairk" and variant == "lut":
        packed, scale = fmt.pack_tpu_pairk_lut(wp, code, blocksize=blocksize)
        absmax_hi, absmax_lo = scale, None
    elif layout == "pairk":
        if scale_dtype is None:
            # f32 by default: bf16 scales measured FLAT-to-slightly-worse on
            # v5e (the GEMV kernels sit at the compute/DMA balance point, so
            # halved scale bytes are offset by the 16-row window selects —
            # benchmarks/scale_dtype_ab.py).  bf16 remains available for
            # checkpoint compactness / future bandwidth-richer chips.
            scale_dtype = np.float32
        packed, scale = fmt.pack_tpu_pairk(
            wp, blocksize=blocksize, variant=variant, scale_dtype=scale_dtype
        )
        absmax_hi, absmax_lo = scale, None
    else:
        packed, absmax_hi, absmax_lo = fmt.pack_tpu_sharded(
            wp, blocksize=blocksize, code=code, k_shards=k_shards
        )
        absmax_lo = jnp.asarray(absmax_lo)
    return QuantLinear(
        packed=jnp.asarray(packed),
        absmax_hi=jnp.asarray(absmax_hi),
        absmax_lo=absmax_lo,
        bias=None if bias is None else jnp.asarray(bias),
        n_out=n_out,
        k_in=k_in,
        blocksize=blocksize,
        layout=layout,
        k_shards=k_shards,
        variant=variant if layout == "pairk" else "exact",
        codebook=None if quant_type == "fp4" else jnp.asarray(code),
    )


def local_view(q: QuantLinear, *, n_parts: int = 1, k_parts: int = 1) -> QuantLinear:
    """Static-metadata view of one TP shard of ``q``.

    Inside ``shard_map`` the array leaves are already local; this rewrites the
    static shape fields to match.  ``n_parts``: column-parallel width (shards
    dim 1 of every leaf); ``k_parts``: row-parallel width (shards dim 0; the
    local packing is then ``k_shards // k_parts`` self-contained slices).
    """
    assert q.n_out % n_parts == 0, (q.n_out, n_parts)
    assert q.k_in % k_parts == 0, (q.k_in, k_parts)
    if isinstance(q, (LoRALinear, MultiLoRALinear)):
        # a/b leaves are already local inside shard_map; only the base's
        # static metadata needs rewriting
        return dataclasses.replace(q, base=local_view(q.base, n_parts=n_parts, k_parts=k_parts))
    if isinstance(q, DenseLinear):
        return dataclasses.replace(q, n_out=q.n_out // n_parts, k_in=q.k_in // k_parts)
    if q.layout == "pairk":
        # pairk slices contiguously: only the static K changes
        assert (q.k_in // k_parts) % (2 * q.blocksize) == 0
        return dataclasses.replace(q, n_out=q.n_out // n_parts, k_in=q.k_in // k_parts)
    assert q.k_shards % k_parts == 0, (q.k_shards, k_parts)
    return dataclasses.replace(
        q,
        n_out=q.n_out // n_parts,
        k_in=q.k_in // k_parts,
        k_shards=q.k_shards // k_parts,
    )


def _absmax(q: QuantLinear):
    return (q.absmax_hi, q.absmax_lo)


def _shard_reorder_x(x2: jax.Array, k_shards: int) -> jax.Array:
    """Reorder x columns so a k_sharded packing can run as ONE kernel call.

    Shard d's packed rows expect hi = x cols [d*K/D, d*K/D + K/2D) and
    lo = the next K/2D cols; the kernel splits x at K/2 globally.  A single
    (M, D, 2, K/2D) -> (M, 2, D, K/2D) transpose aligns them.
    """
    m, k = x2.shape
    kp_loc = k // (2 * k_shards)
    return (
        x2.reshape(m, k_shards, 2, kp_loc).transpose(0, 2, 1, 3).reshape(m, k)
    )


def apply_linear(q: QuantLinear, x: jax.Array, *, block_m: int | None = None, out_dtype=None, interpret: bool | None = None, adapter_idx=None) -> jax.Array:
    """Forward pass. x: (..., k_in) -> (..., n_out).

    Trace-time dispatch (replacing reference QuantData.forward runtime policy,
    __init__.py:560-618): one total row -> GEMV fast path, else fused GEMM.

    ``adapter_idx`` is accepted-and-ignored: a model serving per-request LoRA
    adapters threads it to EVERY layer linear, and only the
    :class:`MultiLoRALinear`-wrapped targets consume it.
    """
    del adapter_idx
    *lead, k = x.shape
    if k != q.k_in:
        raise ValueError(
            f"input feature dim {k} does not match layer k_in={q.k_in} "
            f"(x.shape={x.shape}, layer {q.n_out}x{q.k_in})"
        )
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
    if q.layout == "pairk":
        cb = q.codebook if q.variant == "lut" else None
        if m == 1:
            out = K.gemv_fp4_pk(
                x2, q.packed, q.absmax_hi, bias, cb, blocksize=q.blocksize,
                out_dtype=out_dtype, interpret=interpret, variant=q.variant,
            )
        elif (
            q.w8 is not None
            and m >= K.chip_defaults()["a8_min_m"]
            and x2.dtype != jnp.float32
        ):
            # int8 prefill shadow: pure int8 GEMM, no in-kernel weight pass
            # (f32 activations keep the precision-first fused path)
            out = K.matmul_w8(
                x2, q.w8, q.w8_scale, bias, block_k=q.w8_block_k,
                block_m=block_m, out_dtype=out_dtype, interpret=interpret,
            )
        else:
            out = K.matmul_fp4_pk(
                x2, q.packed, q.absmax_hi, bias, cb, blocksize=q.blocksize,
                block_m=block_m, out_dtype=out_dtype, interpret=interpret,
                variant=q.variant,
            )
    else:
        if q.k_shards > 1:
            x2 = _shard_reorder_x(x2, q.k_shards)
        if m == 1:
            out = K.gemv_fp4(
                x2, q.packed, _absmax(q), bias, q.codebook, blocksize=q.blocksize,
                out_dtype=out_dtype, interpret=interpret
            )
        else:
            out = K.matmul_fp4(
                x2,
                q.packed,
                _absmax(q),
                bias,
                q.codebook,
                blocksize=q.blocksize,
                block_m=256 if block_m is None else block_m,
                out_dtype=out_dtype,
                interpret=interpret,
            )
    if q.n_pad != q.n_out:
        out = out[:, : q.n_out]
    return out.reshape(*lead, q.n_out)


def apply_expert_linear(
    sq: QuantLinear,
    e,
    x: jax.Array,
    *,
    block_m: int | None = None,
    out_dtype=None,
    interpret: bool | None = None,
) -> jax.Array:
    """Forward through expert ``e`` of a STACKED pairk QuantLinear (leading
    expert axis on every leaf, models/transformer.stack_linears) WITHOUT
    materializing that expert's weights: the index rides scalar prefetch into
    the kernel's BlockSpec index maps, so only the selected expert's packed
    tiles are DMA'd (a ``dynamic_index`` + apply_linear would first copy the
    whole expert — ~42 MB for a Mixtral expert — through HBM, since XLA can't
    fuse a slice into a Pallas operand).  ``e`` may be traced (decode
    dispatch) or a python int (static all-experts loop)."""
    if sq.layout != "pairk":
        raise ValueError("apply_expert_linear requires the pairk layout")
    if sq.packed.ndim != 3:
        raise ValueError(
            f"apply_expert_linear needs a stacked (E, K/2, N) packing, got {sq.packed.shape}"
        )
    *lead, k = x.shape
    if k != sq.k_in:
        raise ValueError(
            f"input feature dim {k} does not match layer k_in={sq.k_in} "
            f"(x.shape={x.shape}, layer {sq.n_out}x{sq.k_in})"
        )
    m = int(np.prod(lead)) if lead else 1
    if m == 0:
        return jnp.zeros((*lead, sq.n_out), dtype=x.dtype)
    x2 = x.reshape(m, k)
    if k != sq.k_pad:
        x2 = jnp.pad(x2, ((0, 0), (0, sq.k_pad - k)))
    bias = None
    if sq.bias is not None:  # (E, n): the per-expert row is tiny — slice it
        bias = jax.lax.dynamic_index_in_dim(sq.bias, e, 0, keepdims=False)
        if sq.n_pad != sq.n_out:
            bias = jnp.pad(bias, (0, sq.n_pad - sq.n_out))
    cb = None
    if sq.variant == "lut":
        cb = sq.codebook[0] if sq.codebook.ndim == 2 else sq.codebook
    kw = dict(block_m=8, block_n=8192) if m == 1 else dict(block_m=block_m)
    out = K.matmul_fp4_pk(
        x2, sq.packed, sq.absmax_hi, bias, cb, blocksize=sq.blocksize,
        out_dtype=out_dtype, interpret=interpret, variant=sq.variant,
        expert=e, **kw,
    )
    if sq.n_pad != sq.n_out:
        out = out[:, : sq.n_out]
    return out.reshape(*lead, sq.n_out)


def fuse_linears(linears: list[QuantLinear], tp: int = 1) -> QuantLinear:
    """Fuse same-input pairk linears into ONE kernel call (column concat).

    One fused dequant-matmul replaces N launches over the same activations —
    the QKV and gate/up projections in a decoder block.  With ``tp`` > 1 the
    N columns are interleaved per shard ([q_d | k_d | v_d] for each device d)
    so a plain contiguous column sharding gives every device exactly its
    heads; the local output splits at the LOCAL sizes.
    """
    q0 = linears[0]
    assert all(l.layout == "pairk" for l in linears), "fusion is pairk-only"
    assert all(l.variant == q0.variant for l in linears), "fused linears must share a codebook variant"
    if q0.variant == "lut":
        assert all(
            np.array_equal(np.asarray(l.codebook), np.asarray(q0.codebook)) for l in linears
        ), "fused lut linears must share one codebook"
    assert all(l.k_in == q0.k_in and l.k_pad == q0.k_pad and l.blocksize == q0.blocksize for l in linears)
    assert all(l.n_out == l.n_pad for l in linears), "fused linears must be 128-aligned"
    assert all(l.n_out % tp == 0 for l in linears)

    def interleave(arrs, axis):
        # axis counts from the END so stacked linears (leading expert axis,
        # models/transformer.stack_linears) fuse with the same call
        if tp == 1:
            return jnp.concatenate(arrs, axis=axis)
        parts = []
        for d in range(tp):
            for a in arrs:
                n_loc = a.shape[axis] // tp
                parts.append(jax.lax.slice_in_dim(a, d * n_loc, (d + 1) * n_loc, axis=axis))
        return jnp.concatenate(parts, axis=axis)

    packed = interleave([l.packed for l in linears], -1)
    scale = interleave([l.absmax_hi for l in linears], -1)
    biases = [l.bias for l in linears]
    if any(b is not None for b in biases):
        bias = interleave(
            [b if b is not None else jnp.zeros((*l.packed.shape[:-2], l.n_out), jnp.float32)
             for b, l in zip(biases, linears)], -1
        )
    else:
        bias = None
    return QuantLinear(
        packed=packed,
        absmax_hi=scale,
        absmax_lo=None,
        bias=bias,
        n_out=sum(l.n_out for l in linears),
        k_in=q0.k_in,
        blocksize=q0.blocksize,
        layout="pairk",
        k_shards=1,
        variant=q0.variant,
        codebook=q0.codebook,  # lut decode needs it (asserted shared above)
    )


def dequantize_weight(q: QuantLinear, out_dtype=jnp.bfloat16, interpret: bool | None = None) -> jax.Array:
    """Materialize W (n_out, k_in) — reference dequantize_fp4 parity
    (__init__.py:88-123); used for lm_head-style fallbacks and tests."""
    if q.layout == "pairk":
        wt = K.dequantize_tpu_pk(
            q.packed, q.absmax_hi,
            q.codebook if q.variant == "lut" else None,
            blocksize=q.blocksize,
            out_dtype=out_dtype, interpret=interpret, variant=q.variant,
        )
        return wt[: q.k_in, : q.n_out].T
    D = q.k_shards
    kp = q.packed.shape[0]
    wt = K.dequantize_tpu(
        q.packed,
        _absmax(q),
        q.codebook,
        blocksize=q.blocksize,
        out_dtype=out_dtype,
        interpret=interpret,
    )
    if D > 1:
        # kernel output is [hi panels of all shards; lo panels of all shards]
        # in shard-major order within each half — undo to true Wt row order
        n = wt.shape[1]
        wt = wt.reshape(2, D, kp // D, n).transpose(1, 0, 2, 3).reshape(2 * kp, n)
    return wt[: q.k_in, : q.n_out].T


def attach_int8_shadow(q: QuantLinear, interpret: bool | None = None, tp: int = 1) -> QuantLinear:
    """Attach the int8 PREFILL SHADOW to a pairk QuantLinear: decode+requant
    the packed weights once (ops/kernels.make_int8_shadow) so M >= a8_min_m
    GEMMs run as pure int8 matmuls — the fused w4a8 path's per-call weight
    pass is the measured floor at M=256-512 (PERF_NOTES round 5).  Costs
    +1 byte/weight of HBM (2x the packed FP4; still 1/2 of bf16).  The FP4
    bytes stay the decode/GEMV path, so batch-1 latency is unchanged.

    ``tp``: intended model-axis width — the scale tile depth (w8_block_k) is
    chosen to divide the PER-SHARD K so row-parallel shards stay
    self-contained (parallel/tp.py shards w8/w8_scale contiguously)."""
    if q.layout != "pairk":
        raise ValueError("int8 shadow requires the pairk layout")
    if q.packed.ndim != 2:
        raise ValueError("stacked (expert) linears are not supported yet")
    k_loc = q.k_pad // tp
    if q.k_pad % tp or k_loc % 256:
        raise ValueError(f"k_pad={q.k_pad} does not shard into 256-multiples over tp={tp}")
    bk = next(b for b in (1024, 512, 256) if k_loc % b == 0)
    cb = q.codebook if q.variant == "lut" else None
    w8, g = K.make_int8_shadow(
        q.packed, q.absmax_hi, cb, blocksize=q.blocksize, variant=q.variant,
        block_k=bk, interpret=interpret,
    )
    return dataclasses.replace(q, w8=w8, w8_scale=g, w8_block_k=bk)


def attach_prefill_shadow(params, interpret: bool | None = None, tp: int = 1):
    """Attach int8 prefill shadows to every eligible QuantLinear in a model
    pytree (ModelParams or anything containing QuantLinears).  Stacked
    expert linears (MoE) are left untouched — deliberately: a Mixtral-8x7B
    expert stack's shadow would cost ~47 GB (+1 byte x 46B expert weights),
    defeating the 4-bit deployment; dense-family models pay 2x the packed
    FP4, still half of bf16.  Pass the model-axis width as ``tp`` when the
    params will be sharded (attach BEFORE shard_params)."""

    def f(x):
        if isinstance(x, QuantLinear) and x.layout == "pairk" and x.packed.ndim == 2:
            return attach_int8_shadow(x, interpret=interpret, tp=tp)
        return x

    return jax.tree.map(f, params, is_leaf=lambda x: isinstance(x, QuantLinear))
