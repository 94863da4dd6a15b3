"""Reference-API compatibility layer: the public surface of
aredden/torch-bnb-fp4 (torch_bnb_fp4/__init__.py), name for name, on TPU.

A user of the reference imports seven functional wrappers, two classes and a
model-surgery entry point.  This module provides all of them with the same
names, argument orders and dispatch semantics, so migration is mechanical:

    reference (CUDA/torch)                     here (TPU/JAX)
    ------------------------------------------ -----------------------------
    from torch_bnb_fp4 import X                from torch_bnb_fp4_tpu.compat import X

Arrays may be numpy, JAX, or torch (CPU) tensors; torch in -> torch out,
everything else -> JAX arrays.  Differences from the reference, all
deliberate (docs/MIGRATING.md has the full table):

- ``dequantize_fp4_codebook_*`` HONOR the ``code`` argument (the reference
  validates but ignores it and always uses its compiled-in FP4 table,
  csrc/gemv_fp4_optimized.cu:266,274 / dequant_fp4_optimized.cu:218-248),
  so NF4 and arbitrary bnb codebooks work here.
- float16 activations compute in bfloat16 (pinned framework contract,
  tests/test_kernels.py::test_f16_computes_in_bf16); outputs are cast back
  to float16.
- ``allow_reduced_precision_linear`` is accepted but inert: the fused Pallas
  GEMM already runs at full speed without the reference's ~7x error tradeoff
  (torch_bnb_fp4/__init__.py:370-372), and at M>=512 the w4a8 int8-MXU path
  engages automatically.
- ``ScalarType.torch_dtype`` works (the reference's is dead code — it
  compares against a nonexistent ``ScalarType.BFloat16``,
  torch_bnb_fp4/__init__.py:75-84, SURVEY.md §2.4).
- ``recursively_replace_with_fp4_linear`` cannot mutate a module tree in an
  XLA world; it converts the model FUNCTIONALLY and returns ``(cfg, params)``
  for :func:`torch_bnb_fp4_tpu.models.generate` / the serving engine.

One-shot functional calls (``dequantize_fp4``, ``gemm_4bit_inference``)
decode via the flat-layout path each call — correct everywhere, but for hot
loops build a :class:`QuantData` / :class:`TorchFP4Linear` once: those pack
into the pair-K kernel layout at construction and run the production Pallas
fast paths.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .convert.bnb import dequantize_nested_absmax, from_bnb_state
from .models.linear import QuantLinear, apply_linear, quantize_linear
from .ops import format as fmt
from .ops.kernels import dequantize_fp4_flat

__all__ = [
    "ScalarType",
    "dequantize_fp4",
    "dequantize_fp4_qtype",
    "dequantize_fp4_codebook_invoke",
    "dequantize_fp4_codebook_invoke_qtype",
    "gemm_4bit_inference",
    "gemm_4bit_inference_qtype",
    "QuantData",
    "TorchFP4Linear",
    "recursively_replace_with_fp4_linear",
    "check_if_name_contained_in_list",
]


# --------------------------------------------------------------------------
# array bridging: numpy / jax / torch(CPU) in, same-kind out
# --------------------------------------------------------------------------

def _is_torch(a) -> bool:
    return type(a).__module__.split(".")[0] == "torch"


def _to_np(a) -> np.ndarray:
    if _is_torch(a):
        return a.detach().cpu().numpy()
    return np.asarray(a)


def _like(out: jax.Array, ref):
    """Return ``out`` as the same array kind as ``ref`` (torch -> torch)."""
    if _is_torch(ref):
        import torch

        o = np.asarray(out)
        if o.dtype.name == "bfloat16":  # numpy has no bf16: bit-cast bridge
            return torch.from_numpy(o.view(np.uint16).copy()).view(torch.bfloat16)
        return torch.from_numpy(o.copy())
    return out


class ScalarType(enum.Enum):
    """Activation-dtype enum, reference torch_bnb_fp4/__init__.py:22-84.

    The reference needs this to pick a C++ kernel instantiation; on TPU the
    jnp dtype dispatches at trace time, so this exists purely so reference
    call sites keep compiling."""

    bfloat16 = "bfloat16"
    float16 = "float16"
    float32 = "float32"

    @classmethod
    def from_torch_dtype(cls, dtype) -> "ScalarType":
        """Accepts a torch dtype, jnp/numpy dtype, or string."""
        name = str(dtype).replace("torch.", "")
        name = {"half": "float16", "float": "float32"}.get(name, name)
        if name not in cls._value2member_map_:
            try:
                name = np.dtype(dtype).name  # numpy / jnp dtype objects
            except Exception:
                pass
        if name not in cls._value2member_map_:
            raise ValueError(f"Unsupported dtype {dtype!r}")
        return cls(name)

    @classmethod
    def from_str(cls, dtype: str) -> "ScalarType":
        aliases = {"bf16": "bfloat16", "fp16": "float16", "half": "float16",
                   "fp32": "float32", "float": "float32"}
        name = aliases.get(dtype, dtype)
        if name not in cls._value2member_map_:
            raise ValueError(f"Unsupported dtype string {dtype!r}")
        return cls(name)

    @property
    def jnp_dtype(self):
        return {"bfloat16": jnp.bfloat16, "float16": jnp.float16,
                "float32": jnp.float32}[self.value]

    @property
    def torch_dtype(self):
        """Working counterpart of the reference's dead property
        (compares against nonexistent ``ScalarType.BFloat16``, SURVEY §2.4)."""
        import torch

        return {"bfloat16": torch.bfloat16, "float16": torch.float16,
                "float32": torch.float32}[self.value]


def _resolve_dtype(dtype) -> ScalarType:
    if isinstance(dtype, ScalarType):
        return dtype
    if isinstance(dtype, str):
        return ScalarType.from_str(dtype)
    return ScalarType.from_torch_dtype(dtype)


# --------------------------------------------------------------------------
# functional wrappers (reference __init__.py:88-337)
# --------------------------------------------------------------------------

def dequantize_fp4(qweight, absmax, blocksize: int, M: int, N: int,
                   dtype="float16"):
    """Blockwise FP4 dequantize, reference ``dequantize_fp4``
    (__init__.py:88-122 -> csrc/dequant_fp4_optimized.cu:89-123).

    ``qweight``: uint8 bytes in bnb's flat packing (two codes per byte, high
    nibble first); ``absmax``: one f32 scale per ``blocksize`` weights.
    Returns the (M, N) weight matrix in ``dtype``."""
    st = _resolve_dtype(dtype)
    out = dequantize_fp4_flat(
        jnp.asarray(_to_np(qweight)), jnp.asarray(_to_np(absmax), jnp.float32),
        (M, N), blocksize=blocksize, out_dtype=st.jnp_dtype,
    )
    return _like(out, qweight)


def dequantize_fp4_qtype(qweight, absmax, blocksize: int, M: int, N: int,
                         dtype: ScalarType = ScalarType.bfloat16):
    """Reference ``dequantize_fp4_qtype`` (__init__.py:299-337)."""
    return dequantize_fp4(qweight, absmax, blocksize, M, N, dtype)


def dequantize_fp4_codebook_invoke(qweight, absmax, code, blocksize: int,
                                   M: int, N: int, numel: int, qtype):
    """Reference ``dequantize_fp4_codebook_invoke`` (__init__.py:172-218).

    Unlike the reference (which ignores ``code`` and always decodes with its
    compiled-in FP4 table), the passed codebook is used — NF4 states
    dequantize correctly."""
    if numel != M * N:
        raise ValueError(f"numel={numel} does not match M*N={M * N}")
    st = _resolve_dtype(qtype)
    out = dequantize_fp4_flat(
        jnp.asarray(_to_np(qweight)), jnp.asarray(_to_np(absmax), jnp.float32),
        (M, N), blocksize=blocksize, out_dtype=st.jnp_dtype,
        codebook=jnp.asarray(_to_np(code), jnp.float32),
    )
    return _like(out, qweight)


def dequantize_fp4_codebook_invoke_qtype(qweight, absmax, code, blocksize: int,
                                         M: int, N: int, numel: int,
                                         qtype: ScalarType):
    """Reference ``dequantize_fp4_codebook_invoke_qtype`` (__init__.py:125-169)."""
    return dequantize_fp4_codebook_invoke(
        qweight, absmax, code, blocksize, M, N, numel, qtype)


def _gemm_4bit(A, B, absmax, code, blocksize, st: ScalarType, Bshape):
    if Bshape is None:
        raise ValueError("Bshape (out_features, in_features) is required")
    out_f, in_f = int(Bshape[0]), int(Bshape[1])
    a = jnp.asarray(_to_np(A))
    if a.shape[-1] != in_f:
        raise ValueError(f"A feature dim {a.shape[-1]} != Bshape[1]={in_f}")
    # one-shot path: decode the flat packing in-graph and contract; XLA fuses
    # the LUT gather into the matmul epilogue.  Hot loops: use QuantData.
    w = dequantize_fp4_flat(
        jnp.asarray(_to_np(B)), jnp.asarray(_to_np(absmax), jnp.float32),
        (out_f, in_f), blocksize=blocksize, out_dtype=jnp.float32,
        codebook=None if code is None else jnp.asarray(_to_np(code), jnp.float32),
    )
    compute = jnp.float32 if st is ScalarType.float32 else jnp.bfloat16
    y = a.reshape(-1, in_f).astype(compute) @ w.T.astype(compute)
    return _like(y.reshape(*a.shape[:-1], out_f).astype(st.jnp_dtype), A)


def gemm_4bit_inference(A, B, absmax, code, blocksize: int, dtype="float16",
                        Bshape=None):
    """Batch-1 fused dequant matvec, reference ``gemm_4bit_inference``
    (__init__.py:221-258 -> csrc/gemv_fp4_optimized.cu:60-157).

    ``A``: (1, K) or (1, 1, K) activations; ``B``: the packed weight bytes
    (any shape — only the data matters, matching the reference, which takes
    the transposed byte view); ``Bshape``: (out_features, in_features)."""
    return _gemm_4bit(A, B, absmax, code, blocksize, _resolve_dtype(dtype), Bshape)


def gemm_4bit_inference_qtype(A, B, absmax, code, blocksize: int,
                              dtype: ScalarType = ScalarType.bfloat16,
                              Bshape=None):
    """Reference ``gemm_4bit_inference_qtype`` (__init__.py:261-296)."""
    return _gemm_4bit(A, B, absmax, code, blocksize, _resolve_dtype(dtype), Bshape)


# --------------------------------------------------------------------------
# QuantData / TorchFP4Linear (reference __init__.py:340-714)
# --------------------------------------------------------------------------

def _state_absmax(state) -> np.ndarray:
    """f32 per-block absmax from a bnb QuantState (duck-typed), decoding
    double quantization (state.state2) that the reference rejects
    (README.md:221-224)."""
    state2 = getattr(state, "state2", None)
    if state2 is not None:
        return dequantize_nested_absmax(
            _to_np(state.absmax), _to_np(state2.absmax), _to_np(state2.code),
            float(state.offset), nested_blocksize=int(state2.blocksize),
        )
    return np.asarray(_to_np(state.absmax), np.float32)


class QuantData:
    """Quantized weight + forward dispatch, reference ``QuantData``
    (__init__.py:340-618).

    The reference re-dispatches per call at runtime (GEMV vs dequant-GEMM vs
    reduced-precision GEMM) and latches the dtype of the first input forever
    (``set_compute_type``, __init__.py:590-591 — a documented quirk, SURVEY
    §2.4).  Here the packing happens ONCE at construction (into the pair-K
    Pallas layout, exact code/absmax preservation) and dispatch is trace-time
    shape specialization in :func:`apply_linear`; dtypes may vary per call.

    ``state`` is a bnb ``QuantState`` or any object with ``absmax``,
    ``blocksize``, ``code``, ``shape`` (and optionally ``quant_type``,
    ``state2``/``offset`` for double quantization)."""

    def __init__(self, A, state, shape: Tuple[int, int], original_lin=None,
                 bias=None, use_codebook_dequant: bool = True,
                 allow_reduced_precision_linear: bool = False):
        del use_codebook_dequant  # tree == codebook (SURVEY §1); one decoder
        del allow_reduced_precision_linear  # inert: fused GEMM has no such tradeoff
        self.M, self.N = int(shape[0]), int(shape[1])
        self.blocksize = int(state.blocksize)
        self.numel = self.M * self.N
        if bias is None and original_lin is not None:
            bias = getattr(original_lin, "bias", None)
        self.original_lin = original_lin
        self._q: QuantLinear = from_bnb_state(
            _to_np(A).reshape(-1),
            _state_absmax(state),
            (self.M, self.N),
            blocksize=self.blocksize,
            quant_type=getattr(state, "quant_type", "fp4"),
            bias=None if bias is None else _to_np(bias),
        )

    @property
    def quant_linear(self) -> QuantLinear:
        """The underlying framework pytree (for jit/shard_map composition)."""
        return self._q

    def dequantize(self, dtype="bfloat16"):
        """Reference ``QuantData.dequantize`` — the (M, N) weight matrix."""
        from .models.linear import dequantize_weight

        st = _resolve_dtype(dtype)
        return dequantize_weight(self._q, out_dtype=st.jnp_dtype)

    def forward(self, A):
        """Reference ``QuantData.forward`` (__init__.py:560-618): zero-size
        early-out, one-total-row -> GEMV fast path, else fused GEMM — here
        resolved at trace time inside :func:`apply_linear`."""
        a = A if not _is_torch(A) else jnp.asarray(_to_np(A))
        if a.dtype == jnp.float16:
            # pinned contract: f16 computes in bf16; cast back at the edge
            out = apply_linear(self._q, a.astype(jnp.bfloat16)).astype(jnp.float16)
        else:
            out = apply_linear(self._q, a)
        return _like(out, A)

    __call__ = forward


class TorchFP4Linear:
    """Drop-in quantized linear, reference ``TorchFP4Linear``
    (__init__.py:621-714).

    Wraps a LIVE torch layer: a bnb ``Linear4bit``/``LinearFP4`` imports
    exactly (codes + absmax preserved, double-quant decoded); a plain
    ``torch.nn.Linear`` (or any object with ``.weight``/``.bias``) is
    quantized fresh — the step the reference delegates to bnb via
    ``swap_linear_with_bnb_linear`` + ``.to(device)`` (__init__.py:718-747),
    which is owned here (ops/format.py / convert/quantize.py)."""

    def __init__(self, lin, use_codebook_dequant: bool = True, name: str = ""):
        self.lin = [lin]  # reference keeps the original layer reachable
        self.name = name
        self.use_codebook_dequant = use_codebook_dequant
        w = getattr(lin, "weight", None)
        if w is None:
            raise ValueError("layer has no .weight to quantize")
        if getattr(w, "quant_state", None) is not None:  # bnb-quantized
            from .convert.bnb import from_bnb_torch_layer

            self._q = from_bnb_torch_layer(lin)
        else:
            bias = getattr(lin, "bias", None)
            self._q = quantize_linear(
                np.asarray(_to_np(w), np.float32),
                None if bias is None else np.asarray(_to_np(bias), np.float32),
                variant="exact",  # bit-exact bnb FP4 codes, reference parity
            )
        self.out_features, self.in_features = self._q.n_out, self._q.k_in
        self.quant_data = QuantDataView(self._q)

    @classmethod
    def from_linear(cls, linear, use_codebook_dequant: bool = False,
                    name: str = "") -> "TorchFP4Linear":
        """Reference ``TorchFP4Linear.from_linear`` (__init__.py:695-714)."""
        return cls(linear, use_codebook_dequant=use_codebook_dequant, name=name)

    @property
    def quant_linear(self) -> QuantLinear:
        return self._q

    def forward(self, x):
        a = x if not _is_torch(x) else jnp.asarray(_to_np(x))
        if a.dtype == jnp.float16:
            out = apply_linear(self._q, a.astype(jnp.bfloat16)).astype(jnp.float16)
        else:
            out = apply_linear(self._q, a)
        return _like(out, x)

    __call__ = forward

    def __repr__(self) -> str:
        return (f"TorchFP4Linear(in_features={self.in_features}, "
                f"out_features={self.out_features}, "
                f"bias={self._q.bias is not None})")


class QuantDataView:
    """Minimal ``.quant_data`` attribute surface (M/N/blocksize/forward) for
    code that reaches into ``TorchFP4Linear.quant_data`` like the reference's
    ``__repr__`` and user scripts do."""

    def __init__(self, q: QuantLinear):
        self._q = q
        self.M, self.N = q.n_out, q.k_in
        self.blocksize = q.blocksize
        self.numel = q.n_out * q.k_in

    def forward(self, A):
        out = apply_linear(self._q, A if not _is_torch(A) else jnp.asarray(_to_np(A)))
        return _like(out, A)

    __call__ = forward


# --------------------------------------------------------------------------
# model surgery (reference __init__.py:717-922)
# --------------------------------------------------------------------------

def check_if_name_contained_in_list(name: str, names_list) -> bool:
    """Reference ignore-list predicate (__init__.py:750-756): substring
    match of any entry against the module name."""
    return any(s in name for s in names_list)


def recursively_replace_with_fp4_linear(
    model,
    as_dtype=None,
    use_codebook_dequant: bool = True,
    ignore_layer_names=(),
    only_replace_bnb_layers: bool = False,
    quantize_lm_head: bool = False,
    debug: bool = False,
):
    """Convert a LIVE HF transformers causal-LM (torch, CPU) for TPU serving
    — the functional counterpart of the reference's in-place module surgery
    (__init__.py:781-922).

    The reference mutates the module tree and keeps serving through torch;
    under XLA there is no module tree to mutate, so this converts every
    linear (plain ``nn.Linear`` quantized fresh; bnb 4-bit layers imported
    exactly via their serialized state, including double-quant) and returns
    ``(cfg, params)`` for :func:`torch_bnb_fp4_tpu.models.generate`,
    :func:`~torch_bnb_fp4_tpu.models.forward`, or the serving engine::

        cfg, params = recursively_replace_with_fp4_linear(hf_model)
        tokens = generate(params, cfg, prompt_ids, max_new_tokens=64)

    ``ignore_layer_names``: substrings of layer names to keep unquantized
    (reference ``ignore_layer_names``); ``only_replace_bnb_layers`` asserts
    every non-ignored linear is already bnb-quantized (reference semantics:
    don't touch full-precision layers).  ``as_dtype``/``debug`` accepted for
    signature parity (activations are bf16 by framework contract).

    For disk-to-disk conversion at scale use the streaming CLI instead
    (``python -m torch_bnb_fp4_tpu.convert``) — it never holds the model in
    RAM."""
    del as_dtype, use_codebook_dequant, debug
    from .convert.hf import config_from_hf_dict, quantize_hf_weights

    if not hasattr(model, "config") or not hasattr(model, "state_dict"):
        raise ValueError(
            "expected a HuggingFace transformers model (needs .config and "
            ".state_dict()); for a single layer use TorchFP4Linear.from_linear"
        )
    hf = model.config.to_dict()
    tensors = {k: _to_np(v) for k, v in model.state_dict().items()}
    if only_replace_bnb_layers:
        from .convert.hf import _BNB_META

        missing = sorted(
            k[: -len(".weight")] for k in tensors
            if k.endswith("_proj.weight")
            and not check_if_name_contained_in_list(k, ignore_layer_names)
            and not any(f"{k[:-len('.weight')]}{_BNB_META}{qt}" in tensors
                        for qt in ("fp4", "nf4"))
        )
        if missing:
            raise ValueError(
                f"only_replace_bnb_layers=True but these linears are not "
                f"bnb-quantized: {missing[:4]}{'...' if len(missing) > 4 else ''}"
            )
    cfg = config_from_hf_dict(hf)
    params = quantize_hf_weights(
        cfg, tensors,
        quantize_lm_head=quantize_lm_head,
        ignore=tuple(ignore_layer_names),
    )
    return cfg, params


# idiomatic alias: the name says what actually happens on TPU
convert_torch_model = recursively_replace_with_fp4_linear
