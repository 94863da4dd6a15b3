"""HF checkpoint -> packed FP4 checkpoint (offline, streaming, host-side).

Covers the reference's model-conversion capability (SURVEY.md §3.1:
recursively_replace_with_fp4_linear + bnb quantize-on-.to(device),
torch_bnb_fp4/__init__.py:781-922) as an offline tool: stream tensors from
the safetensors shards, quantize+pack+write one weight group at a time
(convert_hf_model holds at most a few groups of floats in RAM — verified by
tests/test_convert.py's peak-pending assertion), write the packed
checkpoint.  Norms/embeddings stay bf16; lm_head stays
unquantized by default (the reference's ignore-list default keeps lm_head
full precision, __init__.py:788).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np

from ..models.linear import DenseLinear, QuantLinear, dense_linear
from ..models.transformer import LayerParams, ModelConfig, ModelParams, MoEParams, stack_linears
from ..ops import format as fmt
from .checkpoint import save_checkpoint
from .quantize import quantize_pack_pairk, quantize_pack_pairk_lut, quantize_pack_sharded

_LINEAR_SUFFIXES = (
    "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
    "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
)


def config_from_hf(model_dir: str, **overrides) -> ModelConfig:
    """Build ModelConfig from an HF llama/mistral-family config.json."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return config_from_hf_dict(hf, **overrides)


def config_from_hf_dict(hf: dict, **overrides) -> ModelConfig:
    """Build ModelConfig from an HF config dict (config.json contents or
    ``model.config.to_dict()`` of a live transformers model)."""
    kw = dict(
        vocab_size=hf["vocab_size"],
        dim=hf["hidden_size"],
        n_layers=hf["num_hidden_layers"],
        n_heads=hf["num_attention_heads"],
        n_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        ffn_dim=hf["intermediate_size"],
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_eps=hf.get("rms_norm_eps", 1e-5),
        sliding_window=hf.get("sliding_window"),
        # Llama exposes attention_bias; Qwen2 always biases q/k/v.  Only
        # informational at runtime — the converter picks biases up from the
        # checkpoint's .bias tensors regardless.
        attn_bias=bool(hf.get("attention_bias", hf.get("model_type") == "qwen2")),
    )
    # Gemma family: decoupled head_dim, GeGLU, (1+w) norms, sqrt(dim) embed
    # scaling, always-tied lm_head (validated vs HF in tests/test_hf_oracle.py)
    act = hf.get("hidden_activation") or hf.get("hidden_act", "silu")
    if act in ("gelu", "gelu_pytorch_tanh", "gelu_new"):
        kw["hidden_act"] = "gelu_tanh"
    if hf.get("head_dim") is not None:
        kw["head_dim"] = hf["head_dim"]
    if hf.get("model_type", "").startswith("gemma"):
        kw["norm_offset"] = True
        kw["embed_scale"] = True
    # Qwen3 family: per-head q/k RMSNorm (HF Qwen3Attention q_norm/k_norm)
    if hf.get("model_type", "").startswith("qwen3"):
        kw["qk_norm"] = True
    if hf.get("model_type") == "gemma2":
        # Gemma-2: post-norms, logit softcaps, alternating sliding/global
        # attention, decoupled attention scale
        kw["post_norms"] = True
        kw["alt_sliding"] = hf.get("sliding_window") is not None
        if hf.get("attn_logit_softcapping") is not None:
            kw["attn_logit_softcap"] = float(hf["attn_logit_softcapping"])
        if hf.get("final_logit_softcapping") is not None:
            kw["final_logit_softcap"] = float(hf["final_logit_softcapping"])
        if hf.get("query_pre_attn_scalar") is not None:
            kw["query_pre_attn_scalar"] = float(hf["query_pre_attn_scalar"])
    # Mixtral family: sparse-MoE MLP (HF MixtralConfig)
    if hf.get("num_local_experts"):
        kw["n_experts"] = int(hf["num_local_experts"])
        kw["experts_per_tok"] = int(hf.get("num_experts_per_tok", 2))
    rs = hf.get("rope_scaling")
    if rs:
        rt = rs.get("rope_type", rs.get("type"))
        if rt == "llama3":  # Llama-3.1+ long-context remap
            kw["rope_scaling"] = (
                float(rs["factor"]), float(rs["low_freq_factor"]),
                float(rs["high_freq_factor"]),
                float(rs["original_max_position_embeddings"]),
            )
        elif rt not in (None, "default"):
            # serving with silently-wrong positions is worse than failing
            raise ValueError(f"unsupported rope_scaling type {rt!r} "
                             "(supported: llama3)")
    kw.update(overrides)
    return ModelConfig(**kw)


def iter_hf_tensors(model_dir: str) -> Iterator[tuple[str, np.ndarray]]:
    """Yield (name, array) streaming from all safetensors shards."""
    from safetensors import safe_open

    files = sorted(
        f for f in os.listdir(model_dir)
        if f.endswith(".safetensors") and not f.startswith(".")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {model_dir}")
    for fn in files:
        with safe_open(os.path.join(model_dir, fn), framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def _to_f32(a: np.ndarray) -> np.ndarray:
    if a.dtype == np.float32:
        return a
    try:
        return a.astype(np.float32)
    except TypeError:  # bfloat16 via ml_dtypes
        import ml_dtypes  # noqa: F401

        return np.asarray(a, dtype=np.float32)


def _split_fused_layer(cfg: ModelConfig, t: dict, p: str) -> None:
    """Split Phi-3-style fused projections into the canonical per-tensor
    names, in place: ``self_attn.qkv_proj`` rows are [q | k | v] and
    ``mlp.gate_up_proj`` rows are [gate | up] (HF Phi3Attention/Phi3MLP).
    The runtime re-fuses at load (models/linear.fuse_linears); the split
    exists so checkpoints shard per-projection for TP like every other
    family."""
    kv_dim = cfg.n_kv_heads * cfg.head_dim
    for stem, cuts in (
        (p + "self_attn.qkv_proj",
         (("self_attn.q_proj", 0, cfg.q_dim),
          ("self_attn.k_proj", cfg.q_dim, cfg.q_dim + kv_dim),
          ("self_attn.v_proj", cfg.q_dim + kv_dim, cfg.q_dim + 2 * kv_dim))),
        (p + "mlp.gate_up_proj",
         (("mlp.gate_proj", 0, cfg.ffn_dim),
          ("mlp.up_proj", cfg.ffn_dim, 2 * cfg.ffn_dim))),
    ):
        for kind in (".weight", ".bias"):
            fused = t.pop(stem + kind, None)
            if fused is None:
                continue
            if fused.shape[0] != cuts[-1][2]:
                raise ValueError(f"{stem}{kind} rows {fused.shape[0]} != "
                                 f"expected {cuts[-1][2]}")
            for name, lo, hi in cuts:
                t[p + name + kind] = fused[lo:hi]


def quantize_hf_weights(
    cfg: ModelConfig,
    tensors: dict[str, np.ndarray],
    *,
    quantize_lm_head: bool = False,
    quant_type: str = "fp4",
    ignore: tuple[str, ...] = (),
    requantize: bool = False,
) -> ModelParams:
    """Build packed ModelParams from an HF-named weight dict (in memory).

    ``ignore``: substrings of layer names to keep UNQUANTIZED (bf16
    DenseLinear) — the reference's ignore-list
    (recursively_replace_with_fp4_linear(ignore_layer_names=...),
    torch_bnb_fp4/__init__.py:788,831-835).

    ``requantize``: bnb-stored layers are dequantized exactly and quantized
    FRESH to ``cfg.quant_type``/``cfg.variant`` instead of importing their
    codes — the serving-speed path for NF4 checkpoints (see
    :func:`convert_hf_model`).
    """
    import dataclasses

    import jax.numpy as jnp

    if quant_type != cfg.quant_type:
        cfg = dataclasses.replace(cfg, quant_type=quant_type)

    def _jnp_leaves(q: QuantLinear) -> QuantLinear:
        return dataclasses.replace(
            q,
            packed=jnp.asarray(q.packed),
            absmax_hi=jnp.asarray(q.absmax_hi),
            absmax_lo=None if q.absmax_lo is None else jnp.asarray(q.absmax_lo),
            bias=None if q.bias is None else jnp.asarray(q.bias),
            codebook=None if q.codebook is None else jnp.asarray(q.codebook),
        )

    def ql(name: str):
        if any(s in name for s in ignore):
            if any(f"{name}{_BNB_META}{qt}" in tensors for qt in ("fp4", "nf4")):
                w, bias = _bnb_dense_weight(tensors, name)  # no fp weights stored
            else:
                w = tensors[name + ".weight"]
                bias = tensors.get(name + ".bias")
            return dense_linear(_to_f32(w), None if bias is None else _to_f32(bias))
        # already-bnb-quantized entries (live bnb model state_dict / HF-saved
        # 4-bit checkpoint in memory) import EXACTLY, same as the streaming
        # path — unless requantize asks for a fresh serving-speed pack
        if _bnb_state(tensors, name) is not None:
            if requantize:
                w, bias = _bnb_dense_weight(tensors, name)
                return _jnp_leaves(_np_quant_linear(cfg, w, bias))
            return _bnb_stored_linear(tensors, name, device=True)
        w = tensors[name + ".weight"]
        bias = tensors.get(name + ".bias")
        # same builder as the streaming converter: ONE padding/quantize rule
        return _jnp_leaves(_np_quant_linear(cfg, w, bias))

    def norm(name: str):
        return jnp.asarray(_to_f32(tensors[name]), jnp.bfloat16)

    from ..models.transformer import norm_names

    an, mn, pan, pmn = norm_names(cfg)
    layers = []
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        _split_fused_layer(cfg, tensors, p)  # Phi-3 qkv_proj/gate_up_proj
        if cfg.n_experts:
            ep = p + "block_sparse_moe.experts."
            mlp = dict(moe=MoEParams(
                router=dense_linear(_to_f32(tensors[p + "block_sparse_moe.gate.weight"])),
                gate=stack_linears([ql(f"{ep}{m}.w1") for m in range(cfg.n_experts)]),
                up=stack_linears([ql(f"{ep}{m}.w3") for m in range(cfg.n_experts)]),
                down=stack_linears([ql(f"{ep}{m}.w2") for m in range(cfg.n_experts)]),
            ))
        else:
            mlp = dict(
                w_gate=ql(p + "mlp.gate_proj"),
                w_up=ql(p + "mlp.up_proj"),
                w_down=ql(p + "mlp.down_proj"),
            )
        if pan is not None:
            mlp.update(post_attn_norm=norm(p + pan + ".weight"),
                       post_mlp_norm=norm(p + pmn + ".weight"))
        if cfg.qk_norm:
            mlp.update(q_norm=norm(p + "self_attn.q_norm.weight"),
                       k_norm=norm(p + "self_attn.k_norm.weight"))
        layers.append(LayerParams(
            attn_norm=norm(p + an + ".weight"),
            wq=ql(p + "self_attn.q_proj"),
            wk=ql(p + "self_attn.k_proj"),
            wv=ql(p + "self_attn.v_proj"),
            wo=ql(p + "self_attn.o_proj"),
            mlp_norm=norm(p + mn + ".weight"),
            **mlp,
        ))
    lm_name = "lm_head.weight" if "lm_head.weight" in tensors else "model.embed_tokens.weight"
    if quantize_lm_head:
        lm_head = ql(lm_name[: -len(".weight")])
    else:
        lm_head = dense_linear(_to_f32(tensors[lm_name]))
    if cfg.quantize_embed and not _embed_ignored(ignore):
        from ..models.transformer import quantize_embedding

        embed = quantize_embedding(
            _to_f32(tensors["model.embed_tokens.weight"]), cfg.blocksize,
            code=fmt.NF4_CODE if cfg.quant_type == "nf4" else fmt.FP4_CODE)
    else:
        embed = jnp.asarray(_to_f32(tensors["model.embed_tokens.weight"]), jnp.bfloat16)
    return ModelParams(
        embed=embed,
        layers=layers,
        final_norm=norm("model.norm.weight"),
        lm_head=lm_head,
    )


# --------------------------------------------------------------------------
# Streaming conversion: quantize + write one weight group at a time.
# --------------------------------------------------------------------------

_LINEAR_FIELDS = {
    "wq": "self_attn.q_proj", "wk": "self_attn.k_proj", "wv": "self_attn.v_proj",
    "wo": "self_attn.o_proj", "w_gate": "mlp.gate_proj", "w_up": "mlp.up_proj",
    "w_down": "mlp.down_proj",
}
_ROW_PARALLEL = ("wo", "w_down")


def _embed_ignored(ignore) -> bool:
    """True when the embedding table is ignore-listed — the ONE substring rule
    (vs the HF module name) shared by quantize_hf_weights, convert_hf_model's
    cfg construction, and the streaming converter."""
    return any(s in "model.embed_tokens" for s in ignore)


def _np_bf16(a: np.ndarray):
    import ml_dtypes

    return _to_f32(a).astype(ml_dtypes.bfloat16)


def _np_quant_linear(cfg: ModelConfig, w: np.ndarray, bias: np.ndarray | None):
    """Quantize one linear into a numpy-leaf QuantLinear (no device copies —
    the streaming converter is a pure host tool)."""
    layout = "pairk"  # nf4 rides the pair-K LUT fast path too
    code = fmt.FP4_CODE if cfg.quant_type == "fp4" else fmt.NF4_CODE
    w = _to_f32(w)
    n_out, k_in = w.shape
    kq = 8 * cfg.blocksize if layout == "pairk" else max(1024, 2 * cfg.blocksize)
    k_pad = (k_in + kq - 1) // kq * kq
    n_pad = (n_out + 127) // 128 * 128
    if (k_pad, n_pad) != (k_in, n_out):
        wp = np.zeros((n_pad, k_pad), np.float32)
        wp[:n_out, :k_in] = w
        w = wp
    if cfg.quant_type == "nf4":
        packed, hi = quantize_pack_pairk_lut(w, code, blocksize=cfg.blocksize)
        lo, variant = None, "lut"
    else:
        packed, hi = quantize_pack_pairk(
            w, blocksize=cfg.blocksize, variant=cfg.variant
        )
        lo, variant = None, cfg.variant
    return QuantLinear(
        packed=packed, absmax_hi=hi, absmax_lo=lo,
        bias=None if bias is None else _to_f32(bias),
        n_out=n_out, k_in=k_in, blocksize=cfg.blocksize, layout=layout,
        k_shards=1, variant=variant,
        codebook=None if cfg.quant_type == "fp4" else code,
    )


# HF-serialized bitsandbytes 4-bit state (what ``transformers`` writes when
# saving a ``load_in_4bit`` model; bnb QuantState.as_dict(packed=True)):
#   <stem>.weight                         uint8 (numel/2, 1) packed codes
#   <stem>.weight.absmax                  f32 (nblocks,)  [u8 when nested]
#   <stem>.weight.quant_map               f32 (16,)
#   <stem>.weight.quant_state.bitsandbytes__{fp4,nf4}
#                                         uint8 JSON blob: blocksize/shape/
#                                         dtype (+ nested_offset/_blocksize)
#   <stem>.weight.nested_absmax/.nested_quant_map   (double-quant only)
_BNB_META = ".weight.quant_state.bitsandbytes__"


def _bnb_state(t: dict, stem: str):
    """Parse a layer's serialized bnb state: (packed_flat u8, absmax f32,
    shape, blocksize, quant_type, bias) or None when not bnb-quantized.
    Double-quantized absmax is decoded here (the reference REJECTS such
    checkpoints, README.md:221-224)."""
    for qt in ("fp4", "nf4"):
        mk = f"{stem}{_BNB_META}{qt}"
        if mk in t:
            break
    else:
        return None
    qs = json.loads(bytes(np.asarray(t[mk], np.uint8).reshape(-1)).decode())
    shape = tuple(int(v) for v in qs["shape"])
    bs = int(qs["blocksize"])
    absmax = np.asarray(t[f"{stem}.weight.absmax"])
    if f"{stem}.weight.nested_absmax" in t:
        from .bnb import dequantize_nested_absmax

        absmax = dequantize_nested_absmax(
            absmax, t[f"{stem}.weight.nested_absmax"],
            t[f"{stem}.weight.nested_quant_map"], float(qs["nested_offset"]),
            int(qs.get("nested_blocksize", 256)),
        )
    bias = t.get(f"{stem}.bias")
    packed = np.asarray(t[f"{stem}.weight"]).reshape(-1)
    return packed, absmax.astype(np.float32), shape, bs, qt, (
        None if bias is None else _to_f32(bias))


def _bnb_stored_linear(t: dict, stem: str, device: bool = False):
    """EXACT QuantLinear from serialized bnb state (codes + absmax grid
    preserved); None when ``stem`` is not bnb-quantized here.  Numpy leaves
    by default: the streaming converter writes them straight to disk (a jnp
    round-trip per layer would stall a tunneled-TPU host on device fetches)."""
    st = _bnb_state(t, stem)
    if st is None:
        return None
    packed, absmax, shape, bs, qt, bias = st
    from .bnb import from_bnb_state

    return from_bnb_state(packed, absmax, shape, blocksize=bs, quant_type=qt,
                          bias=bias, device=device)


def _bnb_dense_weight(t: dict, stem: str):
    """Dequantize a serialized bnb layer to a full (n_out, k_in) f32 weight
    (used when --ignore keeps a stored-quantized layer dense)."""
    packed, absmax, shape, bs, qt, bias = _bnb_state(t, stem)
    code = fmt.FP4_CODE if qt == "fp4" else fmt.NF4_CODE
    w = fmt.dequantize_fp4(packed, absmax, shape, blocksize=bs, code=code)
    return w, bias


def _np_dense_linear(w: np.ndarray, bias: np.ndarray | None) -> DenseLinear:
    w = _to_f32(w)
    n_out, k_in = w.shape
    return DenseLinear(
        w=_np_bf16(w.T), bias=None if bias is None else _np_bf16(bias),
        n_out=n_out, k_in=k_in,
    )


def convert_hf_model(
    model_dir: str,
    out_dir: str,
    *,
    quant_type: str = "fp4",
    quantize_lm_head: bool = False,
    quantize_embed: bool = False,
    ignore: tuple[str, ...] = (),
    variant: str = "ramp",
    requantize: bool = False,
    verbose: bool = True,
    stats_out: dict | None = None,
) -> ModelConfig:
    """Stream-convert an HF llama/mistral checkpoint to a packed-FP4 one.

    Memory-bounded: tensors stream from the safetensors shards and each
    weight GROUP (one decoder layer / embedding / lm_head) is quantized,
    written to its npz, and freed as soon as its tensors have all arrived —
    at no point is more than a few groups' worth of floats resident (the
    reference instead re-quantizes the whole live model on every boot,
    torch_bnb_fp4/__init__.py:781-922).  Group membership comes from the
    shard key listings (read up front from the safetensors headers), so
    optional biases are known before streaming starts.

    ``stats_out`` (optional dict) receives {"peak_pending_bytes", "total_bytes",
    "groups"} — tests assert the streaming bound with it.

    ``requantize``: when the source is a bitsandbytes-serialized 4-bit
    checkpoint, dequantize the stored codes exactly and quantize FRESH to the
    requested ``quant_type``/``variant`` instead of importing the codes.  The
    serving-speed path for NF4 checkpoints: NF4's exact decode is a LUT
    gather (microcoded on v5e, GEMV ~0.68x the bf16 matvec) while the ramp
    variant decodes arithmetically at 3.2x — requantizing trades a measured
    1.26x the direct-ramp weight error (0.107 vs 0.085 sigma mean |dw| on
    Gaussian weights; NF4-exact is 0.073) for that speed.  fp4-exact sources
    requantize at 1.15x direct-ramp error.  No-op for full-precision sources
    (they already quantize fresh).
    """
    from collections import defaultdict

    from .checkpoint import CheckpointWriter, _ql_to_arrays

    cfg = config_from_hf(
        model_dir, quant_type=quant_type, variant=variant,
        quantize_embed=quantize_embed and not _embed_ignored(ignore),
    )

    # --- plan groups from the shard headers (no tensor data read) ---
    from safetensors import safe_open

    files = sorted(
        f for f in os.listdir(model_dir)
        if f.endswith(".safetensors") and not f.startswith(".")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {model_dir}")
    all_keys: set[str] = set()
    for fn in files:
        with safe_open(os.path.join(model_dir, fn), framework="np") as f:
            all_keys.update(f.keys())

    # pre-quantized bitsandbytes checkpoint (HF save of a load_in_4bit
    # model): import the stored codes EXACTLY instead of requantizing
    bnb_qt = next(
        (qt for qt in ("fp4", "nf4") if any(k.endswith(_BNB_META + qt) for k in all_keys)),
        None,
    )
    if bnb_qt is not None:
        if requantize:
            if verbose:
                print(f"bitsandbytes {bnb_qt} checkpoint detected: REQUANTIZING "
                      f"to {cfg.quant_type}/{cfg.variant} (exact dequantize -> "
                      "fresh pack; serving-speed tradeoff, see convert --help)")
        else:
            import dataclasses

            cfg = dataclasses.replace(
                cfg, quant_type=bnb_qt,
                variant="exact" if bnb_qt == "fp4" else cfg.variant,
            )
            if verbose:
                print(f"bitsandbytes {bnb_qt} checkpoint detected: importing stored "
                      "codes exactly (no requantization)")

    def group_of(key: str) -> str:
        if ".block_sparse_moe.experts." in key:
            # each Mixtral expert is its own streaming group: its raw floats
            # are quantized and FREED on arrival; only packed bytes are held
            # until the layer's stack is complete
            parts = key.split(".")
            return f"layers.{parts[2]}.experts.{parts[5]}"
        if key.startswith("model.layers."):
            return "layers." + key.split(".")[2]
        if key == "model.embed_tokens.weight":
            return "embed"
        if key == "model.norm.weight":
            return "final_norm"
        if key.startswith("lm_head."):
            return "lm_head"
        return "_ignored"  # e.g. rotary inv_freq buffers in old checkpoints

    need: dict[str, set[str]] = defaultdict(set)
    for key in all_keys:
        need[group_of(key)].add(key)
    tied_lm = "lm_head.weight" not in all_keys  # lm_head reuses the embedding

    def is_ignored(hf_name: str) -> bool:
        return any(s in hf_name for s in ignore)

    writer = CheckpointWriter(out_dir, cfg)

    def quant_or_dense(t: dict, stem: str):
        """One linear from streamed tensors: stored-bnb exact import (or
        requantize), fresh quantization, or dense (ignore-listed) — shared by
        attention linears and MoE experts."""
        q = None
        if not is_ignored(stem) and not requantize:
            q = _bnb_stored_linear(t, stem)
        if q is None:
            w = t.get(stem + ".weight")
            bias = t.get(stem + ".bias")
            if any(f"{stem}{_BNB_META}{qt}" in t for qt in ("fp4", "nf4")):
                # --ignore on a bnb-quantized layer (the checkpoint has no
                # full-precision weights) or --requantize: dequantize the
                # stored state exactly, then keep dense / quantize fresh
                w, bias = _bnb_dense_weight(t, stem)
            if w is None:
                raise ValueError(
                    f"checkpoint is missing tensor {stem + '.weight'!r} "
                    f"(incomplete safetensors shards?)"
                )
            q = _np_dense_linear(w, bias) if is_ignored(stem) else _np_quant_linear(cfg, w, bias)
        return q

    # --- Mixtral expert assembly: experts stream as their own groups (raw
    # floats freed on quantize), the stacked layer npz is written when the
    # attention group and all n_experts expert groups have arrived ---
    from collections import defaultdict as _dd
    import dataclasses as _dc

    expert_parts: dict[int, dict[int, dict]] = _dd(dict)
    layer_hold: dict[int, tuple] = {}

    def _np_stack_linears(linears):
        q0 = linears[0]

        def st(f):
            v = getattr(q0, f)
            return None if v is None else np.stack([np.asarray(getattr(l, f)) for l in linears])

        if isinstance(q0, DenseLinear):
            assert all(isinstance(l, DenseLinear) for l in linears), \
                "all experts of a layer must share quantization (check --ignore)"
            return _dc.replace(q0, w=st("w"), bias=st("bias"))
        assert all(
            isinstance(l, QuantLinear) and l.variant == q0.variant and l.layout == q0.layout
            for l in linears
        ), "all experts of a layer must share quantization (check --ignore)"
        return _dc.replace(
            q0, packed=st("packed"), absmax_hi=st("absmax_hi"),
            absmax_lo=st("absmax_lo"), bias=st("bias"), codebook=st("codebook"),
        )

    def flush_expert(i: int, m: int, t: dict[str, np.ndarray]) -> None:
        ep = f"model.layers.{i}.block_sparse_moe.experts.{m}."
        # HF Mixtral expert naming: w1 = gate, w3 = up, w2 = down
        expert_parts[i][m] = {
            field: quant_or_dense(t, ep + wname)
            for field, wname in (("gate", "w1"), ("up", "w3"), ("down", "w2"))
        }
        maybe_write_moe_layer(i)

    def maybe_write_moe_layer(i: int) -> None:
        if i not in layer_hold or len(expert_parts[i]) != cfg.n_experts:
            return
        arrays, meta, router = layer_hold.pop(i)
        parts = expert_parts.pop(i)
        moe = MoEParams(
            router=router,
            gate=_np_stack_linears([parts[m]["gate"] for m in range(cfg.n_experts)]),
            up=_np_stack_linears([parts[m]["up"] for m in range(cfg.n_experts)]),
            down=_np_stack_linears([parts[m]["down"] for m in range(cfg.n_experts)]),
        )
        from .checkpoint import _moe_to_arrays

        meta["moe"] = _moe_to_arrays(f"layers.{i}.moe", moe, arrays)
        writer.put(f"layers.{i}", arrays, meta)
        if verbose:
            print(f"  assembled layers.{i} ({cfg.n_experts} experts)", flush=True)

    def flush_layer(i: int, t: dict[str, np.ndarray]) -> None:
        from ..models.transformer import norm_names

        an, mn, pan, pmn = norm_names(cfg)
        p = f"model.layers.{i}."
        _split_fused_layer(cfg, t, p)  # Phi-3 qkv_proj/gate_up_proj
        arrays = {
            f"layers.{i}.attn_norm": _np_bf16(t[p + an + ".weight"]),
            f"layers.{i}.mlp_norm": _np_bf16(t[p + mn + ".weight"]),
        }
        if pan is not None:
            arrays[f"layers.{i}.post_attn_norm"] = _np_bf16(t[p + pan + ".weight"])
            arrays[f"layers.{i}.post_mlp_norm"] = _np_bf16(t[p + pmn + ".weight"])
        if cfg.qk_norm:  # Qwen3 per-head q/k norms
            arrays[f"layers.{i}.q_norm"] = _np_bf16(t[p + "self_attn.q_norm.weight"])
            arrays[f"layers.{i}.k_norm"] = _np_bf16(t[p + "self_attn.k_norm.weight"])
        meta: dict = {"kind": "layer", "linears": {}}
        fields = dict(_LINEAR_FIELDS)
        if cfg.n_experts:
            for f in ("w_gate", "w_up", "w_down"):
                fields.pop(f)
        for f, suffix in fields.items():
            q = quant_or_dense(t, p + suffix)
            m = _ql_to_arrays(f"layers.{i}.{f}", q, arrays)
            m["row_parallel"] = f in _ROW_PARALLEL
            meta["linears"][f] = m
        if cfg.n_experts:
            router = _np_dense_linear(t[p + "block_sparse_moe.gate.weight"], None)
            layer_hold[i] = (arrays, meta, router)
            maybe_write_moe_layer(i)
        else:
            writer.put(f"layers.{i}", arrays, meta)

    def flush_lm_head(w: np.ndarray, bias: np.ndarray | None, src_name: str = "lm_head") -> None:
        # the ignore-list matches the SOURCE tensor name (so a tied lm_head
        # is filtered as "model.embed_tokens", matching quantize_hf_weights)
        if quantize_lm_head and not is_ignored(src_name):
            arrays: dict = {}
            meta = _ql_to_arrays("lm_head", _np_quant_linear(cfg, w, bias), arrays)
            meta["row_parallel"] = False
            writer.put("lm_head", arrays, meta)
        else:
            arrays = {"lm_head.w": _np_bf16(_to_f32(w).T)}
            if bias is not None:
                arrays["lm_head.bias"] = _np_bf16(bias)
            writer.put("lm_head", arrays, {"kind": "dense"})

    # --- stream ---
    pending: dict[str, dict[str, np.ndarray]] = defaultdict(dict)
    pending_bytes = 0
    peak_pending = 0
    total_bytes = 0
    done: set[str] = set()

    def flush(group: str) -> None:
        nonlocal pending_bytes
        t = pending.pop(group)
        if group == "embed":
            if cfg.quantize_embed and not is_ignored("model.embed_tokens"):
                from ..models.transformer import quantize_embedding

                e = quantize_embedding(
                    _to_f32(t["model.embed_tokens.weight"]), cfg.blocksize,
                    code=fmt.NF4_CODE if cfg.quant_type == "nf4" else fmt.FP4_CODE)
                writer.put(
                    "embed",
                    {"embed.packed": np.asarray(e.packed),
                     "embed.scale": np.asarray(e.scale),
                     "embed.code": np.asarray(e.code)},
                    {"kind": "quant_embed", "blocksize": e.blocksize,
                     "vocab_size": e.vocab_size, "dim": e.dim})
            else:
                writer.put("embed", {"embed.w": _np_bf16(t["model.embed_tokens.weight"])},
                           {"kind": "dense_embed"})
            if tied_lm:
                flush_lm_head(t["model.embed_tokens.weight"], None,
                              src_name="model.embed_tokens")
        elif group == "final_norm":
            writer.put("final_norm", {"final_norm.w": _np_bf16(t["model.norm.weight"])},
                       {"kind": "norm"})
        elif group == "lm_head":
            flush_lm_head(t["lm_head.weight"], t.get("lm_head.bias"),
                          src_name="lm_head")
        elif ".experts." in group:
            _, i, _, m = group.split(".")
            flush_expert(int(i), int(m), t)
        elif group.startswith("layers."):
            flush_layer(int(group.split(".")[1]), t)
        pending_bytes -= sum(a.nbytes for a in t.values())
        done.add(group)
        if verbose:
            print(f"  wrote {group}", flush=True)

    for name, arr in iter_hf_tensors(model_dir):
        g = group_of(name)
        if g == "_ignored":
            continue
        pending[g][name] = arr
        pending_bytes += arr.nbytes
        total_bytes += arr.nbytes
        peak_pending = max(peak_pending, pending_bytes)
        if set(pending[g]) == need[g]:
            flush(g)

    missing = {g: sorted(need[g] - set(pending.get(g, {})))
               for g in need if g not in done and g != "_ignored"}
    if any(missing.values()):
        raise ValueError(f"checkpoint incomplete; missing tensors: {missing}")
    writer.finish()
    if stats_out is not None:
        stats_out.update(peak_pending_bytes=peak_pending, total_bytes=total_bytes,
                         groups=len(done))
    if verbose:
        print(f"wrote packed checkpoint to {out_dir} "
              f"(peak pending {peak_pending/2**20:.1f} MiB of {total_bytes/2**20:.1f} MiB total)",
              flush=True)
    return cfg
