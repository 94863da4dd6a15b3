"""Packed-FP4 checkpoint format: save once offline, load for any tp width.

The reference never serializes its converted model (SURVEY.md §5,
checkpoint/resume: "converted model is never serialized" — every boot pays
HF-load + quantize).  Here conversion is offline and serving loads packed
bytes directly.

Layout (directory):
  manifest.json           — model geometry + quantization metadata
  <name>.npz              — one file per weight group (layers.N, embed, ...)
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from ..models.linear import DenseLinear, QuantLinear
from ..models.transformer import (
    LayerParams,
    ModelConfig,
    ModelParams,
    MoEParams,
    QuantEmbedding,
)
from .quantize import repack_k_shards

# v1: initial format.  v2: adds the 'quant_embed' embed kind (quantized
# embedding tables).  v3: adds per-layer q_norm/k_norm arrays + the qk_norm
# config key (Qwen3 family).  Readers accept every version in
# _SUPPORTED_VERSIONS; writers always stamp the current FORMAT_VERSION.
FORMAT_VERSION = 3
_SUPPORTED_VERSIONS = (1, 2, 3)
_QL_FIELDS = ("packed", "absmax_hi", "absmax_lo", "bias")


def _encode_arrays(arrays: dict) -> tuple[dict, list[str]]:
    """npz can't round-trip bfloat16 (loads as void) — store as uint16 views
    and record which keys to view back."""
    import ml_dtypes

    out, bf16_keys = {}, []
    for k, a in arrays.items():
        a = np.asarray(a)
        if a.dtype == ml_dtypes.bfloat16:
            out[k] = a.view(np.uint16)
            bf16_keys.append(k)
        else:
            out[k] = a
    return out, bf16_keys


def _decode_arrays(arrays: dict, bf16_keys: list[str]) -> dict:
    import ml_dtypes

    for k in bf16_keys:
        arrays[k] = arrays[k].view(ml_dtypes.bfloat16)
    return arrays


def _ql_to_arrays(prefix: str, q, store: dict) -> dict:
    if isinstance(q, DenseLinear):
        # unquantized (ignore-listed) layer
        store[f"{prefix}.w"] = np.asarray(q.w)
        if q.bias is not None:
            store[f"{prefix}.bias"] = np.asarray(q.bias)
        return dict(kind="dense", n_out=q.n_out, k_in=q.k_in)
    for f in _QL_FIELDS:
        v = getattr(q, f)
        if v is not None:
            store[f"{prefix}.{f}"] = np.asarray(v)
    return dict(kind="quant", n_out=q.n_out, k_in=q.k_in, blocksize=q.blocksize,
                layout=q.layout, k_shards=q.k_shards, variant=q.variant,
                codebook=None if q.codebook is None else np.asarray(q.codebook).tolist())


def _moe_to_arrays(prefix: str, moe: MoEParams, store: dict) -> dict:
    """Serialize a stacked-expert MoE block.  Checkpoints store the experts
    STACKED (one array per field with a leading n_experts axis) — the on-disk
    layout IS the runtime layout, so load is a plain read; the streaming
    converter assembles the stack incrementally (convert/hf.py)."""
    store[f"{prefix}.router.w"] = np.asarray(moe.router.w)
    if moe.router.bias is not None:
        store[f"{prefix}.router.bias"] = np.asarray(moe.router.bias)
    meta = {
        "kind": "moe",
        "router": dict(n_out=moe.router.n_out, k_in=moe.router.k_in),
        "experts": {},
    }
    for field in ("gate", "up", "down"):
        q = getattr(moe, field)
        m = _ql_to_arrays(f"{prefix}.{field}", q, store)
        m["row_parallel"] = field == "down"
        meta["experts"][field] = m
    return meta


def _moe_from_arrays(prefix: str, meta: dict, arrays: dict, tp: int) -> MoEParams:
    rb = arrays.get(f"{prefix}.router.bias")
    router = DenseLinear(
        w=jnp.asarray(arrays[f"{prefix}.router.w"]),
        bias=None if rb is None else jnp.asarray(rb),
        n_out=meta["router"]["n_out"],
        k_in=meta["router"]["k_in"],
    )
    kw = {
        f: _ql_from_arrays(f"{prefix}.{f}", dict(meta["experts"][f]), arrays, tp)
        for f in ("gate", "up", "down")
    }
    return MoEParams(router=router, **kw)


def _ql_from_arrays(prefix: str, meta: dict, arrays: dict, tp: int):
    if meta.get("kind") == "dense":
        bias = arrays.get(f"{prefix}.bias")
        return DenseLinear(
            w=jnp.asarray(arrays[f"{prefix}.w"]),
            bias=None if bias is None else jnp.asarray(bias),
            n_out=meta["n_out"],
            k_in=meta["k_in"],
        )
    packed = arrays[f"{prefix}.packed"]
    hi = arrays[f"{prefix}.absmax_hi"]
    lo = arrays.get(f"{prefix}.absmax_lo")
    layout = meta.get("layout", "splitk")
    k_shards = meta["k_shards"]
    if layout == "splitk" and meta.get("row_parallel") and tp != k_shards:
        # pairk shards contiguously and never needs this
        packed, hi, lo = repack_k_shards(packed, hi, lo, meta["blocksize"], k_shards, tp)
        k_shards = tp
    bias = arrays.get(f"{prefix}.bias")
    cb = meta.get("codebook")
    return QuantLinear(
        packed=jnp.asarray(packed),
        absmax_hi=jnp.asarray(hi),
        absmax_lo=None if lo is None else jnp.asarray(lo),
        bias=None if bias is None else jnp.asarray(bias),
        n_out=meta["n_out"],
        k_in=meta["k_in"],
        blocksize=meta["blocksize"],
        layout=layout,
        k_shards=k_shards,
        variant=meta.get("variant", "exact"),
        codebook=None if cb is None else jnp.asarray(np.asarray(cb, np.float32)),
    )


class CheckpointWriter:
    """Incremental checkpoint writer: one ``put`` per weight group, manifest
    written at ``finish``.  This is what makes streaming conversion possible
    (convert/hf.py): each group is quantized, written, and freed before the
    next one is read — no full-model RAM spike."""

    def __init__(self, path: str, cfg: ModelConfig):
        os.makedirs(path, exist_ok=True)
        self._path = path
        self._manifest: dict = {
            "format_version": FORMAT_VERSION,
            "config": dataclasses.asdict(cfg),
            "tensors": {},
        }

    def put(self, name: str, arrays: dict, meta: dict) -> None:
        arrays, bf16_keys = _encode_arrays(arrays)
        np.savez(os.path.join(self._path, name + ".npz"), **arrays)
        meta = dict(meta)
        meta["bf16_keys"] = bf16_keys
        self._manifest["tensors"][name] = meta

    def finish(self) -> None:
        with open(os.path.join(self._path, "manifest.json"), "w") as f:
            json.dump(self._manifest, f, indent=1)


def save_checkpoint(path: str, cfg: ModelConfig, params: ModelParams) -> None:
    writer = CheckpointWriter(path, cfg)
    put = writer.put

    if isinstance(params.embed, QuantEmbedding):
        e = params.embed
        put("embed",
            {"embed.packed": np.asarray(e.packed),
             "embed.scale": np.asarray(e.scale),
             "embed.code": np.asarray(e.code)},
            {"kind": "quant_embed", "blocksize": e.blocksize,
             "vocab_size": e.vocab_size, "dim": e.dim})
    else:
        put("embed", {"embed.w": np.asarray(params.embed)}, {"kind": "dense_embed"})
    put("final_norm", {"final_norm.w": np.asarray(params.final_norm)}, {"kind": "norm"})
    for i, lp in enumerate(params.layers):
        arrays: dict = {
            f"layers.{i}.attn_norm": np.asarray(lp.attn_norm),
            f"layers.{i}.mlp_norm": np.asarray(lp.mlp_norm),
        }
        if lp.post_attn_norm is not None:  # Gemma-2 post-norms
            arrays[f"layers.{i}.post_attn_norm"] = np.asarray(lp.post_attn_norm)
            arrays[f"layers.{i}.post_mlp_norm"] = np.asarray(lp.post_mlp_norm)
        if lp.q_norm is not None:  # Qwen3 per-head q/k norms
            arrays[f"layers.{i}.q_norm"] = np.asarray(lp.q_norm)
            arrays[f"layers.{i}.k_norm"] = np.asarray(lp.k_norm)
        meta: dict = {"kind": "layer", "linears": {}}
        attn_fields = ("wq", "wk", "wv", "wo")
        mlp_fields = () if lp.moe is not None else ("w_gate", "w_up", "w_down")
        for f in attn_fields + mlp_fields:
            m = _ql_to_arrays(f"layers.{i}.{f}", getattr(lp, f), arrays)
            m["row_parallel"] = f in ("wo", "w_down")
            meta["linears"][f] = m
        if lp.moe is not None:
            meta["moe"] = _moe_to_arrays(f"layers.{i}.moe", lp.moe, arrays)
        put(f"layers.{i}", arrays, meta)
    lm = params.lm_head
    if isinstance(lm, QuantLinear):
        arrays = {}
        meta = _ql_to_arrays("lm_head", lm, arrays)
        meta["row_parallel"] = False
        put("lm_head", arrays, meta)
    else:
        w = np.asarray(lm.w if isinstance(lm, DenseLinear) else lm)
        b = None if not isinstance(lm, DenseLinear) or lm.bias is None else np.asarray(lm.bias)
        arrays = {"lm_head.w": w}
        if b is not None:
            arrays["lm_head.bias"] = b
        put("lm_head", arrays, {"kind": "dense"})
    writer.finish()


def load_checkpoint(path: str, tp: int = 1, fuse: bool = False) -> tuple[ModelConfig, ModelParams]:
    """Load a packed checkpoint; splitk row-parallel layers are repacked for
    ``tp`` on the fly (exact); ``fuse=True`` fuses QKV and gate|up for the
    requested ``tp`` (checkpoints always store unfused)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    version = manifest.get("format_version")
    if version not in _SUPPORTED_VERSIONS:
        raise ValueError(
            f"checkpoint at {path!r} has format_version {version!r}; this "
            f"reader supports {_SUPPORTED_VERSIONS}. Re-convert the model or "
            f"upgrade torch_bnb_fp4_tpu."
        )
    cfg = ModelConfig(**manifest["config"])

    def arrs(name: str) -> dict:
        with np.load(os.path.join(path, name + ".npz")) as z:
            return _decode_arrays(dict(z), manifest["tensors"][name].get("bf16_keys", []))

    emeta = manifest["tensors"]["embed"]
    ea = arrs("embed")
    if emeta["kind"] == "quant_embed":
        embed = QuantEmbedding(
            packed=jnp.asarray(ea["embed.packed"]),
            scale=jnp.asarray(ea["embed.scale"]),
            code=jnp.asarray(ea["embed.code"]),
            vocab_size=emeta["vocab_size"], dim=emeta["dim"],
            blocksize=emeta["blocksize"],
        )
    else:
        embed = jnp.asarray(ea["embed.w"])
    final_norm = jnp.asarray(arrs("final_norm")["final_norm.w"])
    layers = []
    for i in range(cfg.n_layers):
        a = arrs(f"layers.{i}")
        tmeta = manifest["tensors"][f"layers.{i}"]
        meta = tmeta["linears"]
        kw = {}
        for f in meta:
            kw[f] = _ql_from_arrays(f"layers.{i}.{f}", dict(meta[f]), a, tp)
        if "moe" in tmeta:
            kw["moe"] = _moe_from_arrays(f"layers.{i}.moe", tmeta["moe"], a, tp)
        if f"layers.{i}.post_attn_norm" in a:  # Gemma-2 post-norms
            kw["post_attn_norm"] = jnp.asarray(a[f"layers.{i}.post_attn_norm"])
            kw["post_mlp_norm"] = jnp.asarray(a[f"layers.{i}.post_mlp_norm"])
        if f"layers.{i}.q_norm" in a:  # Qwen3 per-head q/k norms
            kw["q_norm"] = jnp.asarray(a[f"layers.{i}.q_norm"])
            kw["k_norm"] = jnp.asarray(a[f"layers.{i}.k_norm"])
        layers.append(LayerParams(
            attn_norm=jnp.asarray(a[f"layers.{i}.attn_norm"]),
            mlp_norm=jnp.asarray(a[f"layers.{i}.mlp_norm"]),
            **kw,
        ))
    lm_meta = manifest["tensors"]["lm_head"]
    a = arrs("lm_head")
    if lm_meta["kind"] == "quant":
        lm_head = _ql_from_arrays("lm_head", lm_meta, a, tp)
    else:
        w = a["lm_head.w"]
        lm_head = DenseLinear(
            w=jnp.asarray(w),
            bias=jnp.asarray(a["lm_head.bias"]) if "lm_head.bias" in a else None,
            n_out=w.shape[1],
            k_in=w.shape[0],
        )
    params = ModelParams(embed=embed, layers=layers, final_norm=final_norm, lm_head=lm_head)
    if fuse:
        from ..models.transformer import fuse_params

        params = fuse_params(params, tp=tp)
    return cfg, params
