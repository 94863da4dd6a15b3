"""LoRA adapters over packed-FP4 bases (QLoRA-style serving).

bitsandbytes 4-bit exists first and foremost as the QLoRA base format; the
reference library accelerates the base linear but has no adapter story.
Here a PEFT-trained adapter can be served two ways:

* ``attach_lora``: wrap target linears in :class:`~.linear.LoRALinear` —
  base bytes untouched, adapters hot-swappable, delta exact (two skinny
  MXU matmuls, <2% overhead at practical ranks), TP-ready (parallel/tp.py
  shards the factors so deltas ride the existing psums).
* ``merge_lora``: fold ``scale * B @ A`` into the base weights and
  REQUANTIZE — zero runtime overhead, at the cost of one extra FP4
  quantization of the merged weight (the same error class as quantizing the
  finetuned model directly).

``load_peft_adapter`` reads a HF PEFT adapter directory
(adapter_config.json + adapter_model.safetensors, torch (out, in)
orientation, keys ``base_model.model.<module>.lora_A/B.weight``).
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from .linear import DenseLinear, LoRALinear, MultiLoRALinear, QuantLinear, dense_linear, dequantize_weight, lora_linear, multi_lora_linear, quantize_linear
from .transformer import LayerParams, ModelConfig, ModelParams

# HF module suffix -> LayerParams field (same map the converter uses)
_FIELD_OF = {
    "self_attn.q_proj": "wq", "self_attn.k_proj": "wk", "self_attn.v_proj": "wv",
    "self_attn.o_proj": "wo", "mlp.gate_proj": "w_gate", "mlp.up_proj": "w_up",
    "mlp.down_proj": "w_down",
}


@dataclasses.dataclass(frozen=True)
class PEFTAdapter:
    """One loaded adapter: rank, alpha, and per-module (lora_A, lora_B)."""

    r: int
    alpha: float
    weights: dict  # module stem (e.g. "model.layers.0.self_attn.q_proj") -> (A, B)


def load_peft_adapter(path: str) -> PEFTAdapter:
    """Load a HF PEFT LoRA directory (adapter_config.json +
    adapter_model.safetensors)."""
    from safetensors import safe_open

    with open(os.path.join(path, "adapter_config.json")) as f:
        cfg = json.load(f)
    if cfg.get("peft_type", "LORA").upper() != "LORA":
        raise ValueError(f"unsupported peft_type {cfg.get('peft_type')!r} (LoRA only)")
    if cfg.get("rank_pattern") or cfg.get("alpha_pattern"):
        raise ValueError("per-module rank/alpha patterns are not supported")
    fn = os.path.join(path, "adapter_model.safetensors")
    pairs: dict[str, dict[str, np.ndarray]] = {}
    with safe_open(fn, framework="np") as f:
        for key in f.keys():
            stem, kind = _parse_adapter_key(key)
            pairs.setdefault(stem, {})[kind] = f.get_tensor(key)
    weights = {}
    for stem, ab in pairs.items():
        if set(ab) != {"A", "B"}:
            raise ValueError(f"incomplete adapter pair for {stem}: has {sorted(ab)}")
        weights[stem] = (np.asarray(ab["A"], np.float32), np.asarray(ab["B"], np.float32))
    return PEFTAdapter(r=int(cfg["r"]), alpha=float(cfg["lora_alpha"]), weights=weights)


def _parse_adapter_key(key: str) -> tuple[str, str]:
    for marker, kind in ((".lora_A.weight", "A"), (".lora_B.weight", "B"),
                         (".lora_A.default.weight", "A"), (".lora_B.default.weight", "B")):
        if key.endswith(marker):
            stem = key[: -len(marker)]
            for prefix in ("base_model.model.", "base_model."):
                if stem.startswith(prefix):
                    stem = stem[len(prefix):]
                    break
            return stem, kind
    raise ValueError(f"unrecognized adapter tensor name {key!r}")


def _targets(cfg: ModelConfig, adapter: PEFTAdapter):
    """Yield (layer_idx, field, A, B) for every adapter module; loud errors
    for anything this runtime can't serve."""
    for stem, (a, b) in sorted(adapter.weights.items()):
        if not stem.startswith("model.layers."):
            raise ValueError(f"adapter target {stem!r} is outside the decoder "
                             "(embeddings/lm_head adapters are not supported)")
        rest = stem.split(".", 3)
        i, suffix = int(rest[2]), rest[3]
        if "block_sparse_moe" in suffix:
            raise ValueError(f"adapter target {stem!r}: expert adapters are not "
                             "supported (attach to attention projections)")
        field = _FIELD_OF.get(suffix)
        if field is None:
            raise ValueError(f"adapter target {stem!r} is not a known linear")
        yield i, field, a, b


def attach_lora(params: ModelParams, cfg: ModelConfig, adapter: PEFTAdapter) -> ModelParams:
    """Wrap every adapter-targeted linear in a LoRALinear (exact, base bytes
    untouched).  Params must be UNFUSED (load_checkpoint(fuse=False)): a
    fused QKV stack has no per-projection seam to attach to."""
    new_layers = list(params.layers)
    for i, field, a, b in _targets(cfg, adapter):
        lp = new_layers[i]
        if lp.wqkv is not None or lp.w_gateup is not None:
            raise ValueError("attach_lora requires unfused params "
                             "(load_checkpoint(..., fuse=False))")
        base = getattr(lp, field)
        if base is None:
            raise ValueError(f"layer {i} has no {field} (MoE layer?)")
        if isinstance(base, LoRALinear):
            raise ValueError(f"layer {i}.{field} already has an adapter attached")
        new_layers[i] = dataclasses.replace(
            lp, **{field: lora_linear(base, a, b, alpha=adapter.alpha)}
        )
    return dataclasses.replace(params, layers=new_layers)


def attach_multi_lora(
    params: ModelParams, cfg: ModelConfig, adapters: dict[str, PEFTAdapter],
) -> tuple[ModelParams, dict[str, int]]:
    """Stack several adapters over one shared base for PER-REQUEST serving
    (multi-tenant QLoRA: N finetunes of the same base model served from one
    copy of the packed-FP4 weights).  Every module targeted by ANY adapter
    becomes a :class:`~.linear.MultiLoRALinear` holding all adapters' factors
    (zero rows for adapters that skip that module); forward passes then
    select per batch row via ``adapter_idx``.

    Returns ``(params, ids)`` where ``ids[name]`` is the adapter's index
    (starting at 1; index 0 is the reserved "no adapter" slot) — pass ids to
    ``Engine(adapter_ids=...)`` and name an adapter per ``Request``.

    Params must be UNFUSED (load_checkpoint(fuse=False)), like
    :func:`attach_lora`; do not mix with single-adapter attach on the same
    params (a LoRALinear would apply its one adapter to every row,
    ignoring the per-row index).
    """
    names = list(adapters)
    ids = {name: i + 1 for i, name in enumerate(names)}
    # (layer, field) -> per-adapter (A, B, alpha) in id order
    stacks: dict[tuple[int, str], list] = {}
    for name in names:
        for i, field, a, b in _targets(cfg, adapters[name]):
            lp = params.layers[i]
            if lp.wqkv is not None or lp.w_gateup is not None:
                raise ValueError("attach_multi_lora requires unfused params "
                                 "(load_checkpoint(..., fuse=False))")
            base = getattr(lp, field)
            if base is None:
                raise ValueError(f"layer {i} has no {field} (MoE layer?)")
            if isinstance(base, (LoRALinear,)):
                raise ValueError(
                    f"layer {i}.{field} already has a single-adapter "
                    "LoRALinear attached; detach_lora first"
                )
            key = (i, field)
            if key not in stacks:
                stacks[key] = [None] * len(names)
            stacks[key][ids[name] - 1] = (a, b, adapters[name].alpha)
    new_layers = list(params.layers)
    for (i, field), entries in stacks.items():
        base = getattr(new_layers[i], field)
        new_layers[i] = dataclasses.replace(
            new_layers[i], **{field: multi_lora_linear(base, entries)}
        )
    return dataclasses.replace(params, layers=new_layers), ids


def detach_lora(params: ModelParams) -> ModelParams:
    """Strip every LoRALinear back to its base (exact inverse of attach)."""

    def strip(lp: LayerParams) -> LayerParams:
        rep = {
            f: getattr(lp, f).base
            for f in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
            if isinstance(getattr(lp, f), LoRALinear)
        }
        return dataclasses.replace(lp, **rep) if rep else lp

    return dataclasses.replace(params, layers=[strip(lp) for lp in params.layers])


def merge_lora(params: ModelParams, cfg: ModelConfig, adapter: PEFTAdapter) -> ModelParams:
    """Fold each adapter into its base weight (W + (alpha/r) * B @ A) and
    requantize quantized bases.  Zero runtime overhead; the merged weight is
    requantized, so expect the normal FP4 envelope ON THE DELTA too (serving
    the un-merged attach_lora form keeps the delta exact)."""
    scale = adapter.alpha / adapter.r
    new_layers = list(params.layers)
    for i, field, a, b in _targets(cfg, adapter):
        lp = new_layers[i]
        base = getattr(lp, field)
        if isinstance(base, LoRALinear):
            base = base.base
        delta = scale * (b @ a)  # (n_out, k_in)
        if isinstance(base, QuantLinear):
            w = np.asarray(dequantize_weight(base, out_dtype=np.float32)) + delta
            merged = quantize_linear(
                w, None if base.bias is None else np.asarray(base.bias),
                blocksize=base.blocksize,
                quant_type="nf4" if base.variant == "lut" else "fp4",
                variant="ramp" if base.variant == "lut" else base.variant,
            )
        elif isinstance(base, DenseLinear):
            w = np.asarray(base.w, np.float32).T + delta
            merged = dense_linear(w, None if base.bias is None else np.asarray(base.bias))
        else:
            raise ValueError(f"cannot merge into {type(base).__name__}")
        new_layers[i] = dataclasses.replace(lp, **{field: merged})
    return dataclasses.replace(params, layers=new_layers)
