"""HF checkpoint -> packed FP4 checkpoint (offline, streaming, host-side).

Covers the reference's model-conversion capability (SURVEY.md §3.1:
recursively_replace_with_fp4_linear + bnb quantize-on-.to(device),
torch_bnb_fp4/__init__.py:781-922) as an offline tool: read safetensors
tensor-by-tensor (no full-model RAM spike), quantize+pack each linear,
write the packed checkpoint.  Norms/embeddings stay bf16; lm_head stays
unquantized by default (the reference's ignore-list default keeps lm_head
full precision, __init__.py:788).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np

from ..models.linear import QuantLinear, dense_linear
from ..models.transformer import LayerParams, ModelConfig, ModelParams
from ..ops import format as fmt
from .checkpoint import save_checkpoint
from .quantize import quantize_pack_pairk, quantize_pack_sharded

_LINEAR_SUFFIXES = (
    "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
    "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
)


def config_from_hf(model_dir: str, **overrides) -> ModelConfig:
    """Build ModelConfig from an HF llama/mistral-family config.json."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
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
    )
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


def quantize_hf_weights(
    cfg: ModelConfig,
    tensors: dict[str, np.ndarray],
    *,
    quantize_lm_head: bool = False,
    quant_type: str = "fp4",
    ignore: tuple[str, ...] = (),
) -> ModelParams:
    """Build packed ModelParams from an HF-named weight dict (in memory).

    ``ignore``: substrings of layer names to keep UNQUANTIZED (bf16
    DenseLinear) — the reference's ignore-list
    (recursively_replace_with_fp4_linear(ignore_layer_names=...),
    torch_bnb_fp4/__init__.py:788,831-835).
    """
    import jax.numpy as jnp

    code = fmt.FP4_CODE if quant_type == "fp4" else fmt.NF4_CODE

    layout = "pairk" if quant_type == "fp4" else "splitk"

    def ql(name: str):
        if any(s in name for s in ignore):
            return dense_linear(_to_f32(tensors[name + ".weight"]),
                                None if tensors.get(name + ".bias") is None
                                else _to_f32(tensors[name + ".bias"]))
        return _ql_quant(name)

    def _ql_quant(name: str) -> QuantLinear:
        w = _to_f32(tensors[name + ".weight"])
        n_out, k_in = w.shape
        kq = 8 * cfg.blocksize if layout == "pairk" else max(1024, 2 * cfg.blocksize)
        k_pad = (k_in + kq - 1) // kq * kq
        n_pad = (n_out + 127) // 128 * 128
        if (k_pad, n_pad) != (k_in, n_out):
            wp = np.zeros((n_pad, k_pad), np.float32)
            wp[:n_out, :k_in] = w
            w = wp
        if layout == "pairk":
            packed, hi = quantize_pack_pairk(w, blocksize=cfg.blocksize, variant=cfg.variant)
            lo = None
        else:
            packed, hi, lo = quantize_pack_sharded(w, blocksize=cfg.blocksize, code=code)
        bias = tensors.get(name + ".bias")
        return QuantLinear(
            packed=jnp.asarray(packed), absmax_hi=jnp.asarray(hi),
            absmax_lo=None if lo is None else jnp.asarray(lo),
            bias=None if bias is None else jnp.asarray(_to_f32(bias)),
            n_out=n_out, k_in=k_in, blocksize=cfg.blocksize, layout=layout,
            k_shards=1, variant=cfg.variant if layout == "pairk" else "exact",
            codebook=None if quant_type == "fp4" else jnp.asarray(code),
        )

    def norm(name: str):
        return jnp.asarray(_to_f32(tensors[name]), jnp.bfloat16)

    layers = []
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        layers.append(LayerParams(
            attn_norm=norm(p + "input_layernorm.weight"),
            wq=ql(p + "self_attn.q_proj"),
            wk=ql(p + "self_attn.k_proj"),
            wv=ql(p + "self_attn.v_proj"),
            wo=ql(p + "self_attn.o_proj"),
            mlp_norm=norm(p + "post_attention_layernorm.weight"),
            w_gate=ql(p + "mlp.gate_proj"),
            w_up=ql(p + "mlp.up_proj"),
            w_down=ql(p + "mlp.down_proj"),
        ))
    lm_name = "lm_head.weight" if "lm_head.weight" in tensors else "model.embed_tokens.weight"
    if quantize_lm_head:
        lm_head = ql(lm_name[: -len(".weight")])
    else:
        lm_head = dense_linear(_to_f32(tensors[lm_name]))
    return ModelParams(
        embed=jnp.asarray(_to_f32(tensors["model.embed_tokens.weight"]), jnp.bfloat16),
        layers=layers,
        final_norm=norm("model.norm.weight"),
        lm_head=lm_head,
    )


def convert_hf_model(
    model_dir: str,
    out_dir: str,
    *,
    quant_type: str = "fp4",
    quantize_lm_head: bool = False,
    ignore: tuple[str, ...] = (),
    variant: str = "ramp",
    verbose: bool = True,
) -> ModelConfig:
    """Stream-convert an HF llama/mistral checkpoint to a packed-FP4 one."""
    cfg = config_from_hf(model_dir, quant_type=quant_type, variant=variant)
    tensors: dict[str, np.ndarray] = {}
    for name, arr in iter_hf_tensors(model_dir):
        tensors[name] = arr
        if verbose:
            print(f"  read {name} {arr.shape}", flush=True)
    params = quantize_hf_weights(
        cfg, tensors, quantize_lm_head=quantize_lm_head, quant_type=quant_type,
        ignore=ignore,
    )
    save_checkpoint(out_dir, cfg, params)
    if verbose:
        print(f"wrote packed checkpoint to {out_dir}", flush=True)
    return cfg
