"""Synthetic model builders for benchmarking.

Decode/matmul speed of the FP4 kernels is data-independent, so benchmarks
build models from random *packed* bytes generated directly on device — a 7B
model materializes in seconds with no host RAM spike and no host->device
transfer through the axon tunnel (the reference's speed test instead loads
real Mistral-7B weights through HF, examples/speed_test_mistral_7b.py:20-31;
our convert/ tool covers that path, benches don't need it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.linear import DenseLinear, QuantLinear
from ..models.transformer import KVCache, LayerParams, ModelConfig, ModelParams


def synth_quant_linear(key, n_out: int, k_in: int, *, blocksize: int = 64, layout: str = "pairk", k_shards: int = 1, absmax_scale: float = 0.01, variant: str = "ramp") -> QuantLinear:
    """Random QuantLinear with plausible absmax magnitudes, built on device."""
    assert k_in % (2 * blocksize) == 0 and n_out % 128 == 0, (n_out, k_in)
    kp = k_in // 2
    k1, k2, k3 = jax.random.split(key, 3)
    packed = jax.random.randint(k1, (kp, n_out), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
    if layout == "pairk":
        scale = jax.random.uniform(k2, (k_in // blocksize, n_out), jnp.float32, 0.5, 1.5) * (absmax_scale / 192.0)
        absmax_hi, absmax_lo = scale, None
    else:
        rows = kp // blocksize
        absmax_hi = jax.random.uniform(k2, (rows, n_out), jnp.float32, 0.5, 1.5) * absmax_scale
        absmax_lo = jax.random.uniform(k3, (rows, n_out), jnp.float32, 0.5, 1.5) * absmax_scale
    return QuantLinear(
        packed=packed,
        absmax_hi=absmax_hi,
        absmax_lo=absmax_lo,
        bias=None,
        n_out=n_out,
        k_in=k_in,
        blocksize=blocksize,
        layout=layout,
        k_shards=k_shards,
        variant=variant if layout == "pairk" else "exact",
    )


def synth_dense_linear(key, n_out: int, k_in: int, *, scale: float = 0.01, dtype=jnp.bfloat16) -> DenseLinear:
    w = (jax.random.normal(key, (k_in, n_out), jnp.float32) * scale).astype(dtype)
    return DenseLinear(w=w, bias=None, n_out=n_out, k_in=k_in)


def synth_params(cfg: ModelConfig, *, quantized: bool = True, seed: int = 0, tp: int = 1, layout: str = "pairk", fuse: bool = False) -> ModelParams:
    """Random ModelParams — quantized (FP4) or dense bf16 — built on device."""
    key = jax.random.PRNGKey(seed)
    kv_dim = cfg.n_kv_heads * cfg.head_dim

    def lin(key, n_out, k_in, k_shards=1):
        if quantized:
            return synth_quant_linear(
                key, n_out, k_in, blocksize=cfg.blocksize, layout=layout,
                k_shards=k_shards if layout == "splitk" else 1,
                variant=cfg.variant,
            )
        return synth_dense_linear(key, n_out, k_in)

    keys = jax.random.split(key, cfg.n_layers + 2)
    layers = []
    for i in range(cfg.n_layers):
        ks = jax.random.split(keys[i], 7)
        if cfg.n_experts:
            from ..models.transformer import MoEParams, stack_linears

            eks = jax.random.split(ks[4], 3 * cfg.n_experts + 1)
            mlp = dict(moe=MoEParams(
                router=synth_dense_linear(eks[-1], cfg.n_experts, cfg.dim, scale=1.0),
                gate=stack_linears([lin(eks[3 * m], cfg.ffn_dim, cfg.dim)
                                    for m in range(cfg.n_experts)]),
                up=stack_linears([lin(eks[3 * m + 1], cfg.ffn_dim, cfg.dim)
                                  for m in range(cfg.n_experts)]),
                down=stack_linears([lin(eks[3 * m + 2], cfg.dim, cfg.ffn_dim, k_shards=tp)
                                    for m in range(cfg.n_experts)]),
            ))
        else:
            mlp = dict(
                w_gate=lin(ks[4], cfg.ffn_dim, cfg.dim),
                w_up=lin(ks[5], cfg.ffn_dim, cfg.dim),
                w_down=lin(ks[6], cfg.dim, cfg.ffn_dim, k_shards=tp),
            )
        if cfg.qk_norm:  # Qwen3 per-head q/k norms
            mlp.update(q_norm=jnp.ones((cfg.head_dim,), jnp.bfloat16),
                       k_norm=jnp.ones((cfg.head_dim,), jnp.bfloat16))
        layers.append(LayerParams(
            attn_norm=jnp.ones((cfg.dim,), jnp.bfloat16),
            wq=lin(ks[0], cfg.dim, cfg.dim),
            wk=lin(ks[1], kv_dim, cfg.dim),
            wv=lin(ks[2], kv_dim, cfg.dim),
            wo=lin(ks[3], cfg.dim, cfg.dim, k_shards=tp),
            mlp_norm=jnp.ones((cfg.dim,), jnp.bfloat16),
            **mlp,
        ))
    ek, lk = jax.random.split(keys[-1])
    if quantized and cfg.quantize_embed:
        # mirror quantize_lm_head handling: a quantize_embed config must
        # benchmark the gather-decoded packed table, not a dense bf16 one
        from ..models.transformer import QuantEmbedding
        from ..ops.format import FP4_CODE

        e1, e2 = jax.random.split(ek)
        embed = QuantEmbedding(
            packed=jax.random.randint(e1, (cfg.vocab_size, cfg.dim // 2), 0, 256,
                                      dtype=jnp.int32).astype(jnp.uint8),
            scale=jax.random.uniform(e2, (cfg.vocab_size, cfg.dim // cfg.blocksize),
                                     jnp.float32, 0.5, 1.5) * 0.01,
            code=jnp.asarray(FP4_CODE, jnp.float32),
            vocab_size=cfg.vocab_size, dim=cfg.dim, blocksize=cfg.blocksize,
        )
    else:
        embed = (jax.random.normal(ek, (cfg.vocab_size, cfg.dim), jnp.float32) * 0.01).astype(jnp.bfloat16)
    if quantized and cfg.quantize_lm_head and layout == "pairk":
        lm_head = synth_quant_linear(lk, cfg.vocab_size, cfg.dim, blocksize=cfg.blocksize, variant=cfg.variant)
    else:
        lm_head = synth_dense_linear(lk, cfg.vocab_size, cfg.dim)
    params = ModelParams(
        embed=embed,
        layers=layers,
        final_norm=jnp.ones((cfg.dim,), jnp.bfloat16),
        lm_head=lm_head,
    )
    if fuse and quantized and layout == "pairk":
        from ..models.transformer import fuse_params

        params = fuse_params(params, tp=tp)
    return params
