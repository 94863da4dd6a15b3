"""Llama/Mistral-family decoder with FP4 weight-only linears.

The reference library stops at the linear layer and relies on HuggingFace for
the model (examples/speed_test_mistral_7b.py:20-31); the TPU framework owns
the whole forward pass so decode can be one jitted program (BASELINE.json
configs 2-4).  Everything here is functional: parameters are immutable pytrees
(bf16 norms/embeddings + :class:`~torch_bnb_fp4_tpu.models.linear.QuantLinear`
for every weight matrix), and prefill/decode are pure jittable functions.

Architecture covered (Mistral-7B / TinyLlama / Llama-2 geometry):
  * RMSNorm (eps configurable)
  * rotary position embeddings (theta configurable)
  * grouped-query attention with bf16 KV cache, causal masking, optional
    sliding window (Mistral)
  * SwiGLU MLP
  * optional bf16 (unquantized) lm_head — parity with the reference's
    ignore-list that keeps lm_head full precision
    (torch_bnb_fp4/__init__.py:788).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .linear import DenseLinear, QuantLinear, apply_linear, dense_linear, quantize_linear


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static decoder geometry (hashable; safe as a jit static arg)."""

    vocab_size: int
    dim: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    ffn_dim: int
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    sliding_window: int | None = None
    quantize_lm_head: bool = False
    # quantize the token-embedding table too (FP4/NF4 by quant_type, LUT
    # decode at lookup — see QuantEmbedding).  Off by default: matches the
    # reference, which only swaps nn.Linear modules
    # (torch_bnb_fp4/__init__.py:717-779) and leaves embeddings alone.
    quantize_embed: bool = False
    blocksize: int = 64
    quant_type: str = "fp4"
    # Qwen2-style attention bias on q/k/v projections (o_proj stays
    # bias-free).  Only consulted by random_weights; the real-weight paths
    # (convert/hf.py, quantize_params) pick biases up from the checkpoint's
    # ``.bias`` tensors whether or not this is set.
    attn_bias: bool = False
    # pairk codebook variant for FRESH fp4 quantization (ops/format.
    # PAIRK_MAGS192): "ramp" = 7-op decode (default; slightly more accurate
    # than exact FP4 for Gaussian weights), "exact" = bit-exact bnb codes.
    variant: str = "ramp"
    # Gemma-family knobs (HF GemmaModel conventions, validated against
    # transformers in tests/test_hf_oracle.py):
    #   head_dim      explicit per-head width (None = dim // n_heads; Gemma
    #                 decouples it, e.g. 3072/16 heads but head_dim 256)
    #   hidden_act    "silu" (Llama/Mistral/Qwen2) | "gelu_tanh" (GeGLU)
    #   norm_offset   RMSNorm multiplies by (1 + w) in f32 before downcast
    #   embed_scale   embeddings scaled by bf16(sqrt(dim)) after lookup
    head_dim: int | None = None
    hidden_act: str = "silu"
    norm_offset: bool = False
    embed_scale: bool = False
    # Llama-3.1+ long-context RoPE remap (HF rope_scaling rope_type
    # "llama3"): (factor, low_freq_factor, high_freq_factor,
    # original_max_position_embeddings); None = plain RoPE
    rope_scaling: tuple[float, float, float, float] | None = None
    # Mixture-of-experts (Mixtral family, HF MixtralSparseMoeBlock
    # conventions): n_experts > 0 replaces the dense MLP with a router over
    # ``n_experts`` SwiGLU experts, ``experts_per_tok`` active per token
    # (softmax -> top-k -> renormalize, expert outputs weighted-summed).
    # 0 = dense MLP (every non-Mixtral family).
    n_experts: int = 0
    experts_per_tok: int = 2
    # Gemma-2 family knobs (HF Gemma2 conventions):
    #   post_norms         extra RMSNorms on the attention and MLP OUTPUTS
    #                      (4 norms/layer; HF post_attention_layernorm is the
    #                      post-ATTN one, pre/post_feedforward_layernorm wrap
    #                      the MLP)
    #   attn_logit_softcap logits <- cap * tanh(logits / cap) before masking
    #   final_logit_softcap  same on the lm_head logits
    #   query_pre_attn_scalar  attention scale = 1/sqrt(this) instead of
    #                      1/sqrt(head_dim) (gemma-2-27b: 144 != 128)
    #   alt_sliding        sliding_window applies on EVEN layers only; odd
    #                      layers attend globally
    post_norms: bool = False
    attn_logit_softcap: float | None = None
    final_logit_softcap: float | None = None
    query_pre_attn_scalar: float | None = None
    alt_sliding: bool = False
    # Qwen3 family: per-head RMSNorm on the q and k projections (HF
    # Qwen3Attention q_norm/k_norm, weight shape (head_dim,)), applied after
    # the head reshape and BEFORE RoPE.  Validated against transformers in
    # tests/test_hf_oracle.py.
    qk_norm: bool = False

    def layer_sliding_window(self, i: int) -> int | None:
        """Per-layer sliding window: Gemma-2 alternates sliding (even i) and
        global (odd i) layers; every other family is uniform."""
        if self.alt_sliding and i % 2:
            return None
        return self.sliding_window

    def __post_init__(self):
        if self.head_dim is None:
            object.__setattr__(self, "head_dim", self.dim // self.n_heads)
        if self.rope_scaling is not None:
            # checkpoint manifests round-trip through JSON (list); the config
            # must stay hashable for jit static args
            object.__setattr__(self, "rope_scaling", tuple(self.rope_scaling))

    @property
    def q_dim(self) -> int:
        """q/o projection width — equals ``dim`` except when head_dim is
        decoupled (Gemma)."""
        return self.n_heads * self.head_dim

    @classmethod
    def mistral_7b(cls) -> "ModelConfig":
        # geometry of Mistral-7B-Instruct-v0.2 (the reference's e2e model,
        # examples/speed_test_mistral_7b.py:20)
        return cls(
            vocab_size=32000, dim=4096, n_layers=32, n_heads=32, n_kv_heads=8,
            ffn_dim=14336, rope_theta=1e6, sliding_window=4096,
        )

    @classmethod
    def tinyllama_1b(cls) -> "ModelConfig":
        return cls(
            vocab_size=32000, dim=2048, n_layers=22, n_heads=32, n_kv_heads=4,
            ffn_dim=5632, rope_theta=10000.0,
        )

    @classmethod
    def llama2_70b(cls) -> "ModelConfig":
        return cls(
            vocab_size=32000, dim=8192, n_layers=80, n_heads=64, n_kv_heads=8,
            ffn_dim=28672, rope_theta=10000.0,
        )

    @classmethod
    def llama3_8b(cls) -> "ModelConfig":
        return cls(
            vocab_size=128256, dim=4096, n_layers=32, n_heads=32, n_kv_heads=8,
            ffn_dim=14336, rope_theta=500000.0,
        )

    @classmethod
    def qwen2_7b(cls) -> "ModelConfig":
        # Qwen2-7B-Instruct geometry: GQA 28/4, biased q/k/v projections
        return cls(
            vocab_size=152064, dim=3584, n_layers=28, n_heads=28, n_kv_heads=4,
            ffn_dim=18944, rope_theta=1e6, rms_eps=1e-6, attn_bias=True,
        )

    @classmethod
    def qwen3_8b(cls) -> "ModelConfig":
        # Qwen3-8B: per-head q/k RMSNorm (qk_norm), decoupled head_dim field
        # (128 == dim//n_heads here, but HF always sets it), no attention bias
        return cls(
            vocab_size=151936, dim=4096, n_layers=36, n_heads=32, n_kv_heads=8,
            ffn_dim=12288, rope_theta=1e6, rms_eps=1e-6, head_dim=128,
            qk_norm=True,
        )

    @classmethod
    def phi3_mini(cls) -> "ModelConfig":
        # Phi-3-mini-4k: HF checkpoints fuse qkv_proj/gate_up_proj; the
        # converter splits them (convert/hf.py:_split_fused_layer)
        return cls(
            vocab_size=32064, dim=3072, n_layers=32, n_heads=32, n_kv_heads=32,
            ffn_dim=8192, rope_theta=10000.0,
        )

    @classmethod
    def gemma_7b(cls) -> "ModelConfig":
        # Gemma-7B: decoupled head_dim (16 heads x 256 > dim 3072), GeGLU,
        # (1+w) norms, sqrt(dim)-scaled embeddings, tied lm_head
        return cls(
            vocab_size=256000, dim=3072, n_layers=28, n_heads=16, n_kv_heads=16,
            ffn_dim=24576, rms_eps=1e-6, head_dim=256, hidden_act="gelu_tanh",
            norm_offset=True, embed_scale=True,
        )

    @classmethod
    def gemma2_9b(cls) -> "ModelConfig":
        # Gemma-2-9B: post-norms, logit softcaps, alternating 4k sliding /
        # global attention, GeGLU, (1+w) norms, scaled embeddings, tied head
        return cls(
            vocab_size=256000, dim=3584, n_layers=42, n_heads=16, n_kv_heads=8,
            ffn_dim=14336, rms_eps=1e-6, head_dim=256, hidden_act="gelu_tanh",
            norm_offset=True, embed_scale=True, post_norms=True,
            sliding_window=4096, alt_sliding=True,
            attn_logit_softcap=50.0, final_logit_softcap=30.0,
            query_pre_attn_scalar=256.0,
        )

    @classmethod
    def mixtral_8x7b(cls) -> "ModelConfig":
        # Mixtral-8x7B-Instruct-v0.1: Mistral-7B attention geometry with 8
        # SwiGLU experts, 2 active per token (HF MixtralConfig defaults).
        # FP4-packed experts are ~23.5 GB — serve with tp >= 2 on v5e.
        return cls(
            vocab_size=32000, dim=4096, n_layers=32, n_heads=32, n_kv_heads=8,
            ffn_dim=14336, rope_theta=1e6, n_experts=8, experts_per_tok=2,
        )

    @classmethod
    def tiny_test(cls, **kw) -> "ModelConfig":
        """Small geometry for CPU/interpret tests (K multiples of 1024)."""
        d = dict(vocab_size=256, dim=1024, n_layers=2, n_heads=8, n_kv_heads=4,
                 ffn_dim=2048)
        d.update(kw)
        return cls(**d)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MoEParams:
    """Mixture-of-experts MLP state (Mixtral family).

    ``router`` is a small dense (dim -> n_experts) linear (never quantized —
    8*dim params, and routing decisions are the one place 4-bit noise
    changes WHICH weights run).  The expert weights are STACKED: each leaf of
    ``gate``/``up``/``down`` (and fused ``gateup``) carries a leading
    ``n_experts`` axis over an otherwise ordinary QuantLinear/DenseLinear
    layout.  Stacking is what makes both dispatch strategies cheap on TPU:
    a traced token can ``dynamic_index`` its expert out of the stack (decode)
    and a static loop can slice expert ``e`` for the batched all-experts pass
    (prefill) — with per-expert pytrees either would need an 8-way
    ``lax.switch`` per token-slot, which multiplies program size by E.
    TP shards the stacked leaves exactly like the dense MLP (gate/up
    column-parallel, down row-parallel; the expert axis stays unsharded).
    """

    router: Any  # DenseLinear (dim -> n_experts)
    gate: Any  # stacked QuantLinear/DenseLinear (leading E axis); None if fused
    up: Any
    down: Any  # stacked, row-parallel under TP
    gateup: Any = None  # fused gate|up stack (models/linear.fuse_linears)


def stack_linears(linears: list) -> Any:
    """Stack same-shape QuantLinears/DenseLinears into one pytree whose array
    leaves gain a leading expert axis (static metadata must match)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *linears)


def expert_view(stacked: Any, e) -> Any:
    """Select expert ``e`` out of a stacked linear.  ``e`` may be a traced
    scalar (decode dispatch) or a python int (static all-experts loop)."""
    if isinstance(e, int):
        return jax.tree.map(lambda a: a[e], stacked)
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, e, 0, keepdims=False), stacked
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LayerParams:
    attn_norm: jax.Array  # (dim,)
    wq: Any  # QuantLinear/DenseLinear, or None when wqkv is fused
    wk: Any
    wv: Any
    wo: Any
    mlp_norm: jax.Array  # (dim,)
    w_gate: Any = None  # None when w_gateup is fused (or the layer is MoE)
    w_up: Any = None
    w_down: Any = None
    # fused projections (models/linear.fuse_linears): one kernel launch for
    # QKV and one for gate|up — the decode hot path default
    wqkv: Any = None
    w_gateup: Any = None
    # mixture-of-experts MLP (Mixtral): replaces w_gate/w_up/w_down
    moe: Any = None
    # Gemma-2 post-norms on the attention / MLP outputs (cfg.post_norms)
    post_attn_norm: Any = None
    post_mlp_norm: Any = None
    # Qwen3 per-head q/k norms, (head_dim,) bf16 (cfg.qk_norm)
    q_norm: Any = None
    k_norm: Any = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuantEmbedding:
    """Blockwise-FP4/NF4 token-embedding table (opt-in: cfg.quantize_embed).

    The reference only swaps ``nn.Linear`` modules and leaves the embedding
    table full-precision (torch_bnb_fp4/__init__.py:717-779); once every
    linear is packed, the table is the LAST big bf16 tensor in the model
    (Mistral-7B 32000x4096: 262 MB -> ~74 MB = 65.5 MB packed + 8.2 MB f32
    absmax at blocksize 64, i.e. 4 bits/weight + 0.5 bit of scale; Llama-2-70B
    embed + untied lm_head ~1.05 GB -> ~295 MB), and the freed HBM goes to
    KV-cache slots / longer contexts.

    Layout is row-gather-friendly, NOT the matmul pair-K layout: bnb flat
    row-major codes packed two-per-byte high-nibble-first along the feature
    dim with one f32 absmax per ``blocksize`` features, so each token's row
    is self-contained.  Decode is a per-token 16-entry LUT gather that XLA
    fuses into the lookup — a decode step touches B rows (~KB), so no Pallas
    kernel is warranted and the codebook stays EXACT (fp4 and nf4 alike; the
    ramp remap exists only to speed the matmul kernels' arithmetic decode).
    """

    packed: jax.Array  # (vocab, dim // 2) uint8, high nibble first
    scale: jax.Array   # (vocab, dim // blocksize) f32 absmax
    code: jax.Array    # (16,) f32 codebook values (FP4_CODE or NF4_CODE)
    vocab_size: int = dataclasses.field(metadata=dict(static=True))
    dim: int = dataclasses.field(metadata=dict(static=True))
    blocksize: int = dataclasses.field(default=64, metadata=dict(static=True))

    def lookup(self, tokens: jax.Array) -> jax.Array:
        """tokens (...,) i32 -> embeddings (..., dim) bf16."""
        p = self.packed[tokens]                       # (..., dim//2) u8
        s = self.scale[tokens]                        # (..., dim//bs) f32
        idx = jnp.stack([p >> 4, p & 0xF], axis=-1).astype(jnp.int32)
        vals = self.code[idx.reshape(*p.shape[:-1], -1)]          # (..., dim)
        vals = vals.reshape(*s.shape, self.blocksize) * s[..., None]
        return vals.reshape(*p.shape[:-1], self.dim).astype(jnp.bfloat16)


def quantize_embedding(w: np.ndarray, blocksize: int = 64,
                       code: np.ndarray | None = None) -> QuantEmbedding:
    """Quantize a (vocab, dim) embedding table to :class:`QuantEmbedding`.

    Blocks must not straddle rows (each token row self-contained for the
    gather), so ``dim`` must divide by ``blocksize``."""
    from ..ops import format as fmt

    if code is None:
        code = fmt.FP4_CODE
    w = np.asarray(w, np.float32)
    if w.ndim != 2:
        raise ValueError(f"embedding table must be 2-D, got {w.shape}")
    v, d = w.shape
    if d % blocksize:
        raise ValueError(f"dim {d} not divisible by blocksize {blocksize}")
    codes, absmax = fmt.quantize_codes(w, blocksize, np.asarray(code, np.float32))
    return QuantEmbedding(
        packed=jnp.asarray(fmt.pack_flat(codes).reshape(v, d // 2)),
        scale=jnp.asarray(absmax.reshape(v, d // blocksize)),
        code=jnp.asarray(code, jnp.float32),
        vocab_size=v, dim=d, blocksize=blocksize,
    )


def embed_lookup(embed, tokens: jax.Array) -> jax.Array:
    """Token lookup for either embedding representation -> (..., dim) bf16."""
    if isinstance(embed, QuantEmbedding):
        return embed.lookup(tokens)
    return embed[tokens].astype(jnp.bfloat16)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ModelParams:
    # (vocab, dim) bf16, or QuantEmbedding if cfg.quantize_embed
    embed: Any
    layers: list[LayerParams]
    final_norm: jax.Array  # (dim,)
    # lm_head: QuantLinear if cfg.quantize_lm_head else bf16 (dim, vocab)
    lm_head: Any


def ring_rows(cap: int, window: int | None, write_chunk: int) -> int:
    """KV rows to allocate for one layer: the full ``cap`` for global
    attention, or a ROLLING ring of ``ceil(window/c+1)*c`` rows (c =
    ``write_chunk``) for sliding-window layers.

    The ring invariant: writes of up to ``write_chunk`` rows starting at
    position offsets that are multiples of ``write_chunk`` (chunked prefill)
    or single rows at any offset (decode) never wrap within one write —
    ``R % c == 0`` and ``R >= window + c`` guarantee ``(start % R) + len <=
    R`` — so every cache update stays ONE dynamic_update_slice, no scatter.
    ``R >= window + write_chunk`` also keeps every key a chunk's OLDEST query
    is entitled to see (its window reaches ``window - 1`` positions back
    while the chunk's own writes evict up to ``write_chunk`` old rows).
    Attention outputs are bit-identical to the full cache's: positions
    beyond the window were masked anyway (tests/test_sliding.py)."""
    if window is None or write_chunk <= 0:
        return cap
    c = write_chunk
    return min(cap, (-(-window // c) + 1) * c)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KVCache:
    """bf16 KV cache, one (B, rows_i, n_kv, head_dim) pair per layer.

    ``length`` is PER SEQUENCE (B,) — each batch slot has its own write
    offset, which is what continuous batching (serve/) requires; the
    single-sequence API just keeps all entries equal.

    ``rows_i`` is ``max_len`` by default; with ``write_chunk > 0``,
    sliding-window layers allocate a ROLLING ring of ``ring_rows()`` rows
    instead (Mistral-7B at max_len 8192: 4352-row rings for all 32 layers —
    roughly half the KV HBM, which doubles the serving slots or context the
    chip can hold).  Writes land at ``length % rows`` and the absolute
    position of ring slot ``s`` is recovered as ``L-1 - ((L-1-s) mod rows)``
    — for a never-wrapping (full-size) cache both reduce to the linear
    offsets, so there is ONE code path for ring and linear caches alike."""

    k: list[jax.Array]
    v: list[jax.Array]
    length: jax.Array  # i32 (B,): total positions seen per sequence

    @classmethod
    def zeros(cls, cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
              write_chunk: int = 0) -> "KVCache":
        """``write_chunk > 0`` enables rolling rings on sliding-window layers
        (see ring_rows): the caller promises every multi-row cache write is
        at most ``write_chunk`` rows starting at a multiple of it (single-row
        decode writes are always safe)."""
        ks, vs = [], []
        for i in range(cfg.n_layers):
            r = ring_rows(max_len, cfg.layer_sliding_window(i), write_chunk)
            shape = (batch, r, cfg.n_kv_heads, cfg.head_dim)
            ks.append(jnp.zeros(shape, dtype))
            vs.append(jnp.zeros(shape, dtype))
        return cls(k=ks, v=vs, length=jnp.zeros((batch,), jnp.int32))

    @property
    def max_len(self) -> int:
        return max(a.shape[1] for a in self.k)

    @property
    def min_rows(self) -> int:
        """Smallest per-layer row count — positions older than this many
        steps back may be evicted (ring layers)."""
        return min(a.shape[1] for a in self.k)


def rms_norm(x: jax.Array, weight: jax.Array, eps: float, offset: bool = False) -> jax.Array:
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if offset:
        # Gemma convention: multiply by (1 + w) IN f32, downcast after
        # (HF GemmaRMSNorm; Llama downcasts first, then multiplies in bf16)
        return (xf * scale * (1.0 + weight.astype(jnp.float32))).astype(x.dtype)
    return (xf * scale).astype(x.dtype) * weight


def _act(cfg: "ModelConfig", gate: jax.Array) -> jax.Array:
    """MLP gate activation in f32 (cast back at the caller): SiLU for the
    Llama family, tanh-approximated GeLU for Gemma (HF gelu_pytorch_tanh)."""
    g = gate.astype(jnp.float32)
    if cfg.hidden_act == "gelu_tanh":
        return jax.nn.gelu(g, approximate=True)
    return jax.nn.silu(g)


def rope(x: jax.Array, positions: jax.Array, theta: float,
         scaling: tuple[float, float, float, float] | None = None) -> jax.Array:
    """Rotary embedding.  x: (B, L, H, D), positions: (B, L) or (L,).

    ``scaling`` = (factor, low_freq_factor, high_freq_factor,
    original_max_position_embeddings) applies the Llama-3.1 long-context
    frequency remap (HF ``rope_type: "llama3"``): wavelengths above
    orig/low stretch by 1/factor, those below orig/high keep, the band in
    between interpolates smoothly.  Static values: XLA constant-folds the
    remapped table, so scaled RoPE costs nothing at run time.
    """
    d = x.shape[-1]
    freqs = theta ** (-jnp.arange(0, d // 2, dtype=jnp.float32) / (d // 2))
    if scaling is not None:
        factor, lo_f, hi_f, orig = scaling
        wavelen = 2.0 * jnp.pi / freqs
        smooth = (orig / wavelen - lo_f) / (hi_f - lo_f)
        smooth = jnp.clip(smooth, 0.0, 1.0)  # 0 -> /factor band, 1 -> keep band
        freqs = (1.0 - smooth) * freqs / factor + smooth * freqs
    angles = positions.astype(jnp.float32)[..., None] * freqs  # (B, L, D/2)
    cos = jnp.cos(angles)[..., None, :]  # (B, L, 1, D/2)
    sin = jnp.sin(angles)[..., None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


_ATTN_QUERY_CHUNK = 512
# route to the Pallas flash kernel when Lq*Lk crosses ~1M cells — the
# measured v5e crossover (chunk256: dense wins at Lk<=2048, flash wins 1.9x
# at Lk=4352 and 2.7x at Lk=8192, PERF_NOTES round 5); it also caps the
# dense path's O(Lq*Lk) f32 logits memory.  Trace-time decision (static
# shapes); CPU/interpret runs keep the dense path (tiny test shapes never
# reach the threshold).
_FLASH_MIN_CELLS = 256 * 4096


def _use_flash(lq: int, lk: int) -> bool:
    return (
        lq * lk >= _FLASH_MIN_CELLS
        and lq >= 128
        and jax.default_backend() == "tpu"
    )


def _attention(
    q: jax.Array,  # (B, Lq, Hq, D)
    k: jax.Array,  # (B, Lk, Hk, D)
    v: jax.Array,
    q_positions: jax.Array,  # (B, Lq) absolute positions of queries
    kv_valid: jax.Array,  # (B, Lk) bool: cache slot holds a real token
    kv_positions: jax.Array,  # (B, Lk) absolute position of each cache slot
    sliding_window: int | None,
    scale: float | None = None,  # None = 1/sqrt(head_dim)
    logit_softcap: float | None = None,
) -> jax.Array:
    """Causal GQA attention.  Long-context prefill (Lq*Lk past
    _FLASH_MIN_CELLS) runs the Pallas online-softmax kernel
    (ops/attention.flash_attention — O(block_q x D) working set, ring-cache
    aware); shorter shapes chunk over the QUERY axis (exact — each query
    row's softmax is independent) so the logits tensor stays
    (B, Hk, G, chunk, Lk) instead of O(Lq*Lk)."""
    lq, lk = q.shape[1], k.shape[1]
    if _use_flash(lq, lk):
        from ..ops.attention import flash_attention

        return flash_attention(
            q, k, v, q_positions, kv_valid, kv_positions,
            sliding_window, scale, logit_softcap,
        )
    if lq > _ATTN_QUERY_CHUNK:
        outs = []
        for c0 in range(0, lq, _ATTN_QUERY_CHUNK):
            c1 = min(c0 + _ATTN_QUERY_CHUNK, lq)
            outs.append(_attention_dense(
                q[:, c0:c1], k, v, q_positions[:, c0:c1], kv_valid,
                kv_positions, sliding_window, scale, logit_softcap,
            ))
        return jnp.concatenate(outs, axis=1)
    return _attention_dense(q, k, v, q_positions, kv_valid, kv_positions,
                            sliding_window, scale, logit_softcap)


def _attention_dense(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_positions: jax.Array,
    kv_valid: jax.Array,
    kv_positions: jax.Array,
    sliding_window: int | None,
    scale: float | None = None,
    logit_softcap: float | None = None,
) -> jax.Array:
    b, lq, hq, d = q.shape
    hk = k.shape[2]
    group = hq // hk
    qf = q.reshape(b, lq, hk, group, d).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    logits = jnp.einsum("blhgd,bshd->bhgls", qf, kf) * (
        1.0 / np.sqrt(d) if scale is None else scale
    )
    if logit_softcap is not None:  # Gemma-2: cap * tanh(logits / cap)
        logits = logit_softcap * jnp.tanh(logits / logit_softcap)
    # causal + validity (+ sliding window) mask.  kv_positions is (B, Lk):
    # ring caches recover each slot's ABSOLUTE position per sequence (the
    # same slot holds different positions for sequences of different ages).
    qpos = q_positions[:, None, None, :, None]  # (B,1,1,Lq,1)
    kpos = kv_positions[:, None, None, None, :]  # (B,1,1,1,Lk)
    mask = (kpos <= qpos) & kv_valid[:, None, None, None, :]
    if sliding_window is not None:
        mask = mask & (kpos > qpos - sliding_window)
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgls,bshd->blhgd", probs, vf)
    return out.reshape(b, lq, hq, d).astype(q.dtype)


def _attn_scale(cfg: ModelConfig) -> float | None:
    if cfg.query_pre_attn_scalar is not None:
        return 1.0 / np.sqrt(cfg.query_pre_attn_scalar)
    return None


def _apply_expert(stacked, e, x, **kw):
    """One expert of a stacked linear applied to ``x``: quantized pairk
    stacks go through the zero-copy scalar-prefetch kernel (the expert index
    selects tiles inside the Pallas grid — no HBM materialization of the
    expert's weights); dense stacks (oracle/baseline models) slice a view."""
    from .linear import QuantLinear, apply_expert_linear

    if isinstance(stacked, QuantLinear) and stacked.layout == "pairk":
        return apply_expert_linear(stacked, e, x, **kw)
    return expert_view(stacked, e)(x, **kw)


def _expert_ffn(moe: MoEParams, cfg: ModelConfig, e, x: jax.Array) -> jax.Array:
    """SwiGLU of ONE expert (selected by ``e``, traced or static) on rows
    ``x`` (T, dim) -> f32 (T, dim) — same op order as the dense MLP branch of
    ``_layer_forward`` so quantized-vs-dense twins stay comparable.  Under TP
    the result is a row-parallel PARTIAL (caller psums once for the whole
    weighted expert sum, preserving the 2-collectives-per-layer pattern)."""
    if moe.gateup is not None:
        gu = _apply_expert(moe.gateup, e, x)
        gate, up = jnp.split(gu, 2, axis=-1)
    else:
        gate = _apply_expert(moe.gate, e, x)
        up = _apply_expert(moe.up, e, x)
    h = _act(cfg, gate).astype(up.dtype) * up
    return _apply_expert(moe.down, e, h, out_dtype=jnp.float32)


def moe_forward(
    moe: MoEParams,
    cfg: ModelConfig,
    x: jax.Array,  # (..., dim)
    axis_name: str | None = None,
    force_dense: bool | None = None,
) -> jax.Array:
    """Sparse-MoE MLP (HF MixtralSparseMoeBlock semantics): router softmax in
    f32, top-``experts_per_tok``, renormalize over the selected k, weighted
    sum of expert outputs.  Returns f32 ``(..., dim)`` (a partial under TP —
    the caller psums + casts, mirroring the dense row-parallel path).

    Trace-time dispatch between two exact strategies (no token dropping, no
    capacity factor — serving must not silently degrade output):

    * per-token (decode): each token ``dynamic_index``es its k experts out of
      the stacked weights and runs k GEMVs — HBM reads scale with the ACTIVE
      experts only.  Chosen when T*k <= n_experts (fewer expert-weight reads
      than touching every expert).
    * all-experts (prefill): a static loop over the E experts runs the full
      (T, dim) batch through each and masks by per-token routing weight —
      E/k x the ideal FLOPs, but every matmul is a large MXU-shaped GEMM and
      no gather/scatter appears in the graph.  The classic capacity-based
      dispatch trades exactness for FLOPs; on TPU the batched form wins for
      the modest E of the Mixtral family.
    """
    lead = x.shape[:-1]
    d = x.shape[-1]
    t = int(np.prod(lead)) if lead else 1
    xt = x.reshape(t, d)
    router_logits = moe.router(xt, out_dtype=jnp.float32)  # (T, E)
    probs = jax.nn.softmax(router_logits, axis=-1)
    top_w, top_i = jax.lax.top_k(probs, cfg.experts_per_tok)  # (T, k)
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    if axis_name is not None and getattr(moe.down, "bias", None) is not None:
        # a per-expert down bias would be added once per shard before the
        # psum; no supported family has expert biases, so fail loudly
        raise ValueError("expert down-projection bias is unsupported under TP")
    per_token = t * cfg.experts_per_tok <= cfg.n_experts
    if force_dense is not None:
        per_token = not force_dense
    if per_token:
        rows = []
        for ti in range(t):  # static: T is a trace-time shape
            acc = jnp.zeros((d,), jnp.float32)
            for j in range(cfg.experts_per_tok):
                y = _expert_ffn(moe, cfg, top_i[ti, j], xt[ti : ti + 1])
                acc = acc + top_w[ti, j] * y[0]
            rows.append(acc)
        out = jnp.stack(rows)
    else:
        out = jnp.zeros((t, d), jnp.float32)
        for e in range(cfg.n_experts):  # static loop over the expert stack
            y = _expert_ffn(moe, cfg, e, xt)
            w_e = jnp.sum(top_w * (top_i == e), axis=-1)  # (T,) routing mass
            out = out + w_e[:, None] * y
    return out.reshape(*lead, d)


def _layer_forward(
    lp: LayerParams,
    cfg: ModelConfig,
    x: jax.Array,  # (B, L, dim)
    positions: jax.Array,  # (B, L)
    k_cache: jax.Array,  # (B, max_len, Hk, D)
    v_cache: jax.Array,
    cache_len: jax.Array,  # i32 (B,): per-sequence TOTAL positions seen
    kv_positions: jax.Array,  # (B, rows) absolute position per cache slot
    kv_valid: jax.Array,  # (B, rows)
    axis_name: str | None = None,  # TP mesh axis; lp then holds LOCAL shards
    layer_idx: int = 0,  # selects the per-layer sliding window (Gemma-2)
    adapter_idx: jax.Array | None = None,  # (B,) per-row LoRA adapter (MultiLoRALinear)
):
    """One decoder block.  When ``axis_name`` is set (tensor parallelism via
    shard_map, see parallel/tp.py), ``lp``'s linears are local views —
    wq/wk/wv/w_gate/w_up column-parallel, wo/w_down row-parallel — and the
    two row-parallel outputs are psum'd (Megatron pattern: 2 collectives per
    block, inserted where XLA's latency-hiding scheduler can overlap them
    with the next fused dequant-matmul)."""
    b, l, _ = x.shape
    if lp.wqkv is not None:
        # local head counts from the fused width (exact: width scales 1/tp)
        full = (cfg.n_heads + 2 * cfg.n_kv_heads) * cfg.head_dim
        n_heads = cfg.n_heads * lp.wqkv.n_out // full
        n_kv = cfg.n_kv_heads * lp.wqkv.n_out // full
    else:
        n_heads = lp.wq.n_out // cfg.head_dim  # local under TP
        n_kv = lp.wk.n_out // cfg.head_dim

    # per-row adapter selection rides as a kwarg every linear accepts;
    # only MultiLoRALinear-wrapped targets consume it
    akw = {} if adapter_idx is None else dict(adapter_idx=adapter_idx)

    def _reduce(y, bias):
        # partials stay f32 until after the cross-shard sum (bf16 rounding of
        # per-shard partials would add O(tp) ulps of noise per layer)
        if axis_name is not None:
            y = jax.lax.psum(y, axis_name)
        if bias is not None:
            y = y + bias
        return y.astype(x.dtype)

    def _row_parallel(q_lin, h_in):
        out_dtype = jnp.float32 if axis_name is not None else None
        return q_lin(h_in, out_dtype=out_dtype, **akw)

    h = rms_norm(x, lp.attn_norm, cfg.rms_eps, cfg.norm_offset)
    if lp.wqkv is not None:
        qkv = lp.wqkv(h, **akw)
        qc, kc = n_heads * cfg.head_dim, n_kv * cfg.head_dim
        q, k, v = qkv[..., :qc], qkv[..., qc : qc + kc], qkv[..., qc + kc :]
        q = q.reshape(b, l, n_heads, cfg.head_dim)
        k = k.reshape(b, l, n_kv, cfg.head_dim)
        v = v.reshape(b, l, n_kv, cfg.head_dim)
    else:
        q = lp.wq(h, **akw).reshape(b, l, n_heads, cfg.head_dim)
        k = lp.wk(h, **akw).reshape(b, l, n_kv, cfg.head_dim)
        v = lp.wv(h, **akw).reshape(b, l, n_kv, cfg.head_dim)
    if lp.q_norm is not None:  # Qwen3: per-head q/k RMSNorm before RoPE
        q = rms_norm(q, lp.q_norm, cfg.rms_eps, cfg.norm_offset)
        k = rms_norm(k, lp.k_norm, cfg.rms_eps, cfg.norm_offset)
    q = rope(q, positions, cfg.rope_theta, cfg.rope_scaling)
    k = rope(k, positions, cfg.rope_theta, cfg.rope_scaling)
    # per-sequence write offsets, modulo the layer's ring size: vmapped
    # dynamic-update-slice over the batch.  For a full-size cache the mod is
    # the identity; for a rolling ring (sliding-window layers) the caller's
    # write-alignment contract (KVCache.zeros write_chunk) guarantees the L
    # rows never straddle the wrap point, so one DUS suffices.
    rows = k_cache.shape[1]
    upd = jax.vmap(lambda c, u, s: jax.lax.dynamic_update_slice_in_dim(c, u, s, axis=0))
    woff = jax.lax.rem(cache_len, jnp.int32(rows))
    k_cache = upd(k_cache, k.astype(k_cache.dtype), woff)
    v_cache = upd(v_cache, v.astype(v_cache.dtype), woff)
    attn = _attention(
        q, k_cache, v_cache, positions, kv_valid, kv_positions,
        cfg.layer_sliding_window(layer_idx), _attn_scale(cfg), cfg.attn_logit_softcap,
    )
    wo, wo_bias = _split_bias(lp.wo, axis_name)
    y = _reduce(_row_parallel(wo, attn.reshape(b, l, n_heads * cfg.head_dim)), wo_bias)
    if lp.post_attn_norm is not None:  # Gemma-2: norm the attention OUTPUT
        y = rms_norm(y, lp.post_attn_norm, cfg.rms_eps, cfg.norm_offset)
    x = x + y
    h = rms_norm(x, lp.mlp_norm, cfg.rms_eps, cfg.norm_offset)
    if lp.moe is not None:
        y = _reduce(moe_forward(lp.moe, cfg, h, axis_name=axis_name), None)
    else:
        if lp.w_gateup is not None:
            gu = lp.w_gateup(h, **akw)
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = lp.w_gate(h, **akw)
            up = lp.w_up(h, **akw)
        wd, wd_bias = _split_bias(lp.w_down, axis_name)
        y = _reduce(_row_parallel(wd, _act(cfg, gate).astype(up.dtype) * up), wd_bias)
    if lp.post_mlp_norm is not None:
        y = rms_norm(y, lp.post_mlp_norm, cfg.rms_eps, cfg.norm_offset)
    x = x + y
    return x, k_cache, v_cache


def _split_bias(q: QuantLinear, axis_name: str | None):
    """Row-parallel layers must add bias AFTER the psum (once, not per shard)."""
    if axis_name is None or q.bias is None:
        return q, None
    from .linear import LoRALinear, MultiLoRALinear

    if isinstance(q, (LoRALinear, MultiLoRALinear)):  # bias lives on the base
        return dataclasses.replace(q, base=dataclasses.replace(q.base, bias=None)), q.bias
    return dataclasses.replace(q, bias=None), q.bias


def has_multi_lora(params: ModelParams) -> bool:
    """True when any layer linear is a MultiLoRALinear (per-row adapter
    stacks) — such params require ``adapter_idx`` at every forward."""
    from .linear import MultiLoRALinear

    return any(
        isinstance(getattr(lp, f), MultiLoRALinear)
        for lp in params.layers
        for f in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
    )


def forward(
    params: ModelParams,
    cfg: ModelConfig,
    tokens: jax.Array,  # (B, L) i32
    cache: KVCache,
    positions: jax.Array | None = None,  # (B, L); default arange from cache.length
    last_only: bool = False,  # lm_head only on the final position (prefill)
    last_index: jax.Array | None = None,  # lm_head only on position last_index
    adapter_idx: jax.Array | None = None,  # (B,) per-row LoRA adapter index
) -> tuple[jax.Array, KVCache]:
    """Run L tokens through the model, appending to the cache.

    Returns (logits (B, L, vocab) f32, updated cache).  Works for prefill
    (L>1, cache empty) and decode (L=1) alike — under jit these trace to two
    separate specialized programs, the TPU analogue of the reference's
    runtime GEMV/GEMM dispatch (torch_bnb_fp4/__init__.py:592-617).

    ``adapter_idx``: (B,) i32 per-row LoRA adapter selection for
    MultiLoRALinear-wrapped params (models/lora.attach_multi_lora); REQUIRED
    exactly when the params carry multi-adapter stacks (a silent mismatch in
    either direction would serve the wrong weights).
    """
    if adapter_idx is None and has_multi_lora(params):
        raise ValueError(
            "params carry MultiLoRALinear adapters: forward() needs "
            "adapter_idx ((B,) i32; 0 = no adapter)"
        )
    if adapter_idx is not None and not has_multi_lora(params):
        raise ValueError("adapter_idx given but params have no MultiLoRALinear")
    b, l = tokens.shape
    if positions is None:
        positions = cache.length[:, None] + jnp.arange(l, dtype=jnp.int32)[None, :]
    x = embed_lookup(params.embed, tokens)
    if cfg.embed_scale:
        # Gemma scales embeddings by sqrt(dim) ROUNDED to the activation
        # dtype (HF multiplies by a bf16 normalizer tensor)
        x = x * jnp.asarray(cfg.dim**0.5, jnp.bfloat16)
    new_len = cache.length + l  # (B,)

    # per-ring-size slot->absolute-position recovery (memoized: at most two
    # distinct row counts per model — sliding rings and full layers).  Slot s
    # of an R-row ring holds the LATEST position p < new_len with
    # p === s (mod R); slots whose residue class has no written position yet
    # give p < 0 (invalid).  For a full-size cache this reduces exactly to
    # kv_positions = arange, kv_valid = pos < new_len.
    pos_by_rows: dict[int, tuple[jax.Array, jax.Array]] = {}

    def _kv_pos(rows: int):
        if rows not in pos_by_rows:
            last = new_len[:, None] - 1  # (B, 1)
            s = jnp.arange(rows, dtype=jnp.int32)[None, :]
            p = last - jnp.mod(last - s, rows)  # floor-mod: non-negative
            pos_by_rows[rows] = (p, p >= 0)
        return pos_by_rows[rows]

    ks, vs = [], []
    for i, lp in enumerate(params.layers):
        kv_positions, kv_valid = _kv_pos(cache.k[i].shape[1])
        x, kc, vc = _layer_forward(
            lp, cfg, x, positions, cache.k[i], cache.v[i], cache.length,
            kv_positions, kv_valid, layer_idx=i, adapter_idx=adapter_idx,
        )
        ks.append(kc)
        vs.append(vc)
    x = rms_norm(x, params.final_norm, cfg.rms_eps, cfg.norm_offset)
    if last_index is not None:
        # lm_head on ONE dynamic position (bucketed-padded prefill: the real
        # last token sits at true_len-1, not at -1) — at 32k vocab computing
        # all L rows of logits is L x the needed work
        x = jax.lax.dynamic_slice_in_dim(x, last_index, 1, axis=1)
    elif last_only:
        x = x[:, -1:]
    if isinstance(params.lm_head, (QuantLinear, DenseLinear)):
        logits = params.lm_head(x, out_dtype=jnp.float32)
    else:
        logits = (x.astype(jnp.float32) @ params.lm_head.astype(jnp.float32))
    if cfg.final_logit_softcap is not None:
        logits = cfg.final_logit_softcap * jnp.tanh(logits / cfg.final_logit_softcap)
    return logits, KVCache(k=ks, v=vs, length=new_len)


@partial(jax.jit, static_argnames=("cfg",))
def prefill(params: ModelParams, cfg: ModelConfig, tokens: jax.Array, cache: KVCache):
    """Prefill: run the prompt, return (last-position logits (B, vocab), cache).
    The lm_head runs only on the final position (the reference computes full
    logits for the whole prompt via HF generate; at 32k vocab that's L x the
    needed work)."""
    logits, cache = forward(params, cfg, tokens, cache, last_only=True)
    return logits[:, -1], cache


@partial(jax.jit, static_argnames=("cfg",))
def decode_step(params: ModelParams, cfg: ModelConfig, token: jax.Array, cache: KVCache):
    """One greedy decode step.  token (B,) i32 -> (next_token (B,), cache)."""
    logits, cache = forward(params, cfg, token[:, None], cache)
    return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache


def generate(
    params: ModelParams,
    cfg: ModelConfig,
    prompt: jax.Array,  # (B, Lp)
    max_new_tokens: int,
    max_len: int | None = None,
) -> jax.Array:
    """Greedy generation: returns (B, max_new_tokens) of generated tokens.

    The decode loop is a single jitted ``lax.scan`` — one XLA program for the
    whole generation, no per-token dispatch overhead (the reference pays a
    Python->C++->kernel round trip per layer per token).
    """
    b, lp = prompt.shape
    if max_len is None:
        max_len = lp + max_new_tokens
    cache = KVCache.zeros(cfg, b, max_len)
    first, cache = prefill(params, cfg, prompt, cache)
    first_tok = jnp.argmax(first, axis=-1).astype(jnp.int32)

    @partial(jax.jit, static_argnames=("cfg", "n"))
    def scan_decode(params, cfg, first_tok, cache, n):
        def step(carry, _):
            tok, cache = carry
            nxt, cache = forward(params, cfg, tok[:, None], cache)
            nxt = jnp.argmax(nxt[:, -1], axis=-1).astype(jnp.int32)
            return (nxt, cache), tok

        (_, _), toks = jax.lax.scan(step, (first_tok, cache), None, length=n)
        return toks.T  # (B, n)

    return scan_decode(params, cfg, first_tok, cache, max_new_tokens)


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------

def norm_names(cfg: ModelConfig) -> tuple[str, str, str | None, str | None]:
    """HF checkpoint names for (attn_norm, mlp_norm, post_attn_norm,
    post_mlp_norm).  NB the Gemma-2 trap: its ``post_attention_layernorm``
    really is the post-ATTENTION norm, while in every Llama-family model the
    same name is the PRE-MLP norm."""
    if cfg.post_norms:
        return ("input_layernorm", "pre_feedforward_layernorm",
                "post_attention_layernorm", "post_feedforward_layernorm")
    return ("input_layernorm", "post_attention_layernorm", None, None)


def _ql(w: np.ndarray, cfg: ModelConfig, bias: np.ndarray | None = None) -> QuantLinear:
    return quantize_linear(w, bias, blocksize=cfg.blocksize, quant_type=cfg.quant_type,
                           variant=cfg.variant)


def fuse_params(params: ModelParams, tp: int = 1) -> ModelParams:
    """Fuse QKV and gate|up in every layer (pairk only) — one kernel launch
    each instead of 3 + 2.  ``tp`` pre-interleaves columns per shard so
    column-parallel sharding stays a contiguous NamedSharding."""
    from .linear import fuse_linears

    def _fusable(*ls):
        return all(isinstance(l, QuantLinear) and l.layout == "pairk" for l in ls)

    def fuse_layer(lp: LayerParams) -> LayerParams:
        rep = {}
        if _fusable(lp.wq, lp.wk, lp.wv):
            rep.update(wqkv=fuse_linears([lp.wq, lp.wk, lp.wv], tp=tp),
                       wq=None, wk=None, wv=None)
        if _fusable(lp.w_gate, lp.w_up):
            rep.update(w_gateup=fuse_linears([lp.w_gate, lp.w_up], tp=tp),
                       w_gate=None, w_up=None)
        if lp.moe is not None and _fusable(lp.moe.gate, lp.moe.up):
            # fuse_linears operates on trailing axes, so the stacked expert
            # leaves (leading E axis) fuse in one call
            rep.update(moe=dataclasses.replace(
                lp.moe, gateup=fuse_linears([lp.moe.gate, lp.moe.up], tp=tp),
                gate=None, up=None))
        return dataclasses.replace(lp, **rep) if rep else lp

    return dataclasses.replace(params, layers=[fuse_layer(lp) for lp in params.layers])


def quantize_params(cfg: ModelConfig, weights: dict[str, np.ndarray], fuse: bool = False) -> ModelParams:
    """Build ModelParams from a dict of fp weights (HF llama naming, see
    convert/hf.py).  Quantizes every linear; embeddings/norms stay bf16.
    ``fuse=True`` additionally fuses QKV and gate|up (see fuse_params)."""
    layers = []
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."

        def q(name):  # optional Qwen2-style ``.bias`` rides along
            return _ql(weights[p + name + ".weight"], cfg, weights.get(p + name + ".bias"))

        if cfg.n_experts:
            ep = p + "block_sparse_moe.experts."
            # HF Mixtral expert naming: w1 = gate, w3 = up, w2 = down
            mlp = dict(moe=MoEParams(
                router=dense_linear(weights[p + "block_sparse_moe.gate.weight"]),
                gate=stack_linears([_ql(weights[f"{ep}{m}.w1.weight"], cfg)
                                    for m in range(cfg.n_experts)]),
                up=stack_linears([_ql(weights[f"{ep}{m}.w3.weight"], cfg)
                                  for m in range(cfg.n_experts)]),
                down=stack_linears([_ql(weights[f"{ep}{m}.w2.weight"], cfg)
                                    for m in range(cfg.n_experts)]),
            ))
        else:
            mlp = dict(
                w_gate=q("mlp.gate_proj"),
                w_up=q("mlp.up_proj"),
                w_down=q("mlp.down_proj"),
            )
        an, mn, pan, pmn = norm_names(cfg)
        if pan is not None:
            mlp.update(
                post_attn_norm=jnp.asarray(weights[p + pan + ".weight"], jnp.bfloat16),
                post_mlp_norm=jnp.asarray(weights[p + pmn + ".weight"], jnp.bfloat16),
            )
        if cfg.qk_norm:
            mlp.update(
                q_norm=jnp.asarray(weights[p + "self_attn.q_norm.weight"], jnp.bfloat16),
                k_norm=jnp.asarray(weights[p + "self_attn.k_norm.weight"], jnp.bfloat16),
            )
        layers.append(LayerParams(
            attn_norm=jnp.asarray(weights[p + an + ".weight"], jnp.bfloat16),
            wq=q("self_attn.q_proj"),
            wk=q("self_attn.k_proj"),
            wv=q("self_attn.v_proj"),
            wo=q("self_attn.o_proj"),
            mlp_norm=jnp.asarray(weights[p + mn + ".weight"], jnp.bfloat16),
            **mlp,
        ))
    if cfg.quantize_embed:
        from ..ops import format as fmt

        embed = quantize_embedding(
            weights["model.embed_tokens.weight"], cfg.blocksize,
            code=fmt.NF4_CODE if cfg.quant_type == "nf4" else fmt.FP4_CODE)
    else:
        embed = jnp.asarray(weights["model.embed_tokens.weight"], jnp.bfloat16)
    lm_w = weights.get("lm_head.weight")
    if lm_w is None:  # tied embeddings
        lm_w = weights["model.embed_tokens.weight"]
    if cfg.quantize_lm_head:
        lm_head = _ql(np.asarray(lm_w), cfg)
    else:
        lm_head = dense_linear(lm_w)
    params = ModelParams(
        embed=embed,
        layers=layers,
        final_norm=jnp.asarray(weights["model.norm.weight"], jnp.bfloat16),
        lm_head=lm_head,
    )
    return fuse_params(params) if fuse else params


def dense_params(cfg: ModelConfig, weights: dict[str, np.ndarray], dtype=jnp.bfloat16) -> ModelParams:
    """Unquantized ModelParams (DenseLinear everywhere): the bf16 twin used as
    the speed baseline and correctness oracle, running through the *same*
    forward/decode code as the quantized model."""

    def dl(name: str) -> DenseLinear:
        return dense_linear(weights[name + ".weight"], weights.get(name + ".bias"), dtype=dtype)

    layers = []
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        if cfg.n_experts:
            ep = p + "block_sparse_moe.experts."
            mlp = dict(moe=MoEParams(
                router=dl(p + "block_sparse_moe.gate"),
                gate=stack_linears([dl(f"{ep}{m}.w1") for m in range(cfg.n_experts)]),
                up=stack_linears([dl(f"{ep}{m}.w3") for m in range(cfg.n_experts)]),
                down=stack_linears([dl(f"{ep}{m}.w2") for m in range(cfg.n_experts)]),
            ))
        else:
            mlp = dict(
                w_gate=dl(p + "mlp.gate_proj"),
                w_up=dl(p + "mlp.up_proj"),
                w_down=dl(p + "mlp.down_proj"),
            )
        an, mn, pan, pmn = norm_names(cfg)
        if pan is not None:
            mlp.update(
                post_attn_norm=jnp.asarray(weights[p + pan + ".weight"], dtype),
                post_mlp_norm=jnp.asarray(weights[p + pmn + ".weight"], dtype),
            )
        if cfg.qk_norm:
            mlp.update(
                q_norm=jnp.asarray(weights[p + "self_attn.q_norm.weight"], dtype),
                k_norm=jnp.asarray(weights[p + "self_attn.k_norm.weight"], dtype),
            )
        layers.append(LayerParams(
            attn_norm=jnp.asarray(weights[p + an + ".weight"], dtype),
            wq=dl(p + "self_attn.q_proj"),
            wk=dl(p + "self_attn.k_proj"),
            wv=dl(p + "self_attn.v_proj"),
            wo=dl(p + "self_attn.o_proj"),
            mlp_norm=jnp.asarray(weights[p + mn + ".weight"], dtype),
            **mlp,
        ))
    lm_w = weights.get("lm_head.weight")
    if lm_w is None:
        lm_w = weights["model.embed_tokens.weight"]
    return ModelParams(
        embed=jnp.asarray(weights["model.embed_tokens.weight"], dtype),
        layers=layers,
        final_norm=jnp.asarray(weights["model.norm.weight"], dtype),
        lm_head=dense_linear(lm_w, dtype=dtype),
    )


def random_weights(cfg: ModelConfig, seed: int = 0, scale: float = 0.02) -> dict[str, np.ndarray]:
    """Random fp32 weights in HF llama naming — for tests and benchmarks."""
    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    out = {
        "model.embed_tokens.weight": w(cfg.vocab_size, cfg.dim),
        "model.norm.weight": np.ones(cfg.dim, np.float32),
        "lm_head.weight": w(cfg.vocab_size, cfg.dim),
    }
    kv_dim = cfg.n_kv_heads * cfg.head_dim
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        for nname in norm_names(cfg):
            if nname is not None:
                out[p + nname + ".weight"] = np.ones(cfg.dim, np.float32)
        out[p + "self_attn.q_proj.weight"] = w(cfg.q_dim, cfg.dim)
        out[p + "self_attn.k_proj.weight"] = w(kv_dim, cfg.dim)
        out[p + "self_attn.v_proj.weight"] = w(kv_dim, cfg.dim)
        out[p + "self_attn.o_proj.weight"] = w(cfg.dim, cfg.q_dim)
        if cfg.attn_bias:  # Qwen2-style q/k/v bias
            out[p + "self_attn.q_proj.bias"] = w(cfg.q_dim)
            out[p + "self_attn.k_proj.bias"] = w(kv_dim)
            out[p + "self_attn.v_proj.bias"] = w(kv_dim)
        if cfg.qk_norm:  # Qwen3 per-head q/k norms
            out[p + "self_attn.q_norm.weight"] = np.ones(cfg.head_dim, np.float32)
            out[p + "self_attn.k_norm.weight"] = np.ones(cfg.head_dim, np.float32)
        if cfg.n_experts:
            out[p + "block_sparse_moe.gate.weight"] = w(cfg.n_experts, cfg.dim)
            for m in range(cfg.n_experts):
                ep = p + f"block_sparse_moe.experts.{m}."
                out[ep + "w1.weight"] = w(cfg.ffn_dim, cfg.dim)
                out[ep + "w2.weight"] = w(cfg.dim, cfg.ffn_dim)
                out[ep + "w3.weight"] = w(cfg.ffn_dim, cfg.dim)
        else:
            out[p + "mlp.gate_proj.weight"] = w(cfg.ffn_dim, cfg.dim)
            out[p + "mlp.up_proj.weight"] = w(cfg.ffn_dim, cfg.dim)
            out[p + "mlp.down_proj.weight"] = w(cfg.dim, cfg.ffn_dim)
    return out


def reference_forward(cfg: ModelConfig, weights: dict[str, np.ndarray], tokens: np.ndarray) -> jax.Array:
    """Unquantized bf16 forward (no cache) — the twin-model correctness oracle
    (reference sanity_check.py:130-171 pattern).  Returns logits (B, L, V)."""
    b, l = tokens.shape

    def lin(name, x):
        wt = jnp.asarray(weights[name], jnp.float32).T.astype(jnp.bfloat16)
        y = x @ wt
        b = weights.get(name.replace(".weight", ".bias"))
        return y if b is None else y + jnp.asarray(b, jnp.float32).astype(y.dtype)

    x = jnp.asarray(weights["model.embed_tokens.weight"], jnp.bfloat16)[tokens]
    if cfg.embed_scale:
        x = x * jnp.asarray(cfg.dim**0.5, jnp.bfloat16)
    positions = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32), (b, l))
    kv_positions = positions
    kv_valid = jnp.ones((b, l), bool)
    an, mn, pan, pmn = norm_names(cfg)
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."

        def nrm(y, name):
            return rms_norm(y, jnp.asarray(weights[p + name + ".weight"], jnp.bfloat16),
                            cfg.rms_eps, cfg.norm_offset)

        h = nrm(x, an)
        q = lin(p + "self_attn.q_proj.weight", h).reshape(b, l, cfg.n_heads, cfg.head_dim)
        k = lin(p + "self_attn.k_proj.weight", h).reshape(b, l, cfg.n_kv_heads, cfg.head_dim)
        v = lin(p + "self_attn.v_proj.weight", h).reshape(b, l, cfg.n_kv_heads, cfg.head_dim)
        if cfg.qk_norm:  # Qwen3 per-head q/k norms, before RoPE
            q = rms_norm(q, jnp.asarray(weights[p + "self_attn.q_norm.weight"],
                                        jnp.bfloat16), cfg.rms_eps, cfg.norm_offset)
            k = rms_norm(k, jnp.asarray(weights[p + "self_attn.k_norm.weight"],
                                        jnp.bfloat16), cfg.rms_eps, cfg.norm_offset)
        q = rope(q, positions, cfg.rope_theta, cfg.rope_scaling)
        k = rope(k, positions, cfg.rope_theta, cfg.rope_scaling)
        attn = _attention(q, k, v, positions, kv_valid, kv_positions,
                          cfg.layer_sliding_window(i), _attn_scale(cfg),
                          cfg.attn_logit_softcap)
        y = lin(p + "self_attn.o_proj.weight", attn.reshape(b, l, cfg.q_dim))
        if pan is not None:
            y = nrm(y, pan)
        x = x + y
        h = nrm(x, mn)
        if cfg.n_experts:
            hf = h.reshape(b * l, cfg.dim)
            rl = (hf.astype(jnp.float32)
                  @ jnp.asarray(weights[p + "block_sparse_moe.gate.weight"], jnp.float32).T)
            probs = jax.nn.softmax(rl, axis=-1)
            top_w, top_i = jax.lax.top_k(probs, cfg.experts_per_tok)
            top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
            acc = jnp.zeros((b * l, cfg.dim), jnp.float32)
            for m in range(cfg.n_experts):
                ep = p + f"block_sparse_moe.experts.{m}."
                g = lin(ep + "w1.weight", hf)
                u = lin(ep + "w3.weight", hf)
                y = lin(ep + "w2.weight", _act(cfg, g).astype(u.dtype) * u)
                w_m = jnp.sum(top_w * (top_i == m), axis=-1)
                acc = acc + w_m[:, None] * y.astype(jnp.float32)
            x = x + acc.reshape(b, l, cfg.dim).astype(x.dtype)
        else:
            gate = lin(p + "mlp.gate_proj.weight", h)
            up = lin(p + "mlp.up_proj.weight", h)
            y = lin(p + "mlp.down_proj.weight", _act(cfg, gate).astype(up.dtype) * up)
            if pmn is not None:
                y = nrm(y, pmn)
            x = x + y
    x = rms_norm(x, jnp.asarray(weights["model.norm.weight"], jnp.bfloat16), cfg.rms_eps, cfg.norm_offset)
    logits = x.astype(jnp.float32) @ jnp.asarray(weights["lm_head.weight"], jnp.float32).T
    if cfg.final_logit_softcap is not None:
        logits = cfg.final_logit_softcap * jnp.tanh(logits / cfg.final_logit_softcap)
    return logits
