"""Tensor + data parallelism over a JAX device mesh (shard_map + collectives).

The reference is single-process single-GPU (SURVEY.md §2.3: no
torch.distributed anywhere); this subsystem exists because the north star
(BASELINE.json:5) demands FP4-packed weights and KV cache tensor-sharded over
a TPU pod slice with collectives overlapped against the fused dequant-matmul
kernels.  TPU-native mechanism: a ``(data, model)`` `jax.sharding.Mesh`,
`NamedSharding` on every pytree leaf, and one `shard_map` around the whole
decoder step so the Pallas kernels see local shards and the only collectives
are two `psum`s per block (Megatron column/row pattern) — XLA's latency-hiding
scheduler overlaps them with the next layer's kernels.

Sharding of the FP4 format respects its two granularities (SURVEY.md §7 "Hard
parts"): shard boundaries land on byte (2-weight) and quantization-block
(``blocksize``-weight) edges by construction —
  * column-parallel (wq/wk/wv/w_gate/w_up): shard dim 1 (N lanes, 128-aligned)
    of packed/absmax, bias over "model";
  * row-parallel (wo/w_down): packed with ``k_shards = tp`` (see
    ops/format.pack_tpu_sharded) so dim 0 of packed and of each absmax half
    shards contiguously and each device holds a self-contained packing of
    exactly the features its column-parallel shard produced;
  * KV cache: heads over "model", batch over "data";
  * lm_head: vocab over "model" — logits stay vocab-sharded, argmax happens
    on the sharded global array (no gather on the decode hot path).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import transformer as T
from ..models.linear import DenseLinear, QuantLinear, local_view

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_multihost(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> int:
    """Multi-host bring-up (SURVEY.md §2.3): `jax.distributed.initialize` —
    afterwards `jax.devices()` spans the slice and the same mesh/shard_map
    code runs across hosts (GSPMD routes collectives over ICI/DCN).  On TPU
    pods all args auto-detect from the metadata server.  Returns process id."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def make_mesh(n_model: int | None = None, n_data: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh.  Default: all devices on the model axis."""
    if devices is None:
        devices = jax.devices()
    if n_model is None:
        n_model = len(devices) // n_data
    devices = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def validate_tp(cfg: T.ModelConfig, tp: int) -> None:
    """Check the geometry admits a model-axis width of ``tp``."""
    kv_dim = cfg.n_kv_heads * cfg.head_dim
    ok = (
        cfg.n_heads % tp == 0
        and cfg.n_kv_heads % tp == 0
        and (kv_dim // tp) % 128 == 0
        and (cfg.dim // tp) % 128 == 0
        and (cfg.q_dim // tp) % 128 == 0  # o_proj K when head_dim decoupled
        and (cfg.ffn_dim // tp) % 128 == 0
        and cfg.dim % (tp * 2 * cfg.blocksize) == 0
        and cfg.q_dim % (tp * 2 * cfg.blocksize) == 0
        and cfg.ffn_dim % (tp * 2 * cfg.blocksize) == 0
        and cfg.vocab_size % tp == 0
    )
    if not ok:
        raise ValueError(f"geometry {cfg} does not shard over tp={tp}")


def quantize_params_tp(cfg: T.ModelConfig, weights: dict, tp: int, fuse: bool = False) -> T.ModelParams:
    """models.quantize_params, arranged for a model-axis width of ``tp``.

    The pairk layout (FP4 default) shards contiguously in both dims, so the
    plain packing already works — only the geometry is validated.  splitk
    (NF4) row-parallel layers (wo, w_down) are re-packed with ``k_shards=tp``
    so their K axis shards contiguously."""
    validate_tp(cfg, tp)
    params = T.quantize_params(cfg, weights)
    if params.layers[0].wo.layout == "pairk":
        return T.fuse_params(params, tp=tp) if fuse else params
    assert not fuse, "fusion is pairk-only"

    def requant(name_suffix: str, i: int) -> QuantLinear:
        w = weights[f"model.layers.{i}.{name_suffix}.weight"]
        from ..models.linear import quantize_linear

        return quantize_linear(w, blocksize=cfg.blocksize, quant_type=cfg.quant_type, k_shards=tp)

    layers = [
        dataclasses.replace(
            lp,
            wo=requant("self_attn.o_proj", i),
            w_down=requant("mlp.down_proj", i),
        )
        for i, lp in enumerate(params.layers)
    ]
    return dataclasses.replace(params, layers=layers)


# ---------------------------------------------------------------------------
# Partition specs
# ---------------------------------------------------------------------------

_COL = dict(packed=P(None, MODEL_AXIS), absmax_hi=P(None, MODEL_AXIS), absmax_lo=P(None, MODEL_AXIS), bias=P(MODEL_AXIS), codebook=P(None), w=P(None, MODEL_AXIS), w8=P(None, MODEL_AXIS), w8_scale=P(None, MODEL_AXIS))
_ROW = dict(packed=P(MODEL_AXIS, None), absmax_hi=P(MODEL_AXIS, None), absmax_lo=P(MODEL_AXIS, None), bias=P(None), codebook=P(None), w=P(MODEL_AXIS, None), w8=P(MODEL_AXIS, None), w8_scale=P(MODEL_AXIS, None))
_ROW_PARALLEL = ("wo", "w_down")


def _ql_field_spec(path, leaf=None) -> P:
    """Spec for one leaf of a QuantLinear given its tree path."""
    names = [getattr(k, "name", None) for k in path]
    field = names[-1]
    parent = names[-2] if len(names) >= 2 else None
    if parent == "base":  # LoRALinear wraps the target; the TARGET name decides
        parent = names[-3]
    if field == "scale":  # MultiLoRALinear per-adapter (L,) scales: replicated
        return P(None)
    if field in ("a", "b"):
        # LoRA factors (models/linear.LoRALinear): column-parallel targets
        # replicate a / shard b's output dim; row-parallel targets shard a's
        # input dim (delta partials ride the base's psum) / replicate b.
        # MultiLoRALinear stacks add a leading adapter axis, replicated.
        row = parent in _ROW_PARALLEL
        stacked = leaf is not None and leaf.ndim == 3
        if field == "a":
            spec = P(MODEL_AXIS, None) if row else P(None, None)
        else:
            spec = P(None, None) if row else P(None, MODEL_AXIS)
        return P(None, *spec) if stacked else spec
    table = _ROW if parent in _ROW_PARALLEL else _COL
    return table[field]


def _moe_field_spec(path, leaf) -> P:
    """Spec for a leaf under a LayerParams.moe subtree.  Expert weights are
    STACKED (leading n_experts axis, models/transformer.stack_linears): the
    expert axis is replicated and the per-expert trailing axes shard exactly
    like the dense MLP — gate/up/gateup column-parallel, down row-parallel.
    The router is replicated (n_experts outputs don't shard; routing must be
    identical on every device so all shards run the same experts)."""
    names = [getattr(k, "name", None) for k in path]
    field = names[-1]
    parent = names[-2]
    if parent == "router":
        return P(*([None] * leaf.ndim))
    if field == "codebook":
        return P(*([None] * leaf.ndim))
    if field == "bias":  # stacked (E, n)
        return P(None, MODEL_AXIS) if parent != "down" else P(None, None)
    # packed/absmax_hi/absmax_lo/w: stacked (E, K-ish, N-ish)
    if parent == "down":
        return P(None, MODEL_AXIS, None)
    return P(None, None, MODEL_AXIS)


def param_specs(params: T.ModelParams) -> T.ModelParams:
    """Same-structure pytree of PartitionSpecs for ModelParams."""

    def spec(path, leaf):
        names = [getattr(k, "name", None) for k in path]
        if "embed" in names or "final_norm" in names or names[-1] in (
            "attn_norm", "mlp_norm", "post_attn_norm", "post_mlp_norm",
            "q_norm", "k_norm"
        ):
            return P(*([None] * leaf.ndim))
        if "moe" in names:
            return _moe_field_spec(path, leaf)
        if "lm_head" in names:
            if names[-1] == "lm_head" and leaf.ndim == 2:
                return P(None, MODEL_AXIS)  # raw bf16 (dim, vocab)
            if names[-1] == "w":
                return P(None, MODEL_AXIS)  # DenseLinear, vocab-sharded
            if names[-1] == "bias":
                return P(MODEL_AXIS)
            return _ql_field_spec(path, leaf)  # quantized lm_head: column-parallel
        return _ql_field_spec(path, leaf)

    return jax.tree_util.tree_map_with_path(spec, params)


def cache_specs(cache: T.KVCache, data_sharded: bool = True) -> T.KVCache:
    """``data_sharded=False`` gives batch-replicated specs — used for the
    engine's batch-1 prefill program, which every data replica computes
    identically (prefill is rare; decode is the data-sharded hot loop)."""
    batch = DATA_AXIS if data_sharded else None

    def spec(path, leaf):
        if leaf.ndim == 4:
            return P(batch, None, MODEL_AXIS, None)
        return P(batch)  # per-sequence lengths (B,)

    return jax.tree_util.tree_map_with_path(spec, cache)


def _put_sharded(x, spec, mesh: Mesh):
    """Place one leaf against its NamedSharding.  Single process:
    device_put.  Multi-process (mesh spans hosts, where device_put of a
    host-local array is illegal): every process holds the same full array
    (same checkpoint / same seed) and contributes its addressable shards via
    make_array_from_callback."""
    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    a = np.asarray(jax.device_get(x))
    return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])


def shard_params(params: T.ModelParams, mesh: Mesh) -> T.ModelParams:
    """Shard every param leaf against its spec (works single- or
    multi-process; see _put_sharded)."""
    specs = param_specs(params)
    return jax.tree.map(lambda x, s: _put_sharded(x, s, mesh), params, specs)


def shard_cache(cache: T.KVCache, mesh: Mesh) -> T.KVCache:
    specs = cache_specs(cache)
    return jax.tree.map(lambda x, s: _put_sharded(x, s, mesh), cache, specs)


# ---------------------------------------------------------------------------
# shard_map'd forward
# ---------------------------------------------------------------------------


def _localize_params(params: T.ModelParams, cfg: T.ModelConfig, tp: int) -> T.ModelParams:
    """Rewrite static shape metadata to per-device values (leaves are already
    local inside shard_map)."""

    def loc_moe(moe):
        if moe is None:
            return None
        return dataclasses.replace(
            moe,
            gate=None if moe.gate is None else local_view(moe.gate, n_parts=tp),
            up=None if moe.up is None else local_view(moe.up, n_parts=tp),
            gateup=None if moe.gateup is None else local_view(moe.gateup, n_parts=tp),
            down=local_view(moe.down, k_parts=tp),
        )

    def loc_layer(lp: T.LayerParams) -> T.LayerParams:
        if lp.wqkv is not None:
            return dataclasses.replace(
                lp,
                wqkv=local_view(lp.wqkv, n_parts=tp),
                wo=local_view(lp.wo, k_parts=tp),
                moe=loc_moe(lp.moe),
                **(
                    dict(w_gateup=local_view(lp.w_gateup, n_parts=tp))
                    if lp.w_gateup is not None else {}
                ),
                **(dict(w_down=local_view(lp.w_down, k_parts=tp))
                   if lp.w_down is not None else {}),
            )
        return dataclasses.replace(
            lp,
            wq=local_view(lp.wq, n_parts=tp),
            wk=local_view(lp.wk, n_parts=tp),
            wv=local_view(lp.wv, n_parts=tp),
            wo=local_view(lp.wo, k_parts=tp),
            moe=loc_moe(lp.moe),
            **(dict(w_gate=local_view(lp.w_gate, n_parts=tp),
                    w_up=local_view(lp.w_up, n_parts=tp))
               if lp.w_gate is not None else {}),
            **(dict(w_down=local_view(lp.w_down, k_parts=tp))
               if lp.w_down is not None else {}),
        )

    lm_head = params.lm_head
    if isinstance(lm_head, QuantLinear):
        lm_head = local_view(lm_head, n_parts=tp)
    elif isinstance(lm_head, DenseLinear):
        lm_head = dataclasses.replace(lm_head, n_out=lm_head.n_out // tp)
    return dataclasses.replace(
        params, layers=[loc_layer(lp) for lp in params.layers], lm_head=lm_head
    )


def _tp_body(params, tokens, cache, last_index, cfg: T.ModelConfig, tp: int,
             adapter_idx=None):
    """Per-device forward: tokens (b_loc, L) -> (logits (b_loc, L, V/tp), cache).
    ``last_index`` None -> logits for all L positions; else a scalar position
    p -> logits only for position p (prefill lm_head economy).
    ``adapter_idx``: (b_loc,) per-row LoRA adapter (MultiLoRALinear stacks
    replicate over the model axis; the index shards with the batch)."""
    params = _localize_params(params, cfg, tp)
    b, l = tokens.shape
    positions = cache.length[:, None] + jnp.arange(l, dtype=jnp.int32)[None, :]
    x = T.embed_lookup(params.embed, tokens)
    if cfg.embed_scale:  # Gemma: sqrt(dim) in bf16, matching models.forward
        x = x * jnp.asarray(cfg.dim**0.5, jnp.bfloat16)
    new_len = cache.length + l  # (b_loc,)
    # ring-aware slot->position recovery, memoized per row count (mirrors
    # models.transformer.forward; identity for full-size caches)
    pos_by_rows = {}

    def _kv_pos(rows: int):
        if rows not in pos_by_rows:
            last = new_len[:, None] - 1
            s = jnp.arange(rows, dtype=jnp.int32)[None, :]
            p = last - jnp.mod(last - s, rows)
            pos_by_rows[rows] = (p, p >= 0)
        return pos_by_rows[rows]

    ks, vs = [], []
    for i, lp in enumerate(params.layers):
        kv_positions, kv_valid = _kv_pos(cache.k[i].shape[1])
        x, kc, vc = T._layer_forward(
            lp, cfg, x, positions, cache.k[i], cache.v[i], cache.length,
            kv_positions, kv_valid, axis_name=MODEL_AXIS, layer_idx=i,
            adapter_idx=adapter_idx,
        )
        ks.append(kc)
        vs.append(vc)
    x = T.rms_norm(x, params.final_norm, cfg.rms_eps, cfg.norm_offset)
    if last_index is not None:
        x = jax.lax.dynamic_slice_in_dim(x, last_index, 1, axis=1)
    if isinstance(params.lm_head, (QuantLinear, DenseLinear)):
        logits = params.lm_head(x, out_dtype=jnp.float32)
    else:
        logits = x.astype(jnp.float32) @ params.lm_head.astype(jnp.float32)
    if cfg.final_logit_softcap is not None:  # elementwise: vocab-sharding safe
        logits = cfg.final_logit_softcap * jnp.tanh(logits / cfg.final_logit_softcap)
    return logits, T.KVCache(k=ks, v=vs, length=new_len)


def tp_forward_fn(params: T.ModelParams, cfg: T.ModelConfig, cache: T.KVCache, mesh: Mesh,
                  data_sharded: bool = True, with_last_index: bool = False,
                  with_adapter_idx: bool = False):
    """Build the shard_map'd forward for this param/cache structure.

    Returned fn: (params, tokens (B, L), cache) -> (logits (B, L, V) sharded
    P(data, None, model), new cache).  Jit-compatible.

    ``data_sharded=False`` replicates the batch over the data axis (the
    engine's per-request prefill program).  ``with_last_index=True`` adds a
    trailing scalar arg: the one position to run lm_head on.
    ``with_adapter_idx=True`` adds a trailing (B,) i32 arg (after last_index
    when both): the per-row LoRA adapter selection for MultiLoRALinear
    params; it shards with the batch.
    """
    tp = mesh.shape[MODEL_AXIS]
    pspecs = param_specs(params)
    cspecs = cache_specs(cache, data_sharded=data_sharded)
    batch = DATA_AXIS if data_sharded else None
    extra: tuple = ()
    if with_last_index and with_adapter_idx:
        body = lambda p, t, c, li, ai: _tp_body(p, t, c, li, cfg=cfg, tp=tp, adapter_idx=ai)
        extra = (P(), P(batch))
    elif with_last_index:
        body, extra = partial(_tp_body, cfg=cfg, tp=tp), (P(),)
    elif with_adapter_idx:
        body = lambda p, t, c, ai: _tp_body(p, t, c, None, cfg=cfg, tp=tp, adapter_idx=ai)
        extra = (P(batch),)
    else:
        body = lambda p, t, c: _tp_body(p, t, c, None, cfg=cfg, tp=tp)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(pspecs, P(batch, None), cspecs) + extra,
        out_specs=(P(batch, None, MODEL_AXIS), cspecs),
        check_vma=False,
    )


def make_decode_step(params: T.ModelParams, cfg: T.ModelConfig, cache: T.KVCache, mesh: Mesh):
    """Jitted greedy decode step over the mesh: (params, token (B,), cache) ->
    (next_token (B,), cache).  Argmax runs on the vocab-sharded logits."""
    fwd = tp_forward_fn(params, cfg, cache, mesh)

    @jax.jit
    def step(params, token, cache):
        logits, cache = fwd(params, token[:, None], cache)
        return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

    return step


def make_prefill(params: T.ModelParams, cfg: T.ModelConfig, cache: T.KVCache, mesh: Mesh):
    fwd = tp_forward_fn(params, cfg, cache, mesh)

    @jax.jit
    def pre(params, tokens, cache):
        logits, cache = fwd(params, tokens, cache)
        return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

    return pre
