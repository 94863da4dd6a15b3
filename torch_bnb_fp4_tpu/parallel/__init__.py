from .tp import (
    DATA_AXIS,
    MODEL_AXIS,
    cache_specs,
    make_decode_step,
    make_mesh,
    make_prefill,
    param_specs,
    quantize_params_tp,
    shard_cache,
    shard_params,
    tp_forward_fn,
    validate_tp,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "validate_tp",
    "quantize_params_tp",
    "param_specs",
    "cache_specs",
    "shard_params",
    "shard_cache",
    "tp_forward_fn",
    "make_decode_step",
    "make_prefill",
]
