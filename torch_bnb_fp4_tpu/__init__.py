"""torch_bnb_fp4_tpu — TPU-native FP4 weight-only inference framework.

Public API surface (counterpart of the reference's torch_bnb_fp4/__init__.py,
re-organized TPU-first — see README.md capability map):

  ops.format        FP4/NF4 format spec + golden model
  ops.kernels       Pallas kernels (dequantize_tpu, matmul_fp4, gemv_fp4)
  models            QuantLinear / DenseLinear, transformer, generate
  convert           HF -> packed checkpoint tooling
  parallel          mesh + tensor/data parallelism
  serve             continuous-batching engine
  utils             profiling / roofline / synthetic models
  compat            the reference's exact API, name for name (docs/MIGRATING.md)
"""

from . import compat, convert, models, ops, parallel, serve, utils
from .models import (
    DenseLinear,
    KVCache,
    ModelConfig,
    ModelParams,
    QuantEmbedding,
    QuantLinear,
    apply_linear,
    dequantize_weight,
    forward,
    generate,
    quantize_embedding,
    quantize_linear,
    quantize_params,
)

__version__ = "0.1.0"

__all__ = [
    "compat",
    "convert",
    "models",
    "ops",
    "parallel",
    "serve",
    "utils",
    "QuantLinear",
    "DenseLinear",
    "ModelConfig",
    "ModelParams",
    "KVCache",
    "quantize_linear",
    "QuantEmbedding",
    "quantize_embedding",
    "apply_linear",
    "dequantize_weight",
    "quantize_params",
    "forward",
    "generate",
    "__version__",
]
