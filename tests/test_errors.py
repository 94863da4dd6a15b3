"""Negative-path tests: user-facing entry points raise informative
ValueErrors instead of bare asserts (reference parity: TORCH_CHECK discipline
in csrc/torch_fp4.cpp:19-20 and gemv_fp4_optimized.cu:301-361; round-1
VERDICT flagged the assert-based checks as strippable under python -O)."""

import jax.numpy as jnp
import numpy as np
import pytest

from torch_bnb_fp4_tpu.models import linear as L
from torch_bnb_fp4_tpu.ops import format as fmt
from torch_bnb_fp4_tpu.ops import kernels as K


@pytest.fixture(scope="module")
def layer():
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((128, 1024)) * 0.1).astype(np.float32)
    return L.quantize_linear(w)


def test_apply_linear_wrong_k(layer):
    with pytest.raises(ValueError, match="k_in=1024"):
        layer(jnp.zeros((2, 999), jnp.float32), interpret=True)


def test_quantize_linear_bad_inputs():
    w3 = np.zeros((2, 4, 8), np.float32)
    with pytest.raises(ValueError, match="2-D"):
        L.quantize_linear(w3)
    w = np.zeros((128, 1024), np.float32)
    with pytest.raises(ValueError, match="quant_type"):
        L.quantize_linear(w, quant_type="int8")
    # nf4 + pairk is now the LUT fast path (no longer an error)
    q = L.quantize_linear(w, quant_type="nf4", layout="pairk")
    assert q.variant == "lut" and q.codebook is not None
    with pytest.raises(ValueError, match="k_shards"):
        L.quantize_linear(w, layout="pairk", k_shards=2)
    with pytest.raises(ValueError, match="variant"):
        L.quantize_linear(w, variant="turbo")
    with pytest.raises(ValueError, match="layout"):
        L.quantize_linear(w, layout="rowmajor")


def test_matmul_pk_shape_and_dtype_checks(layer):
    packed, scale = layer.packed, layer.absmax_hi
    with pytest.raises(ValueError, match=r"x must be \(M, K=1024\)"):
        K.matmul_fp4_pk(jnp.zeros((2, 512), jnp.bfloat16), packed, scale, variant="exact", interpret=True)
    with pytest.raises(ValueError, match="scale must be"):
        K.matmul_fp4_pk(jnp.zeros((2, 1024), jnp.bfloat16), packed, scale[:-1], variant="exact", interpret=True)
    with pytest.raises(ValueError, match="uint8"):
        K.matmul_fp4_pk(jnp.zeros((2, 1024), jnp.bfloat16),
                        packed.astype(jnp.int32), scale, variant="exact", interpret=True)
    with pytest.raises(ValueError, match="variant"):
        K.matmul_fp4_pk(jnp.zeros((2, 1024), jnp.bfloat16), packed, scale,
                        variant="turbo", interpret=True)
    with pytest.raises(ValueError, match="batch-1"):
        K.gemv_fp4_pk(jnp.zeros((2, 1024), jnp.bfloat16), packed, scale, variant="exact", interpret=True)


def test_splitk_absmax_shape_check(rng):
    w = (rng.standard_normal((128, 1024)) * 0.1).astype(np.float32)
    packed, absmax = fmt.pack_tpu(w)
    x = jnp.zeros((2, 1024), jnp.float32)
    with pytest.raises(ValueError, match="absmax must be"):
        K.matmul_fp4(x, jnp.asarray(packed), jnp.asarray(absmax[:-1]), interpret=True)
    with pytest.raises(ValueError, match=r"x must be \(M, K=1024\)"):
        K.matmul_fp4(jnp.zeros((2, 555), jnp.float32), jnp.asarray(packed),
                     jnp.asarray(absmax), interpret=True)


def test_pack_tpu_pairk_bad_k():
    with pytest.raises(ValueError, match="divisible"):
        fmt.pack_tpu_pairk(np.zeros((4, 100), np.float32))


def test_engine_rejects_bad_batch_over_data_mesh():
    from torch_bnb_fp4_tpu.models import ModelConfig, quantize_params
    from torch_bnb_fp4_tpu.models import transformer as T
    from torch_bnb_fp4_tpu.parallel import make_mesh, shard_params
    from torch_bnb_fp4_tpu.serve import Engine, EngineConfig

    cfg = ModelConfig.tiny_test(n_layers=1)
    params = quantize_params(cfg, T.random_weights(cfg, seed=1))
    mesh = make_mesh(n_model=2, n_data=2)
    with pytest.raises(ValueError, match="max_batch"):
        Engine(shard_params(params, mesh), cfg, EngineConfig(max_batch=3), mesh=mesh)


def test_engine_rejects_empty_prompt():
    from torch_bnb_fp4_tpu.models import ModelConfig, quantize_params
    from torch_bnb_fp4_tpu.models import transformer as T
    from torch_bnb_fp4_tpu.serve import Engine, EngineConfig, Request

    cfg = ModelConfig.tiny_test(n_layers=1)
    eng = Engine(quantize_params(cfg, T.random_weights(cfg, seed=2)), cfg,
                 EngineConfig(max_batch=1, max_len=8))
    with pytest.raises(ValueError, match="empty prompt"):
        eng.submit(Request(uid=1, prompt=[], max_new_tokens=2))
