"""Perplexity harness test: FP4 and the bf16 twin of the same floats score
within a small NLL delta of each other (the deployment-equivalence quantity
the north star's "match perplexity at 4-bit" asks for, runnable without
downloading real weights)."""

import sys

import numpy as np
import pytest

from torch_bnb_fp4_tpu.models import ModelConfig, dense_params, quantize_params
from torch_bnb_fp4_tpu.models import transformer as T

# multi-second scan/compile tests: deselect with -m 'not slow' (<2min fast path)
pytestmark = pytest.mark.slow

sys.path.insert(0, "examples")


def test_fp4_nll_tracks_bf16_twin():
    from perplexity import nll_of_stream

    cfg = ModelConfig.tiny_test(n_layers=2)
    weights = T.random_weights(cfg, seed=23)
    fp4 = quantize_params(cfg, weights, fuse=True)
    twin = dense_params(cfg, weights)
    tokens = np.random.default_rng(1).integers(0, cfg.vocab_size, 4 * 64)

    nll_q, n = nll_of_stream(fp4, cfg, tokens, seq_len=64)
    nll_b, _ = nll_of_stream(twin, cfg, tokens, seq_len=64)
    assert n == 4 * 63
    # same floats, FP4-quantized vs bf16: the NLL delta is the quantization
    # effect alone and must be small (random-weight logits are near-uniform,
    # so this is a tight consistency check, not a real-text PPL)
    assert abs(nll_q - nll_b) < 0.05, (nll_q, nll_b)
    # and in a sane range at all (near log(vocab) for random weights)
    assert 0.5 * np.log(cfg.vocab_size) < nll_q < 1.5 * np.log(cfg.vocab_size)


def test_perplexity_cli(tmp_path, capsys):
    from test_convert import _write_hf_checkpoint  # fixture helper

    from torch_bnb_fp4_tpu.convert import convert_hf_model

    cfg = ModelConfig.tiny_test(n_layers=1)
    weights = T.random_weights(cfg, seed=24)
    _write_hf_checkpoint(tmp_path / "hf", cfg, weights)
    convert_hf_model(str(tmp_path / "hf"), str(tmp_path / "out"), verbose=False)

    import perplexity as ppl

    argv = sys.argv
    sys.argv = ["perplexity", "--ckpt", str(tmp_path / "out"),
                "--hf-dir", str(tmp_path / "hf"),
                "--seq-len", "32", "--max-tokens", "128"]
    try:
        ppl.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "fp4:" in out and "bf16:" in out and "delta nll" in out
