"""Native C packer (csrc/qpack.c) vs the numpy golden: bit-identical.

The native path is the converter's production quantize+pack loop; any drift
from `ops/format.pack_tpu_pairk[_lut]` silently corrupts checkpoints, so
every variant / scale dtype / edge case is asserted byte-for-byte equal.
If no C compiler is present the module skips (quantize.py falls back to the
torch path, which tests/test_convert.py already pins to the golden).
"""

import numpy as np
import pytest

from torch_bnb_fp4_tpu.convert import native
from torch_bnb_fp4_tpu.ops import format as fmt

pytestmark = pytest.mark.skipif(not native.available(), reason="no C compiler")


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("variant", fmt.PAIRK_VARIANTS)
@pytest.mark.parametrize("scale_dtype", [np.float32, fmt._BF16])
def test_pairk_bit_identical(rng, variant, scale_dtype):
    w = (rng.standard_normal((48, 512)) * 0.02).astype(np.float32)
    got_p, got_s = native.quantize_pack_pairk_native(w, 64, variant, scale_dtype)
    want_p, want_s = fmt.pack_tpu_pairk(w, 64, variant=variant, scale_dtype=scale_dtype)
    np.testing.assert_array_equal(got_p, want_p)
    assert got_s.dtype == want_s.dtype
    np.testing.assert_array_equal(
        got_s.view(np.uint16 if got_s.dtype == fmt._BF16 else np.uint32),
        want_s.view(np.uint16 if want_s.dtype == fmt._BF16 else np.uint32),
    )


def test_pairk_edge_cases(rng):
    # zero blocks (absmax 0 -> safe 1), negative-heavy, huge magnitudes,
    # exact codebook values (tie-adjacent), non-default blocksize
    w = (rng.standard_normal((8, 256)) * 5).astype(np.float32)
    w[0] = 0.0
    w[1] = -np.abs(w[1])
    w[2, :64] = 0.0
    w[3] = 1e30
    w[4, :16] = np.tile(fmt.FP4_CODE, 1)  # values sitting exactly on entries
    for bs in (32, 64, 128):
        got = native.quantize_pack_pairk_native(w, bs, "ramp")
        want = fmt.pack_tpu_pairk(w, bs, variant="ramp")
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])


def test_lut_bit_identical(rng):
    w = (rng.standard_normal((32, 384)) * 0.05).astype(np.float32)
    got_p, got_s = native.quantize_pack_pairk_lut_native(w, fmt.NF4_CODE, 64)
    want_p, want_s = fmt.pack_tpu_pairk_lut(w, fmt.NF4_CODE, 64)
    np.testing.assert_array_equal(got_p, want_p)
    np.testing.assert_array_equal(got_s, want_s)


def test_errors():
    w = np.zeros((4, 100), np.float32)
    with pytest.raises(ValueError, match="divisible"):
        native.quantize_pack_pairk_native(w, 64)
    with pytest.raises(ValueError, match="scale_dtype"):
        native.quantize_pack_pairk_native(np.zeros((4, 128), np.float32), 64, "ramp", np.float16)
    with pytest.raises(ValueError, match="increasing"):
        native.quantize_pack_pairk_lut_native(np.zeros((4, 128), np.float32), np.zeros(16))


def test_quantize_py_dispatches_native(rng, monkeypatch):
    """quantize.py prefers native and the env kill-switch forces torch —
    both produce identical bytes."""
    from torch_bnb_fp4_tpu.convert import quantize

    w = (rng.standard_normal((16, 256)) * 0.02).astype(np.float32)
    via_dispatch = quantize.quantize_pack_pairk(w, variant="ramp")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)  # simulate no-compiler host
    via_torch = quantize.quantize_pack_pairk(w, variant="ramp")
    np.testing.assert_array_equal(via_dispatch[0], via_torch[0])
    np.testing.assert_array_equal(via_dispatch[1], via_torch[1])
