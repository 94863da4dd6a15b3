"""ctypes loader for the native converter core (csrc/qpack.c).

The C single-pass packer is ~20x the torch fallback on the single-core
conversion host and is bit-identical to the numpy golden
(`ops/format.pack_tpu_pairk[_lut]`) — asserted in tests/test_native.py.  It
is compiled on demand with the system C compiler into a content-addressed
cache (the package dir when writable, else ``~/.cache/torch_bnb_fp4_tpu``),
so the package stays pure-Python-installable: no compiler, no native path —
``available()`` is False and convert/quantize.py silently uses torch.

Native-code stance vs the reference: the reference's csrc/ is its *decode*
hot path (CUDA); on TPU decode is Pallas (ops/kernels.py), so the native
half that remains host-side is the offline converter's quantize+pack loop
(the work the reference delegates to bitsandbytes' CUDA quantize_fp4 at
load time, torch_bnb_fp4/__init__.py:775).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile

import numpy as np

from ..ops import format as fmt

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc", "qpack.c")
_ABI = 2
_lib = None
_tried = False


def _cache_dirs():
    yield os.path.dirname(_SRC)  # beside the source (repo checkouts)
    yield os.path.join(os.path.expanduser("~"), ".cache", "torch_bnb_fp4_tpu")


def _build(src: str) -> str | None:
    cc = os.environ.get("CC") or shutil.which("cc") or shutil.which("gcc") or shutil.which("clang")
    if cc is None:
        return None
    with open(src, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    name = f"qpack-{tag}.so"
    for d in _cache_dirs():
        out = os.path.join(d, name)
        if os.path.exists(out):
            return out
        try:
            os.makedirs(d, exist_ok=True)
            # compile to a temp name then rename: concurrent converts race safely
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=d)
            os.close(fd)
            r = subprocess.run(
                [cc, "-O3", "-march=native", "-shared", "-fPIC", "-o", tmp, src],
                capture_output=True,
            )
            if r.returncode != 0:
                os.unlink(tmp)
                return None
            os.replace(tmp, out)
            return out
        except OSError:
            continue
    return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("TORCH_BNB_FP4_TPU_NO_NATIVE"):
        return None
    try:
        so = _build(_SRC)
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        if lib.qpack_abi_version() != _ABI:
            return None
        lib.qpack_pairk.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_float,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.qpack_pairk.restype = ctypes.c_int
        _lib = lib
    except (OSError, AttributeError):
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _mids_map(code: np.ndarray, remap: np.ndarray | None):
    """The golden's midpoint table + sorted-position->nibble map
    (ops/format.quantize_codes:111-118; identical numpy arithmetic so the
    (a+b)/2 f32 roundings match bit-for-bit)."""
    order = np.argsort(code, kind="stable").astype(np.uint8)
    sorted_code = code[order]
    mids = ((sorted_code[1:] + sorted_code[:-1]) / 2).astype(np.float32)
    map16 = order if remap is None else remap[order]
    return np.ascontiguousarray(mids), np.ascontiguousarray(map16.astype(np.uint8))


def _run(w: np.ndarray, blocksize: int, mids: np.ndarray, map16: np.ndarray,
         bf16_scale: bool, value_scale: float):
    lib = _load()
    assert lib is not None
    n_out, k_in = w.shape
    w = np.ascontiguousarray(w, dtype=np.float32)
    packed = np.empty((k_in // 2, n_out), np.uint8)
    scale = np.empty((k_in // blocksize, n_out), np.float32)
    rc = lib.qpack_pairk(
        w.ctypes.data, n_out, k_in, blocksize,
        mids.ctypes.data, map16.ctypes.data,
        1 if bf16_scale else 0, ctypes.c_float(value_scale),
        packed.ctypes.data, scale.ctypes.data,
    )
    if rc != 0:
        raise MemoryError("native qpack workspace allocation failed")
    return packed, scale


def quantize_pack_pairk_native(w: np.ndarray, blocksize: int = 64,
                               variant: str = "exact", scale_dtype=np.float32):
    """Native `fmt.pack_tpu_pairk` (see that docstring for the layout)."""
    n_out, k_in = np.shape(w)
    if k_in % (2 * blocksize) != 0:
        raise ValueError(f"K={k_in} not divisible by 2*blocksize")
    if blocksize > 4096:
        raise ValueError(f"blocksize {blocksize} > native max 4096")
    scale_dtype = np.dtype(scale_dtype)
    if scale_dtype == fmt._BF16:
        bf16 = True
    elif scale_dtype == np.dtype(np.float32):
        bf16 = False
    else:
        raise ValueError(f"scale_dtype must be float32 or bfloat16, got {scale_dtype}")
    if variant == "exact":
        mids, map16 = _mids_map(fmt.FP4_CODE, fmt.RANK_REMAP)
    else:
        mids, map16 = _mids_map(fmt.pairk_code(variant), None)
    packed, scale = _run(np.asarray(w), blocksize, mids, map16, bf16, fmt.PAIRK_VALUE_SCALE)
    return packed, scale.astype(scale_dtype)


def quantize_pack_pairk_lut_native(w: np.ndarray, codebook: np.ndarray, blocksize: int = 64):
    """Native `fmt.pack_tpu_pairk_lut` (arbitrary sorted codebook, NF4)."""
    code = np.asarray(codebook, np.float32)
    if code.shape != (16,) or not np.all(np.diff(code) > 0):
        raise ValueError("codebook must be 16 strictly-increasing entries")
    n_out, k_in = np.shape(w)
    if k_in % (2 * blocksize) != 0:
        raise ValueError(f"K={k_in} not divisible by 2*blocksize")
    if blocksize > 4096:
        raise ValueError(f"blocksize {blocksize} > native max 4096")
    # quantize against the bf16-rounded table (what decode multiplies by)
    code_bf = code.astype(fmt._BF16).astype(np.float32)
    mids, map16 = _mids_map(code_bf, None)
    return _run(np.asarray(w), blocksize, mids, map16, False, 1.0)
