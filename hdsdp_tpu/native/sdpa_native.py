"""ctypes binding for the C++ SDPA tokenizer (falls back to None if absent)."""

from __future__ import annotations

import ctypes
import os

_LIB = None


def _build(here: str, path: str) -> bool:
    """Compile the C++ tokenizer in-place (g++ is in the base image)."""
    import subprocess

    src = os.path.join(here, "sdpa_parser.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", path],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        return False
    return os.path.exists(path)


_LOAD_FAILED = False


def _load():
    global _LIB, _LOAD_FAILED
    if _LIB is not None or _LOAD_FAILED:
        return _LIB
    here = os.path.dirname(__file__)
    path = os.path.join(here, "libhdsdp_native.so")
    if not os.path.exists(path) and not _build(here, path):
        _LOAD_FAILED = True
        return None
    try:
        _LIB = ctypes.CDLL(path)
    except OSError:
        _LOAD_FAILED = True
        return None
    _LIB.hdsdp_sdpa_parse.restype = ctypes.c_void_p
    _LIB.hdsdp_sdpa_parse.argtypes = [ctypes.c_char_p]
    _LIB.hdsdp_sdpa_m.argtypes = [ctypes.c_void_p]
    _LIB.hdsdp_sdpa_nblocks.argtypes = [ctypes.c_void_p]
    _LIB.hdsdp_sdpa_nnz.argtypes = [ctypes.c_void_p]
    _LIB.hdsdp_sdpa_nnz.restype = ctypes.c_int64
    _LIB.hdsdp_sdpa_export.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 7
    _LIB.hdsdp_sdpa_free.argtypes = [ctypes.c_void_p]
    return _LIB


def read(path: str):
    """Parse an SDPA file with the native tokenizer.

    Returns an ``SDPAData`` or None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None

    import numpy as np

    from hdsdp_tpu.io import sdpa as sdpa_mod

    h = lib.hdsdp_sdpa_parse(path.encode())
    if not h:
        return None
    try:
        m = lib.hdsdp_sdpa_m(h)
        nblocks = lib.hdsdp_sdpa_nblocks(h)
        nnz = lib.hdsdp_sdpa_nnz(h)

        dims = np.zeros(nblocks, dtype=np.int32)
        b = np.zeros(m, dtype=np.float64)
        con = np.zeros(nnz, dtype=np.int32)
        blk = np.zeros(nnz, dtype=np.int32)
        row = np.zeros(nnz, dtype=np.int32)
        col = np.zeros(nnz, dtype=np.int32)
        val = np.zeros(nnz, dtype=np.float64)

        lib.hdsdp_sdpa_export(
            h,
            dims.ctypes.data,
            b.ctypes.data,
            con.ctypes.data,
            blk.ctypes.data,
            row.ctypes.data,
            col.ctypes.data,
            val.ctypes.data,
        )
    finally:
        lib.hdsdp_sdpa_free(h)

    lp_cols = 0
    sdp_dims = []
    for i, d in enumerate(dims):
        if d < 0:
            lp_cols = -int(d)
        else:
            sdp_dims.append(int(d))

    # objective negation (matches pure-Python reader; ref hdsdp_file_io.c:248)
    val = np.where(con == 0, -val, val)

    data = sdpa_mod.SDPAData(m=int(m), block_dims=sdp_dims, b=b, nnz=int(nnz))
    nsdp = len(sdp_dims)
    for j in range(nsdp):
        sel = blk == j
        r, c = row[sel], col[sel]
        lo = np.maximum(r, c).astype(np.int32)
        hi = np.minimum(r, c).astype(np.int32)
        data.blocks.append(
            sdpa_mod.BlockEntries(
                dim=sdp_dims[j], con=con[sel], row=lo, col=hi, val=val[sel]
            )
        )
    if lp_cols:
        sel = blk == nsdp
        data.lp = sdpa_mod.LPEntries(
            ncols=lp_cols, con=con[sel], var=row[sel], val=val[sel]
        )
    return data
