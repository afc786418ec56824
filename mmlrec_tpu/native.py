"""ctypes bindings for the native CSV loader (native/fast_csv.cpp).

Builds the shared library on first use (``make -C native``) and exposes
``load_csv_columns`` — joint train+test parse with sklearn-LabelEncoder-
compatible categorical codes.  Falls back cleanly (raises
NativeUnavailable) so the pandas path in data.py remains the default when
no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastcsv.so")
_lock = threading.Lock()
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=300,
        )
    except Exception as e:  # noqa: BLE001
        raise NativeUnavailable(f"could not build native libs: {e}") from e


def _stale(so_path: str) -> bool:
    """True when the .so is missing or older than any source in native/."""
    if not os.path.exists(so_path):
        return True
    so_mtime = os.path.getmtime(so_path)
    for name in os.listdir(_NATIVE_DIR):
        if name.endswith((".cpp", ".h", ".cc")) or name == "Makefile":
            if os.path.getmtime(os.path.join(_NATIVE_DIR, name)) > so_mtime:
                return True
    return False


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if _stale(_LIB_PATH):
            _build()
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            raise NativeUnavailable(str(e)) from e
        lib.fc_load.restype = ctypes.c_void_p
        lib.fc_load.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.fc_error.restype = ctypes.c_char_p
        lib.fc_error.argtypes = [ctypes.c_void_p]
        lib.fc_rows.restype = ctypes.c_int64
        lib.fc_rows.argtypes = [ctypes.c_void_p]
        lib.fc_train_rows.restype = ctypes.c_int64
        lib.fc_train_rows.argtypes = [ctypes.c_void_p]
        lib.fc_vocab.restype = ctypes.c_int32
        lib.fc_vocab.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.fc_read_floats.restype = None
        lib.fc_read_floats.argtypes = [
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.fc_read_codes.restype = None
        lib.fc_read_codes.argtypes = [
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.fc_free.restype = None
        lib.fc_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def load_csv_columns(
    train_path: str,
    test_path: Optional[str],
    columns: Sequence[str],
    kinds: Sequence[int],  # 0 = float, 1 = categorical
) -> Tuple[Dict[str, np.ndarray], Dict[str, int], int, int]:
    """Returns (column arrays over the JOINT train+test rows, vocab sizes for
    categorical columns, train_rows, total_rows)."""
    lib = get_lib()
    kinds_arr = (ctypes.c_int32 * len(kinds))(*kinds)
    handle = lib.fc_load(
        train_path.encode(),
        (test_path or "").encode(),
        "\n".join(columns).encode(),
        kinds_arr,
        len(columns),
    )
    if not handle:
        raise NativeUnavailable("fc_load returned null")
    try:
        err = lib.fc_error(handle)
        if err:
            raise NativeUnavailable(err.decode())
        rows = lib.fc_rows(handle)
        train_rows = lib.fc_train_rows(handle)
        out: Dict[str, np.ndarray] = {}
        vocabs: Dict[str, int] = {}
        for i, (name, kind) in enumerate(zip(columns, kinds)):
            if kind == 0:
                buf = np.empty(rows, np.float64)
                lib.fc_read_floats(
                    handle, i, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
                )
                out[name] = buf
            else:
                buf = np.empty(rows, np.int32)
                lib.fc_read_codes(
                    handle, i, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
                )
                out[name] = buf
                vocabs[name] = int(lib.fc_vocab(handle, i))
        return out, vocabs, int(train_rows), int(rows)
    finally:
        lib.fc_free(handle)


# ---------------------------------------------------------------------------
# native two-phase step metadata (native/step_metadata.cpp)
# ---------------------------------------------------------------------------

_META_LIB_PATH = os.path.join(_NATIVE_DIR, "libstepmeta.so")
_meta_lib = None
_I32P = ctypes.POINTER(ctypes.c_int32)
_I64P = ctypes.POINTER(ctypes.c_int64)
_F32P = ctypes.POINTER(ctypes.c_float)


def get_meta_lib():
    """ctypes handle for the single-pass metadata kernel; builds on first
    use and raises NativeUnavailable when no toolchain exists."""
    global _meta_lib
    with _lock:
        if _meta_lib is not None:
            return _meta_lib
        if _stale(_META_LIB_PATH):
            _build()
        try:
            lib = ctypes.CDLL(_META_LIB_PATH)
        except OSError as e:
            raise NativeUnavailable(str(e)) from e
        try:
            lib.sm_counts.restype = None
            lib.sm_counts.argtypes = [
                _I64P, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int32, _I64P, _I64P, ctypes.c_int32,
            ]
            lib.sm_fill.restype = None
            lib.sm_fill.argtypes = [
                _I64P, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                _I32P, _F32P, _I32P, _I32P, _I32P, _F32P,
                _I32P, _I32P, _I32P, _I32P, _I32P, ctypes.c_int32,
            ]
        except AttributeError as e:
            # A stale/foreign .so without the expected symbols must degrade to
            # the numpy fallback, not crash the fit (advisor r4).
            raise NativeUnavailable(f"libstepmeta missing symbols: {e}") from e
        _meta_lib = lib
        return _meta_lib


def _p(arr, ptr_t):
    return arr.ctypes.data_as(ptr_t) if arr is not None else None


def step_metadata_counts(comp, idx_bits, pack_factor, n_threads=0):
    lib = get_meta_lib()
    steps, K = comp.shape
    n_resid = np.empty(steps, np.int64)
    n_ldup = np.empty(steps, np.int64)
    lib.sm_counts(_p(comp, _I64P), steps, K, idx_bits, pack_factor,
                  _p(n_resid, _I64P), _p(n_ldup, _I64P),
                  n_threads or min(steps, os.cpu_count() or 1))
    return n_resid, n_ldup


def step_metadata_fill(comp, idx_bits, pack_factor, Kp, R_cap, G_cap,
                       inv, rep, pids, pinv, nuniq, prep,
                       accperm, resid_pos, resid_slot, gdup_pos, gdup_tgt,
                       n_threads=0):
    lib = get_meta_lib()
    steps, K = comp.shape
    lib.sm_fill(
        _p(comp, _I64P), steps, K, idx_bits, pack_factor, Kp, R_cap, G_cap,
        _p(inv, _I32P), _p(rep, _F32P), _p(pids, _I32P), _p(pinv, _I32P),
        _p(nuniq, _I32P), _p(prep, _F32P), _p(accperm, _I32P),
        _p(resid_pos, _I32P), _p(resid_slot, _I32P),
        _p(gdup_pos, _I32P), _p(gdup_tgt, _I32P),
        n_threads or min(steps, os.cpu_count() or 1),
    )
