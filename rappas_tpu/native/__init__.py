"""Native (C++) host components, compiled on demand with g++.

The TPU compute path is JAX/Pallas; these are the host-side hot loops
(the reference's equivalents are its Java inner loops):

* ``wordexplorer.cpp`` -- exact branch-and-bound phylo-kmer enumeration
  incl. gap jumps (bit-identical f32 semantics to the reference
  recursion), used by the DB build where the vectorized numpy frontier
  doesn't apply; parallelised over ghost nodes from Python threads
  (ctypes releases the GIL).

Compilation is cached next to the sources keyed by content hash; no
network or pip involved.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LOCK = threading.Lock()
_LIBS: dict[str, ctypes.CDLL] = {}


class NativeUnavailable(RuntimeError):
    pass


def _build(name: str) -> Path:
    src = _DIR / f"{name}.cpp"
    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    out = _DIR / f"_{name}_{tag}.so"
    if out.exists():
        return out
    # note: no -ffast-math -- the explorer's f32 semantics must stay
    # IEEE-exact to match the reference
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           str(src), "-o", str(out)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", b"")
        raise NativeUnavailable(
            f"could not build {name}: {detail!r}") from e
    # clean stale builds
    for old in _DIR.glob(f"_{name}_*.so"):
        if old != out:
            try:
                old.unlink()
            except OSError:
                pass
    return out


def load(name: str) -> ctypes.CDLL:
    with _LOCK:
        lib = _LIBS.get(name)
        if lib is None:
            lib = ctypes.CDLL(str(_build(name)))
            _LIBS[name] = lib
        return lib


# ------------------------------------------------------------------ #
# wordexplorer wrapper
# ------------------------------------------------------------------ #

def _we_lib() -> ctypes.CDLL:
    lib = load("wordexplorer")
    if not getattr(lib, "_we_configured", False):
        c = ctypes
        lib.we_explore.restype = c.c_void_p
        lib.we_explore.argtypes = [
            c.c_void_p, c.c_void_p, c.c_int, c.c_int, c.c_int, c.c_float,
            c.c_void_p, c.c_void_p, c.c_int, c.c_int, c.c_int]
        lib.we_count.restype = c.c_int64
        lib.we_count.argtypes = [c.c_void_p]
        lib.we_codes.restype = c.POINTER(c.c_int64)
        lib.we_codes.argtypes = [c.c_void_p]
        lib.we_sums.restype = c.POINTER(c.c_float)
        lib.we_sums.argtypes = [c.c_void_p]
        lib.we_free.argtypes = [c.c_void_p]
        lib._we_configured = True
    return lib


def gap_intervals_csr(gap_intervals: dict | None, n_cols: int):
    """dict(col -> [lengths]) -> CSR (offsets int32[n_cols+1], lens)."""
    offsets = np.zeros(n_cols + 1, np.int32)
    lens: list[int] = []
    gi = gap_intervals or {}
    for c in range(n_cols):
        offsets[c] = len(lens)
        lens.extend(gi.get(c, ()))
    offsets[n_cols] = len(lens)
    return offsets, np.array(lens, np.int32)


def explore_node_exact_native(states_sorted: np.ndarray,
                              pp_sorted: np.ndarray, k: int, thr,
                              gap_intervals: dict | None = None,
                              do_gap_jumps: bool = False,
                              limit_to_1_jump: bool = True):
    """Drop-in native replacement for
    ``rappas_tpu.build.explorer.explore_node_exact``."""
    lib = _we_lib()
    st = np.ascontiguousarray(states_sorted, np.int8)
    pp = np.ascontiguousarray(pp_sorted, np.float32)
    L, S = pp.shape
    offsets, lens = gap_intervals_csr(gap_intervals, L)
    handle = lib.we_explore(
        st.ctypes.data, pp.ctypes.data, L, S, k,
        np.float32(thr),
        offsets.ctypes.data, lens.ctypes.data, L,
        1 if do_gap_jumps else 0, 1 if limit_to_1_jump else 0)
    try:
        n = lib.we_count(handle)
        if n == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        codes = np.ctypeslib.as_array(lib.we_codes(handle),
                                      (n,)).copy()
        sums = np.ctypeslib.as_array(lib.we_sums(handle), (n,)).copy()
    finally:
        lib.we_free(handle)
    return codes.astype(np.int64), sums.astype(np.float32)
