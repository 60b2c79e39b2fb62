"""ctypes loader for the native C++ walk engine (native/walker.cpp).

Builds the shared library on first use (g++ -O3 -fopenmp) into the package
directory and caches it; all entry points return None-safe fallbacks if the
toolchain is unavailable, so the numpy walkers keep everything working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRCS = tuple(sorted(
    os.path.join(_NATIVE_DIR, f)
    for f in os.listdir(_NATIVE_DIR) if f.endswith(".cpp")
)) if os.path.isdir(_NATIVE_DIR) else ()
_SO = os.path.join(_NATIVE_DIR, "libgnnwalker.so")


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           *_SRCS, "-o", _SO + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) or any(
                os.path.getmtime(src) > os.path.getmtime(_SO)
                for src in _SRCS):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        try:
            _bind_symbols(lib)
        except AttributeError:
            # Stale cached .so (mtime newer than sources but built before a
            # symbol was added): rebuild once and retry, else fall back to
            # the numpy paths.
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_SO)
                _bind_symbols(lib)
            except (OSError, AttributeError):
                return None
        _LIB = lib
        return _LIB


def _bind_symbols(lib: ctypes.CDLL) -> None:
    """Declare argtypes for every exported symbol; raises AttributeError
    when the library predates a symbol (handled by get_lib's rebuild)."""
    I64 = ctypes.POINTER(ctypes.c_int64)
    I32 = ctypes.POINTER(ctypes.c_int32)
    F32 = ctypes.POINTER(ctypes.c_float)
    U64 = ctypes.c_uint64
    lib.uniform_walks.argtypes = [I64, I32, I64, ctypes.c_int64,
                                  ctypes.c_int64, U64, I32]
    lib.alias_walks.argtypes = [I64, I32, F32, I32, I64,
                                ctypes.c_int64, ctypes.c_int64, U64, I32]
    lib.node2vec_walks.argtypes = [I64, I32, F32, I32, F32, I32, I64,
                                   I64, ctypes.c_int64, ctypes.c_int64,
                                   U64, I32]
    lib.sample_neighbors.argtypes = [I64, I32, I64, ctypes.c_int64,
                                     ctypes.c_int64, U64, I32]
    F64 = ctypes.POINTER(ctypes.c_double)
    lib.struc2vec_pair_distances.argtypes = [
        I64, I32, ctypes.c_int64, ctypes.c_int64, I32, I32,
        ctypes.c_int64, F64, I32]
    lib.parse_numeric_edgelist.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, I64, I64, F32]
    lib.parse_numeric_edgelist.restype = ctypes.c_int64
    lib.build_graph_csr.argtypes = [
        I32, I32, F32, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, I32, I32, F32, I32, I32]
    lib.build_graph_csr.restype = ctypes.c_int64
    lib.normalize_edge_weights.argtypes = [
        I32, I32, F32, ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
    lib.normalize_edge_weights.restype = ctypes.c_int64
    lib.num_threads.restype = ctypes.c_int


def available() -> bool:
    return get_lib() is not None


def _p(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def uniform_walks_native(indptr, indices, starts, length: int,
                         seed: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    starts = np.ascontiguousarray(starts, np.int64)
    out = np.empty((len(starts), length), np.int32)
    lib.uniform_walks(_p(indptr, ctypes.c_int64), _p(indices, ctypes.c_int32),
                      _p(starts, ctypes.c_int64), len(starts), length,
                      seed & 0xFFFFFFFFFFFFFFFF, _p(out, ctypes.c_int32))
    return out


def alias_walks_native(indptr, indices, accept, alias, starts, length: int,
                       seed: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    accept = np.ascontiguousarray(accept, np.float32)
    alias = np.ascontiguousarray(alias, np.int32)
    starts = np.ascontiguousarray(starts, np.int64)
    out = np.empty((len(starts), length), np.int32)
    lib.alias_walks(_p(indptr, ctypes.c_int64), _p(indices, ctypes.c_int32),
                    _p(accept, ctypes.c_float), _p(alias, ctypes.c_int32),
                    _p(starts, ctypes.c_int64), len(starts), length,
                    seed & 0xFFFFFFFFFFFFFFFF, _p(out, ctypes.c_int32))
    return out


def struc2vec_distances_native(indptr, indices, n_nodes: int, k_max: int,
                               pu, pv) -> Optional[tuple]:
    """Cumulative per-layer DTW distances for candidate pairs.

    Returns (f [P, k_max+1] float64 with −1 past the valid layers,
    n_layers [P] int32), or None without the native lib.
    """
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    pu = np.ascontiguousarray(pu, np.int32)
    pv = np.ascontiguousarray(pv, np.int32)
    P = len(pu)
    f = np.empty((P, k_max + 1), np.float64)
    nl = np.empty(P, np.int32)
    lib.struc2vec_pair_distances(
        _p(indptr, ctypes.c_int64), _p(indices, ctypes.c_int32),
        n_nodes, k_max, _p(pu, ctypes.c_int32), _p(pv, ctypes.c_int32),
        P, _p(f, ctypes.c_double), _p(nl, ctypes.c_int32))
    return f, nl


def parse_edgelist_native(path: str, weighted: bool = False
                          ) -> Optional[tuple]:
    """C++ fast path for numeric whitespace edgelists.

    Returns (src int64[E], dst int64[E], w float32[E]) or None when the
    native lib is unavailable or the file contains non-canonical-integer
    tokens (the caller falls back to the Python string-vocab path).
    """
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        buf = f.read()
    max_edges = buf.count(b"\n") + 1
    src = np.empty(max_edges, np.int64)
    dst = np.empty(max_edges, np.int64)
    w = np.empty(max_edges, np.float32)
    n = lib.parse_numeric_edgelist(
        buf, len(buf), 1 if weighted else 0,
        _p(src, ctypes.c_int64), _p(dst, ctypes.c_int64),
        _p(w, ctypes.c_float))
    if n < 0:
        return None
    return src[:n], dst[:n], w[:n]


def sample_neighbors_native(indptr, indices, nodes, fanout: int,
                            seed: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    nodes = np.ascontiguousarray(nodes, np.int64)
    out = np.empty(len(nodes) * fanout, np.int32)
    lib.sample_neighbors(_p(indptr, ctypes.c_int64),
                         _p(indices, ctypes.c_int32),
                         _p(nodes, ctypes.c_int64), len(nodes), fanout,
                         seed & 0xFFFFFFFFFFFFFFFF, _p(out, ctypes.c_int32))
    return out


def build_graph_native(senders, receivers, edge_weight, n_nodes: int,
                       e_pad: int, row_block: int, edge_chunk: int
                       ) -> Optional[tuple]:
    """Parallel stable receiver-sort + padding + Pallas chunk spans
    (native/graphbuild.cpp) — byte-exact with the numpy build path.

    Returns (s, r, w, chunk_off, chunk_cnt, max_chunks) or None when the
    native lib is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    n_edges = len(senders)
    w_in = (np.ascontiguousarray(edge_weight, np.float32)
            if edge_weight is not None else None)
    s = np.empty(e_pad, np.int32)
    r = np.empty(e_pad, np.int32)
    w = np.empty(e_pad, np.float32)
    n_row_blocks = -(-max(n_nodes, 1) // row_block)
    off = np.empty(n_row_blocks, np.int32)
    cnt = np.empty(n_row_blocks, np.int32)
    max_chunks = lib.build_graph_csr(
        _p(senders, ctypes.c_int32), _p(receivers, ctypes.c_int32),
        _p(w_in, ctypes.c_float) if w_in is not None else None,
        n_edges, n_nodes, e_pad, row_block, edge_chunk,
        _p(s, ctypes.c_int32), _p(r, ctypes.c_int32), _p(w, ctypes.c_float),
        _p(off, ctypes.c_int32), _p(cnt, ctypes.c_int32))
    if max_chunks < 0:
        return None
    return s, r, w, off, cnt, int(max_chunks)


def normalize_edge_weights_native(senders, receivers, edge_weight,
                                  n_nodes: int, mode: str
                                  ) -> Optional[np.ndarray]:
    """Fused degree accumulation + per-edge normalisation. mode 'sym' is
    D^-1/2 A D^-1/2 (GCN/data_utils.py:54-60); 'row' is D^-1 A over incoming
    edges (GTN/models/GTN.py:7-19)."""
    lib = get_lib()
    if lib is None:
        return None
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    w = np.array(edge_weight, np.float32, copy=True) \
        if edge_weight is not None else np.ones(len(senders), np.float32)
    rc = lib.normalize_edge_weights(
        _p(senders, ctypes.c_int32), _p(receivers, ctypes.c_int32),
        _p(w, ctypes.c_float), len(senders), n_nodes,
        0 if mode == "sym" else 1)
    if rc < 0:
        return None
    return w
