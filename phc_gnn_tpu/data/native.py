"""ctypes bindings for the native C++ batcher (native/batcher.cpp).

Auto-builds ``libbatcher.so`` with g++ on first use; every entry point has a
numpy fallback so the library degrades gracefully where no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["get_lib", "native_available", "sort_edges_by_receiver",
           "build_csr_rowptr", "pack_batch_native"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libbatcher.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "batcher.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
             "-o", _SO_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.sort_edges_by_receiver.argtypes = [_i32p, ctypes.c_int64,
                                           ctypes.c_int32, _i64p]
    lib.build_csr_rowptr.argtypes = [_i32p, ctypes.c_int64, ctypes.c_int32,
                                     _i64p]
    lib.pack_batch.argtypes = [
        _i32p, _i32p, _i32p, _i32p, _i64p, _i64p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        _i32p, _i32p, _i32p, _i32p, _i32p, _u8p, _u8p, _u8p]
    lib.pack_batch.restype = ctypes.c_int32
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


def _as_i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def sort_edges_by_receiver(receivers: np.ndarray, num_nodes: int) -> np.ndarray:
    """Stable argsort of receivers; counting sort in C++ (numpy fallback)."""
    receivers = _as_i32(receivers)
    lib = get_lib()
    if lib is None:
        return np.argsort(receivers, kind="stable")
    perm = np.empty(receivers.shape[0], np.int64)
    lib.sort_edges_by_receiver(
        receivers.ctypes.data_as(_i32p), receivers.shape[0], num_nodes,
        perm.ctypes.data_as(_i64p))
    return perm


def build_csr_rowptr(recv_sorted: np.ndarray, num_nodes: int) -> np.ndarray:
    recv_sorted = _as_i32(recv_sorted)
    lib = get_lib()
    if lib is None:
        counts = np.bincount(recv_sorted, minlength=num_nodes)
        return np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    rowptr = np.empty(num_nodes + 1, np.int64)
    lib.build_csr_rowptr(recv_sorted.ctypes.data_as(_i32p),
                         recv_sorted.shape[0], num_nodes,
                         rowptr.ctypes.data_as(_i64p))
    return rowptr



def pack_batch_native(node_feats, edge_feats, senders, receivers,
                      node_offsets, edge_offsets, num_nodes_pad: int,
                      num_edges_pad: int, num_graphs_pad: int):
    """Pack concatenated per-graph arrays into padded buffers (C++ fast path).

    Returns dict of numpy arrays or None if the native lib is unavailable
    (caller falls back to graph/batch.batch_graphs).
    """
    lib = get_lib()
    if lib is None:
        return None
    node_feats = _as_i32(node_feats)
    edge_feats = _as_i32(edge_feats)
    senders = _as_i32(senders)
    receivers = _as_i32(receivers)
    node_offsets = np.ascontiguousarray(node_offsets, np.int64)
    edge_offsets = np.ascontiguousarray(edge_offsets, np.int64)
    num_graphs = node_offsets.shape[0] - 1
    fx = node_feats.shape[1] if node_feats.ndim == 2 else 1
    fe = edge_feats.shape[1] if edge_feats.ndim == 2 else 1

    out = {
        "nodes": np.empty((num_nodes_pad, fx), np.int32),
        "edges": np.empty((num_edges_pad, fe), np.int32),
        "senders": np.empty(num_edges_pad, np.int32),
        "receivers": np.empty(num_edges_pad, np.int32),
        "graph_ids": np.empty(num_nodes_pad, np.int32),
        "node_mask": np.empty(num_nodes_pad, np.uint8),
        "edge_mask": np.empty(num_edges_pad, np.uint8),
        "graph_mask": np.empty(num_graphs_pad, np.uint8),
    }
    rc = lib.pack_batch(
        node_feats.ctypes.data_as(_i32p), edge_feats.ctypes.data_as(_i32p),
        senders.ctypes.data_as(_i32p), receivers.ctypes.data_as(_i32p),
        node_offsets.ctypes.data_as(_i64p), edge_offsets.ctypes.data_as(_i64p),
        num_graphs, fx, fe, num_nodes_pad, num_edges_pad, num_graphs_pad,
        out["nodes"].ctypes.data_as(_i32p), out["edges"].ctypes.data_as(_i32p),
        out["senders"].ctypes.data_as(_i32p),
        out["receivers"].ctypes.data_as(_i32p),
        out["graph_ids"].ctypes.data_as(_i32p),
        out["node_mask"].ctypes.data_as(_u8p),
        out["edge_mask"].ctypes.data_as(_u8p),
        out["graph_mask"].ctypes.data_as(_u8p))
    if rc != 0:
        raise ValueError(
            f"batch does not fit bucket ({num_nodes_pad},{num_edges_pad},"
            f"{num_graphs_pad})")
    return out
