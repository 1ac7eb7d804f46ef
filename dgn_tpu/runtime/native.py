"""ctypes loader for the native packer (runtime/packer.cpp).

Compiles the shared library on first use (g++ -O3, cached next to the
source, rebuilt when the .cpp is newer) and exposes numpy-typed wrappers.
`available()` gates every call site so the pure-numpy path remains a full
fallback on machines without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "packer.cpp")
_LIB = os.path.join(_HERE, "_build", "libdgnpack.so")

_lock = threading.Lock()
_lib = None
_tried = False

_i32 = ctypes.POINTER(ctypes.c_int32)
_u8 = ctypes.POINTER(ctypes.c_uint8)
_f32 = ctypes.POINTER(ctypes.c_float)


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except (OSError, subprocess.SubprocessError):
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if _build() is None:
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.dgn_pack.restype = ctypes.c_int
        lib.dgn_pack.argtypes = [
            ctypes.c_int32, _i32, _i32, _i32, _i32,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            _i32, _i32, _i32, _u8, _f32, _i32, _u8, _f32, _i32]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _p(a, typ):
    return a.ctypes.data_as(typ)


def pack_edges(n_nodes: np.ndarray, n_edges: np.ndarray,
               src_cat: np.ndarray, dst_cat: np.ndarray,
               n_pad: int, e_pad: int, g_pad: int,
               sort_edges: bool = True):
    """Native edge packing; returns the dict of arrays pack_graphs needs.

    perm maps output edge slots to concatenated-input edge indices (-1 for
    pads) so callers can permute edge features with one numpy gather.
    """
    lib = _load()
    assert lib is not None
    g = len(n_nodes)
    n_nodes = np.ascontiguousarray(n_nodes, np.int32)
    n_edges = np.ascontiguousarray(n_edges, np.int32)
    src_cat = np.ascontiguousarray(src_cat, np.int32)
    dst_cat = np.ascontiguousarray(dst_cat, np.int32)
    src = np.empty(e_pad, np.int32)
    dst = np.empty(e_pad, np.int32)
    perm = np.empty(e_pad, np.int32)
    edge_mask = np.empty(e_pad, np.uint8)
    snorm_e = np.empty(e_pad, np.float32)
    node_graph = np.empty(n_pad, np.int32)
    node_mask = np.empty(n_pad, np.uint8)
    snorm_n = np.empty(n_pad, np.float32)
    in_degree = np.empty(n_pad, np.int32)
    rc = lib.dgn_pack(
        g, _p(n_nodes, _i32), _p(n_edges, _i32), _p(src_cat, _i32),
        _p(dst_cat, _i32), n_pad, e_pad, g_pad, int(sort_edges),
        _p(src, _i32), _p(dst, _i32), _p(perm, _i32),
        _p(edge_mask, _u8), _p(snorm_e, _f32), _p(node_graph, _i32),
        _p(node_mask, _u8), _p(snorm_n, _f32), _p(in_degree, _i32))
    if rc != 0:
        raise ValueError("pack overflow (native)")
    return dict(src=src, dst=dst, perm=perm,
                edge_mask=edge_mask.astype(bool), snorm_e=snorm_e[:, None],
                node_graph=node_graph, node_mask=node_mask.astype(bool),
                snorm_n=snorm_n[:, None], in_degree=in_degree)
