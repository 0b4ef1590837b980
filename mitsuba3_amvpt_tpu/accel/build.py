"""Host-side BVH construction: C++ binned-SAH builder via ctypes, with a
pure-numpy median-split fallback.

Replaces the reference's accel backends' *build* phase
(src/render/scene_embree.inl rtcBuildBVH / kdtree.h SAH build).  The
traversal phase lives in accel/traverse.py (JAX) and ops/ (Pallas).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(__file__), "cpp", "bvh_builder.cpp")


def _compile_lib():
    """Compile the C++ builder into a cached shared library."""
    cache_dir = os.path.join(tempfile.gettempdir(), "amvpt_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libbvh_builder.so")
    if (not os.path.exists(so_path)
            or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", _SRC, "-o", so_path + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(so_path + ".tmp", so_path)
    lib = ctypes.CDLL(so_path)
    lib.bvh_build.restype = ctypes.c_int32
    lib.bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    return lib


def _get_lib():
    global _LIB
    if _LIB is None:
        try:
            _LIB = _compile_lib()
        except Exception:
            _LIB = False  # remember the failure; use numpy fallback
    return _LIB


def build_bvh(prim_lo: np.ndarray, prim_hi: np.ndarray):
    """Build a BVH over primitive AABBs.

    Returns (nodes_bbox (M,2,3) f32, nodes_meta (M,2) i32, prim_order
    (N,) i32).  nodes_meta semantics as documented in bvh_builder.cpp.
    """
    prim_lo = np.ascontiguousarray(prim_lo, np.float32)
    prim_hi = np.ascontiguousarray(prim_hi, np.float32)
    n = prim_lo.shape[0]
    ctr = np.ascontiguousarray(0.5 * (prim_lo + prim_hi), np.float32)
    lib = _get_lib()
    if lib:
        cap = 2 * n
        nodes_bbox = np.empty((cap, 6), np.float32)
        nodes_meta = np.empty((cap, 2), np.int32)
        prim_order = np.empty((n,), np.int32)
        f32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))  # noqa: E731
        i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))  # noqa: E731
        n_nodes = lib.bvh_build(f32p(prim_lo), f32p(prim_hi), f32p(ctr), n,
                                f32p(nodes_bbox), i32p(nodes_meta),
                                i32p(prim_order))
        if n_nodes > 0:
            bbox = nodes_bbox[:n_nodes].reshape(n_nodes, 2, 3)
            return bbox, nodes_meta[:n_nodes], prim_order
    return _build_bvh_numpy(prim_lo, prim_hi, ctr)


def _build_bvh_numpy(lo, hi, ctr, max_leaf: int = 4):
    """Median-split fallback builder (also the independent reference used
    by tests to cross-check the C++ builder's topology validity)."""
    n = lo.shape[0]
    order = np.arange(n, dtype=np.int32)
    nodes_bbox, nodes_meta = [], []

    def rec(begin, end):
        node_id = len(nodes_bbox)
        ids = order[begin:end]
        nlo = lo[ids].min(0)
        nhi = hi[ids].max(0)
        nodes_bbox.append([nlo, nhi])
        nodes_meta.append([0, 0])
        if end - begin <= max_leaf:
            nodes_meta[node_id] = [begin, end - begin]
            return node_id
        axis = int(np.argmax(nhi - nlo))
        mid = (begin + end) // 2
        sel = np.argsort(ctr[ids, axis], kind="stable")
        order[begin:end] = ids[sel]
        rec(begin, mid)
        right = rec(mid, end)
        nodes_meta[node_id] = [right, 0]
        return node_id

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000))
    try:
        rec(0, n)
    finally:
        sys.setrecursionlimit(old)
    bbox = np.asarray(nodes_bbox, np.float32)
    return bbox, np.asarray(nodes_meta, np.int32), order


def triangle_bounds(vertices: np.ndarray, faces: np.ndarray):
    """Per-triangle AABBs from (V,3) vertices and (F,3) int faces."""
    tris = vertices[faces]           # (F, 3, 3)
    return tris.min(axis=1), tris.max(axis=1)


def treelet_tiles(nodes_meta: np.ndarray, n_prims: int,
                  max_tile: int = 128) -> np.ndarray:
    """Cut the BVH into treelets of <= max_tile prims -> tile ranges.

    The binned tracer's tiles were fixed runs of 128 consecutive
    BVH-leaf prims, which cut across subtree boundaries and produced
    loose tile AABBs (ray visits tiles it never needed).  Cutting at
    SUBTREE roots instead keeps each tile spatially tight at the cost
    of partially filled tiles.

    ``nodes_meta`` is build_bvh's (M, 2) int32 array: interior nodes
    have meta[i] = (right_child, 0) with left child at i+1; leaves
    have (first_prim, count>0) — prims of a subtree are CONTIGUOUS in
    leaf order.  Returns ``starts`` (n_tiles + 1,) int32 ascending with
    starts[-1] == n_prims.
    """
    m = nodes_meta.shape[0]
    if m == 0:
        return np.array([0, n_prims], np.int32)
    first = np.zeros(m, np.int64)
    end = np.zeros(m, np.int64)
    is_leaf = nodes_meta[:, 1] > 0
    first[is_leaf] = nodes_meta[is_leaf, 0]
    end[is_leaf] = nodes_meta[is_leaf, 0] + nodes_meta[is_leaf, 1]
    # children always have larger indices (preorder layout): reverse
    # sweep resolves interior ranges in one pass
    for i in range(m - 1, -1, -1):
        if not is_leaf[i]:
            c0, c1 = i + 1, nodes_meta[i, 0]
            first[i] = min(first[c0], first[c1])
            end[i] = max(end[c0], end[c1])
    count = end - first
    starts = [0]
    stack = [0]
    while stack:
        i = stack.pop()
        if count[i] <= max_tile or is_leaf[i]:
            # subtree fits one tile; ranges arrive in ascending order
            # because we push the right (larger-first) child first
            assert first[i] == starts[-1], "non-contiguous treelet"
            starts.append(int(end[i]))
        else:
            c0, c1 = i + 1, int(nodes_meta[i, 0])
            lo, hi = (c0, c1) if first[c0] <= first[c1] else (c1, c0)
            stack.append(hi)
            stack.append(lo)
    assert starts[-1] == n_prims
    # greedily merge ADJACENT small ranges (leaf-order neighbors are
    # spatial cousins): bounds the tile count at ~2x the dense packing
    # and keeps the padded-slot fill factor high
    merged = [0]
    for s in starts[1:]:
        if s - merged[-2] <= max_tile if len(merged) >= 2 else False:
            merged[-1] = s               # extend the open tile
        else:
            merged.append(s)             # close it, start a new one
    merged = np.asarray(merged, np.int32)
    # pack_binned silently drops prims past slot max_tile within a tile
    # (offs < counts with offs < TILE) — an oversized range here would
    # lose geometry downstream, so fail loudly at the boundary
    assert np.diff(merged).max(initial=0) <= max_tile, \
        "treelet tile exceeds max_tile"
    return merged
