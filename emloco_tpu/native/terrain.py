"""ctypes wrappers for the native terrain pipeline (+ numpy fallback)."""
from __future__ import annotations

import ctypes

import numpy as np

from .build import load_native


def fast_walkable_mask(heights: np.ndarray, cell: float,
                       max_slope: float = 0.5,
                       margin_cells: int = 3) -> np.ndarray:
    """Native walkable mask (slope threshold + erosion); numpy fallback."""
    lib = load_native("terrain_native")
    H, W = heights.shape
    if lib is not None:
        h = np.ascontiguousarray(heights, np.float32)
        out = np.zeros((H, W), np.uint8)
        lib.walkable_mask(
            h.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(H), ctypes.c_int(W), ctypes.c_float(cell),
            ctypes.c_float(max_slope), ctypes.c_int(margin_cells),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.astype(bool)
    from ..physics.terrain import walkable_mask
    return walkable_mask(heights, cell, max_slope, margin_cells)


def fast_spawn_table(mask: np.ndarray, cell: float, origin,
                     max_pts: int = 65536, seed: int = 0) -> np.ndarray:
    """Native spawn-coordinate extraction; numpy fallback."""
    lib = load_native("terrain_native")
    H, W = mask.shape
    if lib is not None:
        m = np.ascontiguousarray(mask.astype(np.uint8))
        out = np.zeros((max_pts, 2), np.float32)
        lib.spawn_table.restype = ctypes.c_int
        n = lib.spawn_table(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int(H), ctypes.c_int(W), ctypes.c_float(cell),
            ctypes.c_float(origin[0]), ctypes.c_float(origin[1]),
            ctypes.c_uint64(seed), ctypes.c_int(max_pts),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out[:max(n, 1)]
    xs, ys = np.where(mask)
    xy = np.stack([xs * cell + origin[0], ys * cell + origin[1]],
                  -1).astype(np.float32)
    if len(xy) == 0:
        return np.zeros((1, 2), np.float32)
    if len(xy) > max_pts:
        rng = np.random.RandomState(seed)
        xy = xy[rng.choice(len(xy), max_pts, replace=False)]
    return xy


def fast_rasterize_trimesh(verts: np.ndarray, faces: np.ndarray, H: int,
                           W: int, cell: float, origin):
    """Native triangle-mesh top-surface rasterization; numpy fallback.
    Returns (heights (H,W) float32 with -inf where uncovered, cover bool)."""
    lib = load_native("terrain_native")
    if lib is not None:
        v = np.ascontiguousarray(verts, np.float32)
        f = np.ascontiguousarray(faces, np.int32)
        out_h = np.zeros((H, W), np.float32)
        cover = np.zeros((H, W), np.uint8)
        lib.rasterize_trimesh(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(len(v)),
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int(len(f)),
            ctypes.c_int(H), ctypes.c_int(W), ctypes.c_float(cell),
            ctypes.c_float(origin[0]), ctypes.c_float(origin[1]),
            out_h.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cover.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out_h, cover.astype(bool)
    from ..physics.mesh_terrain import rasterize_trimesh_np
    return rasterize_trimesh_np(verts, faces, H, W, cell, origin)
