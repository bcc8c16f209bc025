"""ctypes wrapper for the native ndjson reader (+ python fallback)."""
from __future__ import annotations

import ctypes

import numpy as np

from .build import load_native


def read_ndjson_fast(path: str):
    """Parse a trajnet++-style ndjson file.

    Returns (tracks_fp (n,2) int32 [frame, ped], tracks_xy (n,2) float32,
    scenes (m,4) int32 [id, primary, start, end]). Falls back to the python
    reader in prediction.data when no toolchain is available."""
    lib = load_native("ndjson_native")
    if lib is None:
        from ..prediction.data import read_ndjson_scenes
        return None, None, None, read_ndjson_scenes(path)
    lib.ndjson_parse.restype = ctypes.c_void_p
    lib.ndjson_num_tracks.restype = ctypes.c_int64
    lib.ndjson_num_scenes.restype = ctypes.c_int64
    h = lib.ndjson_parse(path.encode())
    if not h:
        raise IOError(f"cannot parse {path}")
    n = lib.ndjson_num_tracks(ctypes.c_void_p(h))
    m = lib.ndjson_num_scenes(ctypes.c_void_p(h))
    fp = np.zeros((n, 2), np.int32)
    xy = np.zeros((n, 2), np.float32)
    sc = np.zeros((m, 4), np.int32)
    lib.ndjson_copy_tracks(
        ctypes.c_void_p(h),
        fp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        xy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    lib.ndjson_copy_scenes(
        ctypes.c_void_p(h),
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    lib.ndjson_free(ctypes.c_void_p(h))
    return fp, xy, sc, None


def scenes_to_arrays(fp, xy, sc):
    """Assemble (T, N, 2) per-scene arrays (primary first) from flat tracks."""
    scenes = []
    # index tracks by (ped, frame)
    order = np.lexsort((fp[:, 0], fp[:, 1]))
    fp_s, xy_s = fp[order], xy[order]
    peds, ped_starts = np.unique(fp_s[:, 1], return_index=True)
    ped_slices = {p: slice(s, e) for p, s, e in zip(
        peds, ped_starts, list(ped_starts[1:]) + [len(fp_s)])}
    for sid, primary, s, e in sc:
        frames = np.arange(s, e + 1)
        cols = []
        for p in [primary] + [p for p in peds if p != primary]:
            sl = ped_slices.get(p)
            if sl is None:
                continue
            f_p = fp_s[sl, 0]
            idx = np.searchsorted(f_p, frames)
            ok = (idx < len(f_p)) and np.array_equal(
                f_p[np.clip(idx, 0, len(f_p) - 1)], frames)
            if not ok:
                if p == primary:
                    cols = None
                    break
                continue
            cols.append(xy_s[sl][idx])
        if cols:
            scenes.append(np.stack(cols, axis=1))
    return scenes
