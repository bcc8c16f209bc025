import json
import os
import tempfile

import numpy as np

from emloco_tpu.native import (
    fast_spawn_table,
    fast_walkable_mask,
    load_native,
    read_ndjson_fast,
)
from emloco_tpu.physics.terrain import walkable_mask


def test_native_builds():
    assert load_native("terrain_native") is not None, "g++ build failed"
    assert load_native("ndjson_native") is not None


def test_walkable_mask_matches_numpy():
    rng = np.random.RandomState(0)
    h = rng.rand(64, 64).astype(np.float32) * 0.02
    h[20:30, 20:30] = 2.0  # steep obstacle
    m_native = fast_walkable_mask(h, cell=0.1, max_slope=0.5, margin_cells=3)
    m_numpy = walkable_mask(h, cell=0.1, max_slope=0.5, margin_cells=3)
    # the obstacle's steep edges (+margin) are excluded; the flat plateau on
    # top stays walkable
    assert not m_native[17:22, 17:32].any()   # leading edge + margin
    assert not m_native[28:33, 17:32].any()   # trailing edge + margin
    agreement = (m_native == m_numpy).mean()
    assert agreement == 1.0, f"agreement {agreement:.3f}"


def test_spawn_table():
    mask = np.zeros((32, 32), bool)
    mask[5:10, 5:10] = True
    xy = fast_spawn_table(mask, cell=0.5, origin=(-8.0, -8.0), max_pts=16,
                          seed=1)
    assert 1 <= len(xy) <= 16
    # all points inside the walkable square
    assert np.all(xy[:, 0] >= -8 + 5 * 0.5 - 1e-5)
    assert np.all(xy[:, 0] <= -8 + 10 * 0.5 + 1e-5)


def test_ndjson_reader():
    rows = []
    for f in range(10):
        for p in (1, 2):
            rows.append({"track": {"f": f, "p": p, "x": 0.1 * f * p,
                                   "y": -0.2 * f}})
    rows.append({"scene": {"id": 0, "p": 1, "s": 0, "e": 9}})
    with tempfile.NamedTemporaryFile("w", suffix=".ndjson",
                                     delete=False) as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
        path = fh.name
    try:
        fp, xy, sc, _ = read_ndjson_fast(path)
        assert fp is not None
        assert len(fp) == 20
        assert len(sc) == 1
        assert sc[0][1] == 1 and sc[0][3] == 9
        np.testing.assert_allclose(xy[0], [0.0, 0.0], atol=1e-6)
    finally:
        os.unlink(path)
