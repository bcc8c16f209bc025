"""Measured parity of the prediction data path against the reference's own
reader / preprocessing / export code, run on CPU.

Oracled surfaces (reference file:line → rebuild):
  * Reader_jta_all_visual_cues + paths_to_xy   reader.py:144-266
      → prediction.data.read_ndjson_scenes_all_cues
  * drop_ped_with_missing_frame / drop_distant_far   utils/data.py:79-100
      → NdjsonScenes window keep rules
  * collate_batch + batch_process_coords   dataset_jta.py:11-84
      → prediction.data.build_tokens + normalize_scene (NdjsonScenes.batch)
  * the 13→101 natural-cubic-spline export   load_jta_traj.py:66-119
      → prediction.export.spline_to_vertices

All comparisons run on the committed ndjson fixture
(tests/data/jta_all_cues_fixture.ndjson), which the repo's own writer
produced — so this also proves the writer emits files the REFERENCE reader
parses (its TrackRow_all_jta constructor indexes every cue key directly).

SURVEY §7 names these constants as the ones that silently break ADE parity;
these tests turn the docstring claims into measured ones. The reference tree
is read-only and only imported — nothing is copied.
"""
from __future__ import annotations

import os
import re
import sys

import numpy as np
import pytest

REF = "/root/reference"
ST = f"{REF}/social-transmotion"
FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "jta_all_cues_fixture.ndjson")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount not available")

torch = pytest.importorskip("torch")

OBS_F, PRED_F = 9, 12
CONFIG = {"DEVICE": "cpu",
          "TRAIN": {"input_track_size": OBS_F, "output_track_size": PRED_F}}


@pytest.fixture(scope="module")
def refmod():
    if ST not in sys.path:
        sys.path.insert(0, ST)
    import types
    ns = types.SimpleNamespace()
    from utils.trajnetplusplustools.reader import (       # noqa: E402
        Reader_jta_all_visual_cues)
    from utils.data import (                               # noqa: E402
        drop_distant_far, drop_ped_with_missing_frame)
    from dataset_jta import batch_process_coords, collate_batch  # noqa: E402
    ns.Reader = Reader_jta_all_visual_cues
    ns.drop_far = drop_distant_far
    ns.drop_missing = drop_ped_with_missing_frame
    ns.batch_process_coords = batch_process_coords
    ns.collate_batch = collate_batch
    return ns


def _reference_batch(refmod):
    """The full reference pipeline over the fixture: reader → drops →
    (N,F,47,4) tracks → collate → batch_process_coords."""
    reader = refmod.Reader(FIXTURE, scene_type="paths")
    items = []
    for _, paths in reader.scenes():
        xy = refmod.Reader.paths_to_xy(paths)              # (F, N, 188)
        xy = refmod.drop_missing(xy)
        xy, _ = refmod.drop_far(xy)
        F, N = xy.shape[:2]
        real = xy.reshape(F, N, 47, 4).transpose(1, 0, 2, 3)
        joints = torch.from_numpy(np.ascontiguousarray(real)).float()
        masks = torch.ones(joints.shape[:-1])
        items.append((joints, masks))
    joints, masks, padding_mask = refmod.collate_batch(items)
    return refmod.batch_process_coords(joints, masks, padding_mask, CONFIG)


def test_reader_and_batch_process_parity(refmod):
    from emloco_tpu.prediction.data import NdjsonScenes

    in_j, in_m, out_j, out_m, pad = _reference_batch(refmod)
    B, F_in, NJ, K = in_j.shape
    N = NJ // 47
    ref_in = in_j.reshape(B, F_in, N, 47, K).numpy()
    ref_out = out_j.reshape(B, PRED_F, N, 47, K).numpy()
    ref_pad = pad.numpy().astype(bool)                     # True = padded

    ds = NdjsonScenes(FIXTURE, max_people=N, num_3dpose=22, num_2dpose=22)
    assert len(ds) == B
    got = ds.window_batch(np.arange(B))

    # presence mask is the inverse of the reference padding mask
    np.testing.assert_array_equal(np.asarray(got.padding_mask), ~ref_pad)
    # normalized observed tokens: (B, 9, N, 47, 4), exact layout + values
    np.testing.assert_allclose(np.asarray(got.obs),
                               np.nan_to_num(ref_in, nan=0.0),
                               atol=1e-5, rtol=1e-5)
    # primary future trajectory
    np.testing.assert_allclose(np.asarray(got.gt_future),
                               ref_out[:, :, 0, 0, :2], atol=1e-5, rtol=1e-5)


def test_locoval_inputs_match_reference_extraction(refmod):
    """init pose/vel come from the RAW (pre-normalization) joints
    (train_jta.py:264-273): pose = 3d-pose tokens of the primary at the
    last observed frame; vel = (x₈ − x₇)·2.5."""
    from emloco_tpu.prediction.data import NdjsonScenes

    reader = refmod.Reader(FIXTURE, scene_type="paths")
    raw = []
    for _, paths in reader.scenes():
        xy = refmod.Reader.paths_to_xy(paths)
        xy = refmod.drop_missing(xy)
        xy, _ = refmod.drop_far(xy)
        raw.append(xy.reshape(xy.shape[0], xy.shape[1], 47, 4))
    B = len(raw)
    ref_pose = np.stack([r[OBS_F - 1, 0, 3:25, :3] for r in raw])
    ref_vel = np.stack([(r[OBS_F - 1, 0, 0, :2] - r[OBS_F - 2, 0, 0, :2])
                        * 2.5 for r in raw])

    ds = NdjsonScenes(FIXTURE, max_people=8, num_3dpose=22, num_2dpose=22)
    got = ds.window_batch(np.arange(B))
    # ours zero-pads the 22 exported joints to the 24 SMPL slots
    np.testing.assert_allclose(np.asarray(got.init_pose)[:, :22],
                               ref_pose, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.init_pose)[:, 22:], 0.0)
    np.testing.assert_allclose(np.asarray(got.init_vel), ref_vel, atol=1e-5)


def test_spline_export_parity():
    """13→101 vertices: natural cubic spline over the reference's hand-typed
    phase table, evaluated at 0..100 (load_jta_traj.py:72,92-95 — the last
    ~15 vertices extrapolate past the final knot). The phase table is parsed
    out of the reference source so a constant drift here fails loudly."""
    from scipy.interpolate import CubicSpline

    from emloco_tpu.prediction.export import (REF_TRAJ_PHASE,
                                              spline_to_vertices)

    src = open(f"{ST}/load_jta_traj.py").read()
    m = re.search(r"traj_phase\s*=\s*np\.array\(\[([^\]]*)\]\)\s*\*\s*100",
                  src)
    assert m, "reference traj_phase table not found"
    ref_phase = np.array([float(v) for v in m.group(1).split(",")]) * 100
    np.testing.assert_allclose(REF_TRAJ_PHASE, ref_phase, atol=0)

    rng = np.random.default_rng(0)
    wp = np.cumsum(rng.normal(size=(13, 2)).astype(np.float32), 0)
    ref = CubicSpline(ref_phase, wp, axis=0,
                      bc_type="natural")(np.arange(101))
    got = spline_to_vertices(wp)
    assert got.shape == (101, 2)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)


def test_writer_roundtrips_through_reference_reader(refmod, tmp_path):
    """write_ndjson_all_cues output parses through the REFERENCE reader and
    reproduces the trajectories bit-for-bit (to the writer's 4-decimal
    rounding)."""
    from emloco_tpu.prediction.data import (SyntheticScenes,
                                            write_ndjson_all_cues)

    ds = SyntheticScenes(num_people=3, seed=7, num_3dpose=22)
    scenes = [ds.scene() for _ in range(2)]
    path = str(tmp_path / "written.ndjson")
    write_ndjson_all_cues(path, scenes)

    reader = refmod.Reader(path, scene_type="paths")
    parsed = list(reader.scenes())
    assert len(parsed) == 2
    for (_, paths), sc in zip(parsed, scenes):
        xy = refmod.Reader.paths_to_xy(paths)              # (F, N, 188)
        T, N = sc["traj"].shape[:2]
        assert xy.shape[:2] == (T, N)
        np.testing.assert_allclose(xy[:, :, :2], sc["traj"], atol=5e-4)
        pose3 = xy.reshape(T, N, 47, 4)[:, :, 3:25, :3]
        np.testing.assert_allclose(pose3, sc["pose3d"], atol=5e-4)
