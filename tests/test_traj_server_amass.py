"""Interactive trajectory server + raw AMASS ingest tests.

Reference counterparts: traj_generator.input_new_trajs (:242-258) server
mode; uhc/data_process AMASS pipeline (convert_amass_isaac.py).
"""
import json
import urllib.request

import jax.numpy as jnp
import numpy as np

from emloco_tpu.envs.traj_server import TrajInputServer, update_traj_bank
from emloco_tpu.kinematics import body_model, curation, forward_kinematics
from emloco_tpu.ops import quat


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=5) as r:
        return json.loads(r.read())


def test_traj_server_roundtrip():
    srv = TrajInputServer(port=0, num_verts=101)
    try:
        # one 13-point and one 101-point trajectory
        t13 = [[float(i) * 0.4, 0.0] for i in range(13)]
        t101 = [[0.0, float(i) * 0.05] for i in range(101)]
        out = _post(srv.port, "/trajs", [t13, t101])
        assert out["accepted"] == 2
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/status", timeout=5) as r:
            st = json.loads(r.read())
        assert st["pending"] == 2 and st["received_total"] == 2

        trajs = srv.drain()
        assert trajs.shape == (2, 101, 2)
        # 13-pt resampled to 101 keeps endpoints and linearity
        np.testing.assert_allclose(trajs[0, 0], [0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(trajs[0, -1], [4.8, 0.0], atol=1e-5)
        np.testing.assert_allclose(trajs[0, 50, 0], 2.4, atol=1e-4)
        assert srv.drain().shape == (0, 101, 2)
    finally:
        srv.close()


def test_traj_server_rejects_bad_payload():
    srv = TrajInputServer(port=0)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/trajs",
            data=json.dumps([[[0.0, 0.0, 0.0]]]).encode())
        try:
            urllib.request.urlopen(req, timeout=5)
            assert False, "should 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.close()


def test_update_traj_bank_ring():
    bank = jnp.zeros((4, 101, 2))
    new = np.ones((3, 101, 2), np.float32)
    bank, nxt = update_traj_bank(bank, new, start=2)
    assert nxt == 1
    # wrote slots 2, 3, 0
    assert float(bank[2].sum()) > 0 and float(bank[0].sum()) > 0
    assert float(bank[1].sum()) == 0.0


def _amass_like(frames=12, fps=60.0):
    """Synthetic AMASS npz dict: T-pose walking forward along smpl z at
    pelvis height y≈0.93 (y-up world)."""
    poses = np.zeros((frames, 156), np.float32)
    trans = np.stack([np.zeros(frames),
                      np.full(frames, 0.93),
                      np.linspace(0, 1.0, frames)], -1).astype(np.float32)
    return {"poses": poses, "trans": trans,
            "betas": np.zeros(10, np.float32), "mocap_framerate": fps}


def test_amass_upright_and_downsample():
    m = curation.amass_to_motion(_amass_like(), target_fps=30.0)
    assert m["pose_aa"].shape[1] == 72
    assert abs(m["fps"] - 30.0) < 1e-6
    assert len(m["pose_aa"]) == 6                 # 12 frames @60 → 6 @30
    # smpl z-forward motion becomes our x-forward; height lands in z
    tr = m["root_trans_offset"]
    assert tr[-1, 0] - tr[0, 0] > 0.8             # moved along +x
    assert abs(tr[0, 1]) < 1e-5                   # no lateral drift
    assert 0.7 < tr[0, 2] < 1.1                   # upright pelvis height

    # FK: head above ankles in every frame, min joint on the ground
    tree = body_model.canonical_skeleton()
    local = quat.exp_map_to_quat(jnp.asarray(m["pose_aa"].reshape(-1, 24, 3)))
    _, gpos = forward_kinematics(tree, local, jnp.asarray(tr))
    z = np.asarray(gpos[..., 2])
    names = list(tree.names)
    assert (z[:, names.index("Head")] > z[:, names.index("L_Ankle")]).all()
    assert abs(z.min() - 0.02) < 1e-3


def test_amass_root_yaw_conjugation():
    """90° spin about smpl's up axis (y) must become 90° about our z."""
    d = _amass_like()
    d["poses"][:, 1] = np.pi / 2      # root aa = (0, pi/2, 0) about smpl y
    m = curation.amass_to_motion(d, target_fps=30.0, ground_fix=False)
    aa_root = m["pose_aa"][:, :3]
    np.testing.assert_allclose(aa_root[0], [0.0, 0.0, np.pi / 2], atol=1e-5)


def test_conform_joints_masterfoot():
    """Subdivided-foot (masterfoot) layout maps back to the standard 24."""
    src_names = list(body_model.BODY_NAMES)
    # insert extra foot segments the standard skeleton doesn't have
    src_names.insert(5, "L_Toe_1")
    src_names.insert(6, "L_Toe_2")
    F = 3
    src = np.zeros((F, len(src_names), 3), np.float32)
    src[:, src_names.index("L_Knee")] = [0.1, 0.2, 0.3]
    src[:, src_names.index("L_Toe_1")] = [9.0, 9.0, 9.0]   # must be dropped
    out = curation.conform_joints(src.reshape(F, -1), src_names)
    out = out.reshape(F, 24, 3)
    np.testing.assert_allclose(
        out[:, list(body_model.BODY_NAMES).index("L_Knee")],
        [[0.1, 0.2, 0.3]] * F, atol=1e-6)
    assert not (out == 9.0).any()
