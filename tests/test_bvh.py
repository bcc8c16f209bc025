"""BVH mocap import tests (poselib fbx/khrylib-bvh ingestion counterpart)."""
import numpy as np

from emloco_tpu.kinematics import body_model
from emloco_tpu.kinematics.bvh import load_bvh, parse_bvh

_BVH = """HIERARCHY
ROOT Hips
{
  OFFSET 0.0 0.0 0.0
  CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
  JOINT LeftUpLeg
  {
    OFFSET 8.0 -5.0 0.0
    CHANNELS 3 Zrotation Xrotation Yrotation
    JOINT LeftLeg
    {
      OFFSET 0.0 -40.0 0.0
      CHANNELS 3 Zrotation Xrotation Yrotation
      End Site
      {
        OFFSET 0.0 -40.0 0.0
      }
    }
  }
  JOINT Spine
  {
    OFFSET 0.0 10.0 0.0
    CHANNELS 3 Zrotation Xrotation Yrotation
    End Site
    {
      OFFSET 0.0 20.0 0.0
    }
  }
}
MOTION
Frames: 2
Frame Time: 0.033333
0.0 93.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0
0.0 93.0 10.0 0.0 0.0 90.0 30.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0
"""


def test_parse_topology_and_frames():
    joints, frames, ft = parse_bvh(_BVH)
    assert [j.name for j in joints] == ["Hips", "LeftUpLeg", "LeftLeg",
                                        "Spine"]
    assert [j.parent for j in joints] == [-1, 0, 1, 0]
    assert frames.shape == (2, 15)
    assert abs(ft - 0.033333) < 1e-6
    np.testing.assert_allclose(joints[1].offset, [8.0, -5.0, 0.0])


def test_load_bvh_motion_dict():
    m = load_bvh(_BVH, scale=0.01)
    assert m["pose_aa"].shape == (2, 72)
    assert abs(m["fps"] - 30.0) < 0.1
    # root translation: bvh (0, 93, 0) cm y-up → (0, 0, 0.93) m z-up
    np.testing.assert_allclose(m["root_trans_offset"][0], [0.0, 0.0, 0.93],
                               atol=1e-6)
    # frame 1: z-translation 10 cm (bvh z = forward) → our x = 0.10
    np.testing.assert_allclose(m["root_trans_offset"][1, 0], 0.10, atol=1e-6)

    pose = m["pose_aa"].reshape(2, 24, 3)
    names = list(body_model.BODY_NAMES)
    # frame 0 is the rest pose
    np.testing.assert_allclose(pose[0], 0.0, atol=1e-7)
    # frame 1: Hips Yrotation 90° (bvh y = up) → our z-axis rotation
    root = pose[1, names.index("Pelvis")]
    np.testing.assert_allclose(root, [0.0, 0.0, np.pi / 2], atol=1e-5)
    # LeftUpLeg Zrotation 30° (bvh z = forward) → our x-axis rotation
    lhip = pose[1, names.index("L_Hip")]
    np.testing.assert_allclose(lhip, [np.pi / 6, 0.0, 0.0], atol=1e-5)
    # Spine mapped to Torso and unrotated
    np.testing.assert_allclose(pose[1, names.index("Torso")], 0.0, atol=1e-7)


def test_load_bvh_feeds_motion_lib(tmp_path):
    from emloco_tpu.kinematics import curation, motion_lib as ml

    p = str(tmp_path / "clip.bvh")
    with open(p, "w") as f:
        f.write(_BVH)
    m = load_bvh(p)
    pkl = str(tmp_path / "m.pkl")
    curation.save_motion_dict({"clip": m}, pkl)
    lib = ml.load_reference_pkl(pkl)
    assert lib.num_motions == 1
