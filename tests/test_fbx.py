"""FBX ASCII importer (reference poselib fbx backend,
fbx_read_wrapper.py → SkeletonMotion.from_fbx): grammar parsing, curve
sampling, Euler composition, joint conformance, bvh-door parity."""
import numpy as np

from emloco_tpu.kinematics.bvh import load_bvh
from emloco_tpu.kinematics.fbx import (KTIME_PER_SECOND, load_fbx,
                                       parse_fbx_ascii, skeleton_from_fbx)


def _curve(cid, times_s, values):
    kt = ",".join(str(int(round(t * KTIME_PER_SECOND))) for t in times_s)
    kv = ",".join(f"{v}" for v in values)
    n = len(values)
    return f"""
    AnimationCurve: {cid}, "AnimCurve::", "" {{
        Default: 0
        KeyTime: *{n} {{ a: {kt} }}
        KeyValueFloat: *{n} {{ a: {kv} }}
    }}"""


def make_fixture(fps=30.0, frames=12):
    """Three-joint chain (Hips → LeftUpLeg → LeftLeg) with a rotation curve
    on LeftLeg.X and a translation curve on Hips.Y, ASCII FBX 7.x layout."""
    t_end = (frames - 1) / fps
    times = [0.0, t_end / 2, t_end]
    body = f"""; FBX 7.4.0 project file
FBXHeaderExtension:  {{
    FBXVersion: 7400
}}
Objects:  {{
    Model: 1001, "Model::Hips", "LimbNode" {{
        Properties70:  {{
            P: "Lcl Translation", "Lcl Translation", "", "A",0,95,0
            P: "Lcl Rotation", "Lcl Rotation", "", "A",0,0,0
        }}
    }}
    Model: 1002, "Model::LeftUpLeg", "LimbNode" {{
        Properties70:  {{
            P: "Lcl Translation", "Lcl Translation", "", "A",8,-5,0
        }}
    }}
    Model: 1003, "Model::LeftLeg", "LimbNode" {{
        Properties70:  {{
            P: "Lcl Translation", "Lcl Translation", "", "A",0,-40,0
        }}
    }}
    AnimationCurveNode: 2001, "AnimCurveNode::R", "" {{
        Properties70:  {{
            P: "d|X", "Number", "", "A",0
        }}
    }}
    AnimationCurveNode: 2002, "AnimCurveNode::T", "" {{
    }}{_curve(3001, times, [0.0, 45.0, 90.0])}{_curve(3002, times,
                                                      [95.0, 100.0, 95.0])}
}}
Connections:  {{
    C: "OO",1002,1001
    C: "OO",1003,1002
    C: "OP",2001,1003, "Lcl Rotation"
    C: "OP",3001,2001, "d|X"
    C: "OP",2002,1001, "Lcl Translation"
    C: "OP",3002,2002, "d|Y"
}}
"""
    return body


def test_parser_grammar():
    root = parse_fbx_ascii(make_fixture())
    objects = root.first("Objects")
    assert objects is not None
    assert len(objects.find("Model")) == 3
    assert len(objects.find("AnimationCurve")) == 2
    hips = objects.find("Model")[0]
    assert hips.values[0] == 1001 and hips.values[2] == "LimbNode"
    # header survives alongside
    assert root.first("FBXHeaderExtension").first("FBXVersion").values == \
        [7400]


def test_skeleton_topology():
    names, parents = skeleton_from_fbx(make_fixture())
    assert names == ["Hips", "LeftUpLeg", "LeftLeg"]
    assert parents == [-1, 0, 1]


def test_load_fbx_motion_dict():
    m = load_fbx(make_fixture(), fps=30.0)
    F = m["pose_aa"].shape[0]
    assert m["pose_aa"].shape == (F, 72)
    assert m["root_trans_offset"].shape == (F, 3)
    assert m["fps"] == 30.0
    assert F == 12
    pose = m["pose_aa"].reshape(F, 24, 3)
    from emloco_tpu.kinematics.body_model import BODY_NAMES
    knee = BODY_NAMES.index("L_Knee")
    # LeftLeg.X ramps 0→90°: at the final frame the knee's axis-angle is a
    # pure rotation of π/2 magnitude; frame 0 is identity
    np.testing.assert_allclose(pose[0, knee], 0.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(pose[-1, knee]), np.pi / 2,
                               atol=0.02)
    # linear key interpolation between the 0°/45°/90° keys
    t_end = (F - 1) / 30.0
    expect = np.deg2rad(np.interp(6 / 30.0, [0, t_end / 2, t_end],
                                  [0, 45, 90]))
    np.testing.assert_allclose(np.linalg.norm(pose[6, knee]), expect,
                               atol=0.01)
    # root translation: cm→m scale + y-up→z-up basis change puts the 95 cm
    # hip height on z
    np.testing.assert_allclose(m["root_trans_offset"][0, 2], 0.95, atol=1e-4)
    # unanimated joints stay identity
    hip = BODY_NAMES.index("L_Hip")
    np.testing.assert_allclose(pose[:, hip], 0.0, atol=1e-5)


def test_fbx_matches_bvh_door():
    """The same motion through both mocap doors lands on the same canonical
    pose tensor (X-rotation on the left knee, identical clocks)."""
    fbx = load_fbx(make_fixture(), fps=30.0)
    bvh_text = """HIERARCHY
ROOT Hips
{
    OFFSET 0 95 0
    CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
    JOINT LeftUpLeg
    {
        OFFSET 8 -5 0
        CHANNELS 3 Zrotation Xrotation Yrotation
        JOINT LeftLeg
        {
            OFFSET 0 -40 0
            CHANNELS 3 Zrotation Xrotation Yrotation
            End Site
            {
                OFFSET 0 -40 0
            }
        }
    }
}
MOTION
Frames: 12
Frame Time: 0.0333333
"""
    fps, F = 30.0, 12
    t_end = (F - 1) / fps
    rows = []
    for f in range(F):
        t = f / fps
        ang = np.interp(t, [0, t_end / 2, t_end], [0, 45, 90])
        ty = np.interp(t, [0, t_end / 2, t_end], [95, 100, 95])
        rows.append(f"0 {ty} 0 0 0 0 0 0 0 0 {ang} 0")
    bvh = load_bvh(bvh_text + "\n".join(rows))
    np.testing.assert_allclose(fbx["pose_aa"], bvh["pose_aa"], atol=1e-4)
    np.testing.assert_allclose(fbx["root_trans_offset"],
                               bvh["root_trans_offset"], atol=1e-4)


def _one_joint_fixture(rot_axis_curves, static_rot=None, pre_rot=None,
                       times=(0.0, 0.5, 1.0)):
    """Single-joint FBX with selectable animated axes / static props."""
    props = []
    if static_rot is not None:
        r = ",".join(str(v) for v in static_rot)
        props.append(f'P: "Lcl Rotation", "Lcl Rotation", "", "A",{r}')
    if pre_rot is not None:
        r = ",".join(str(v) for v in pre_rot)
        props.append(f'P: "PreRotation", "Vector3D", "", "A",{r}')
    props = "\n            ".join(props)
    curves, conns = [], []
    for k, (axis, vals) in enumerate(rot_axis_curves.items()):
        cid = 3000 + k
        curves.append(_curve(cid, list(times), vals))
        conns.append(f'    C: "OP",{cid},2001, "d|{axis}"')
    return f"""FBXHeaderExtension:  {{ FBXVersion: 7400 }}
Objects:  {{
    Model: 1001, "Model::Hips", "LimbNode" {{
        Properties70:  {{
            {props}
        }}
    }}
    AnimationCurveNode: 2001, "AnimCurveNode::R", "" {{ }}{''.join(curves)}
}}
Connections:  {{
    C: "OP",2001,1001, "Lcl Rotation"
{chr(10).join(conns)}
}}
"""


def test_sparse_keys_do_not_round_fps_to_zero():
    """Keyed-on-change takes with multi-second key spacing must not infer
    fps=0 (round(1/dt) with dt > 2 s)."""
    m = load_fbx(_one_joint_fixture({"X": [0.0, 20.0, 40.0]},
                                    times=(0.0, 4.0, 8.0)))
    assert m["fps"] > 0
    assert np.all(np.isfinite(m["pose_aa"]))
    assert m["pose_aa"].shape[0] >= 2


def test_clock_anchors_at_first_key():
    """A take starting at t=10 s must not get a 10 s frozen prefix."""
    m = load_fbx(_one_joint_fixture(
        {"X": [0.0, 45.0, 90.0]}, times=(10.0, 10.5, 11.0)), fps=30.0)
    assert m["pose_aa"].shape[0] == 31        # 1 s span, not 11 s
    pose = m["pose_aa"].reshape(-1, 24, 3)
    np.testing.assert_allclose(np.linalg.norm(pose[-1, 0]), np.pi / 2,
                               atol=0.02)


def test_partially_animated_joint_keeps_static_axes():
    """A curve on X only must compose with the static Y rotation, not
    zero it (SDK EvaluateLocalTransform semantics)."""
    m_xy = load_fbx(_one_joint_fixture({"X": [30.0, 30.0, 30.0]},
                                       static_rot=(0, 45, 0)), fps=30.0)
    m_ref = load_fbx(_one_joint_fixture({"X": [30.0, 30.0, 30.0],
                                         "Y": [45.0, 45.0, 45.0]}),
                     fps=30.0)
    np.testing.assert_allclose(m_xy["pose_aa"], m_ref["pose_aa"], atol=1e-4)


def test_pre_rotation_composes():
    """PreRotation (joint orient) composes as R = Rpre · Reuler — a 90° X
    orient plus a 30° X euler equals a 120° X rotation."""
    m = load_fbx(_one_joint_fixture({"X": [30.0, 30.0, 30.0]},
                                    pre_rot=(90, 0, 0)), fps=30.0)
    pose = m["pose_aa"].reshape(-1, 24, 3)
    np.testing.assert_allclose(np.linalg.norm(pose[0, 0]),
                               np.deg2rad(120.0), atol=1e-3)


def test_skeleton_filter_and_missing_sections():
    """Mesh/camera Model nodes are not joints; malformed files raise
    ValueError (not AttributeError)."""
    text = make_fixture().replace(
        'Model: 1003, "Model::LeftLeg", "LimbNode"',
        'Model: 1003, "Model::LeftLegMesh", "Mesh"')
    names, parents = skeleton_from_fbx(text)
    assert names == ["Hips", "LeftUpLeg"]
    import pytest
    with pytest.raises(ValueError):
        skeleton_from_fbx("FBXHeaderExtension: { FBXVersion: 7400 }\n")


def test_binary_roundtrip_matches_ascii():
    """Binary (Kaydara) container: parse_fbx_ascii -> write_fbx_binary ->
    load_fbx(bytes) reproduces the ASCII motion dict exactly (the SDK's
    native container, poselib fbx backend; reference reads binary only)."""
    from emloco_tpu.kinematics.fbx import (BINARY_MAGIC, parse_fbx_ascii,
                                           write_fbx_binary)

    text = make_fixture()
    blob = write_fbx_binary(parse_fbx_ascii(text))
    assert blob.startswith(BINARY_MAGIC)
    m_bin = load_fbx(blob, fps=30.0)
    m_txt = load_fbx(text, fps=30.0)
    np.testing.assert_allclose(m_bin["pose_aa"], m_txt["pose_aa"], atol=1e-6)
    np.testing.assert_allclose(m_bin["root_trans_offset"],
                               m_txt["root_trans_offset"], atol=1e-6)
    assert m_bin["fps"] == m_txt["fps"]
    # topology reader takes the binary container too
    names_b, parents_b = skeleton_from_fbx(blob)
    names_t, parents_t = skeleton_from_fbx(text)
    assert names_b == names_t and parents_b == parents_t


def test_binary_v7500_and_compression(tmp_path):
    """64-bit node headers (FBXVersion >= 7500) and zlib-deflated arrays
    both parse; file-path sniffing picks the binary door by magic."""
    from emloco_tpu.kinematics.fbx import parse_fbx_ascii, write_fbx_binary

    text = make_fixture(frames=64)
    tree = parse_fbx_ascii(text)
    for version, compress in ((7500, True), (7400, False), (7700, False)):
        blob = write_fbx_binary(tree, version=version,
                                compress_arrays=compress)
        m = load_fbx(blob, fps=30.0)
        np.testing.assert_allclose(m["pose_aa"],
                                   load_fbx(text, fps=30.0)["pose_aa"],
                                   atol=1e-6)
    p = tmp_path / "take.fbx"
    p.write_bytes(write_fbx_binary(tree, version=7500))
    m = load_fbx(str(p), fps=30.0)
    assert m["pose_aa"].shape == (64, 72)
