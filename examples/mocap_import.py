"""Mocap import doors: the same clip through BVH and ASCII-FBX lands on the
same canonical motion (reference poselib fbx backend / khrylib BVH reader).

Run: python examples/mocap_import.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from emloco_tpu.kinematics.bvh import load_bvh
from emloco_tpu.kinematics.fbx import KTIME_PER_SECOND, load_fbx

BVH = """HIERARCHY
ROOT Hips
{
    OFFSET 0 95 0
    CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
    JOINT LeftUpLeg
    {
        OFFSET 8 -5 0
        CHANNELS 3 Zrotation Xrotation Yrotation
        End Site { OFFSET 0 -40 0 }
    }
}
MOTION
Frames: 3
Frame Time: 0.033333
0 95 0 0 0 0 0 30 0
0 96 0 0 0 0 0 60 0
0 95 0 0 0 0 0 90 0
"""

kt = ",".join(str(int(round(t * KTIME_PER_SECOND))) for t in
              (0, 1 / 30, 2 / 30))
FBX = f"""FBXHeaderExtension:  {{ FBXVersion: 7400 }}
Objects:  {{
    Model: 1, "Model::Hips", "LimbNode" {{
        Properties70:  {{ P: "Lcl Translation", "", "", "A",0,95,0 }}
    }}
    Model: 2, "Model::LeftUpLeg", "LimbNode" {{ }}
    AnimationCurveNode: 10, "AnimCurveNode::R", "" {{ }}
    AnimationCurveNode: 11, "AnimCurveNode::T", "" {{ }}
    AnimationCurve: 20, "AnimCurve::", "" {{
        KeyTime: *3 {{ a: {kt} }}
        KeyValueFloat: *3 {{ a: 30,60,90 }}
    }}
    AnimationCurve: 21, "AnimCurve::", "" {{
        KeyTime: *3 {{ a: {kt} }}
        KeyValueFloat: *3 {{ a: 95,96,95 }}
    }}
}}
Connections:  {{
    C: "OO",2,1
    C: "OP",10,2, "Lcl Rotation"
    C: "OP",20,10, "d|X"
    C: "OP",11,1, "Lcl Translation"
    C: "OP",21,11, "d|Y"
}}
"""

m_bvh = load_bvh(BVH)
m_fbx = load_fbx(FBX, fps=30.0)
diff = np.abs(m_bvh["pose_aa"] - m_fbx["pose_aa"]).max()
print(f"frames: {m_bvh['pose_aa'].shape[0]}  fps: {m_bvh['fps']:.0f}")
print(f"max |pose_aa(BVH) - pose_aa(FBX)|: {diff:.2e}")
assert diff < 1e-4
print("both mocap doors agree")
