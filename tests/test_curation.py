"""Motion-dataset curation tests (filter/split/merge + L/R flip augmentation).

Oracle for the flip: forward kinematics of the mirrored motion must equal the
y-mirror of the original motion's FK (the reference's flip augmentation,
convert_amass_isaac.py:302-304, relies on the same invariant).
"""
import jax.numpy as jnp
import numpy as np

from emloco_tpu.kinematics import body_model, curation, forward_kinematics
from emloco_tpu.ops import quat


def _make_motion(frames=20, fps=30.0, seed=0):
    rng = np.random.RandomState(seed)
    pose = rng.uniform(-0.4, 0.4, size=(frames, 72)).astype(np.float32)
    trans = np.cumsum(
        rng.uniform(-0.02, 0.02, size=(frames, 3)), axis=0).astype(np.float32)
    trans[:, 2] += 0.93
    return {"pose_aa": pose, "root_trans_offset": trans,
            "beta": np.zeros(16, np.float32), "fps": fps}


def test_filter_by_duration_and_name():
    d = {"walk_a": _make_motion(frames=60),     # 2.0 s
         "walk_b": _make_motion(frames=15),     # 0.5 s
         "run_c": _make_motion(frames=90)}      # 3.0 s
    out = curation.filter_motions(d, min_seconds=1.0)
    assert set(out) == {"walk_a", "run_c"}
    out = curation.filter_motions(d, min_seconds=0.0, max_seconds=2.5)
    assert set(out) == {"walk_a", "walk_b"}
    out = curation.filter_motions(d, min_seconds=0.0, name_allowlist=["walk"])
    assert set(out) == {"walk_a", "walk_b"}
    out = curation.filter_motions(
        d, min_seconds=0.0, predicate=lambda n, m: m["fps"] == 30.0)
    assert len(out) == 3


def test_split_is_disjoint_and_total():
    d = {f"m{i}": _make_motion(seed=i) for i in range(10)}
    train, test = curation.train_test_split(d, test_frac=0.2, seed=3)
    assert len(train) + len(test) == 10
    assert not set(train) & set(test)
    assert len(test) == 2


def test_merge_keeps_all():
    a = {"x": _make_motion(seed=1)}
    b = {"x": _make_motion(seed=2), "y": _make_motion(seed=3)}
    out = curation.merge_motion_dicts(a, b)
    assert len(out) == 3


def test_flip_fk_mirror_oracle():
    """FK(flip(motion)) == y-mirror of FK(motion), with L/R joints swapped."""
    m = _make_motion(frames=8, seed=5)
    f = curation.flip_motion_lr(m)
    tree = body_model.canonical_skeleton()

    def fk(motion):
        pose = jnp.asarray(motion["pose_aa"]).reshape(-1, 24, 3)
        local_rot = quat.exp_map_to_quat(pose)
        root_pos = jnp.asarray(motion["root_trans_offset"])
        _, gpos = forward_kinematics(tree, local_rot, root_pos)
        return np.asarray(gpos)  # (F, 24, 3)

    orig, flip = fk(m), fk(f)
    mirror = orig * np.array([1.0, -1.0, 1.0])
    swap = np.asarray(curation._mirror_joint_index())
    np.testing.assert_allclose(flip, mirror[:, swap], atol=1e-5)


def test_augment_with_flips_doubles():
    d = {"a": _make_motion(seed=1), "b": _make_motion(seed=2)}
    out = curation.augment_with_flips(d)
    assert set(out) == {"a", "b", "a_flip", "b_flip"}


def test_roundtrip_pickle(tmp_path):
    d = {"a": _make_motion()}
    p = str(tmp_path / "m.pkl")
    curation.save_motion_dict(d, p)
    d2 = curation.load_motion_dict(p)
    np.testing.assert_array_equal(d["a"]["pose_aa"], d2["a"]["pose_aa"])
