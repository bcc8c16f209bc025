import jax
import jax.numpy as jnp
import numpy as np

from emloco_tpu.kinematics import SkeletonTree, forward_kinematics, local_from_global
from emloco_tpu.kinematics import body_model
from emloco_tpu.ops import quat

KEY = jax.random.PRNGKey(1)


def _rand_local_rot(key, shape):
    q = jax.random.normal(key, shape + (4,))
    return quat.normalize(q)


def test_canonical_skeleton_shape():
    tree = body_model.canonical_skeleton()
    assert tree.num_joints == 24
    assert tree.parents[0] == -1
    # left/right symmetry of offsets (y-axis mirror)
    lt = tree.local_translation
    li = tree.index("L_Hip")
    ri = tree.index("R_Hip")
    np.testing.assert_allclose(lt[li] * np.array([1, -1, 1]), lt[ri], atol=1e-6)


def test_fk_rest_pose_heights():
    """In the rest pose the head must be highest and ankles near the bottom."""
    tree = body_model.canonical_skeleton()
    J = tree.num_joints
    local_rot = quat.identity_like((1, J))
    root_pos = jnp.array([[0.0, 0.0, 0.93]])
    grot, gpos = forward_kinematics(tree, local_rot, root_pos)
    names = list(tree.names)
    z = np.asarray(gpos[0, :, 2])
    assert z[names.index("Head")] == z.max()
    assert z[names.index("L_Ankle")] < 0.15
    assert abs(z[names.index("L_Ankle")] - z[names.index("R_Ankle")]) < 1e-6
    # identity rotations propagate
    np.testing.assert_allclose(grot[0], quat.identity_like((J,)), atol=1e-6)


def test_fk_local_roundtrip():
    tree = body_model.canonical_skeleton()
    J = tree.num_joints
    local_rot = _rand_local_rot(KEY, (4, J))
    root_pos = jnp.zeros((4, 3))
    grot, _ = forward_kinematics(tree, local_rot, root_pos)
    rec = local_from_global(tree, grot)
    dots = jnp.abs(jnp.sum(rec * local_rot, axis=-1))
    np.testing.assert_allclose(dots, jnp.ones((4, J)), atol=1e-5)


def test_fk_root_rotation_moves_children():
    tree = body_model.canonical_skeleton()
    J = tree.num_joints
    local_rot = quat.identity_like((1, J))
    yaw = jnp.array([np.pi / 2])
    rootq = quat.from_angle_axis(yaw, jnp.array([[0.0, 0.0, 1.0]]))
    local_rot = local_rot.at[:, 0].set(rootq)
    _, gpos = forward_kinematics(tree, local_rot, jnp.zeros((1, 3)))
    # L_Hip offset (0, +y, -z) rotates to (-y→x?) yaw +90°: (x,y)→(-y,x)
    lh = tree.local_translation[tree.index("L_Hip")]
    expect = np.array([-lh[1], lh[0], lh[2]])
    np.testing.assert_allclose(gpos[0, tree.index("L_Hip")], expect, atol=1e-5)


def test_fk_jit_vmap_consistency():
    tree = body_model.canonical_skeleton()
    J = tree.num_joints
    local_rot = _rand_local_rot(KEY, (8, J))
    root_pos = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    f = lambda lr, rp: forward_kinematics(tree, lr, rp)
    r1, p1 = jax.jit(f)(local_rot, root_pos)
    r2, p2 = jax.vmap(lambda lr, rp: forward_kinematics(tree, lr, rp))(
        local_rot, root_pos
    )
    np.testing.assert_allclose(p1, p2, atol=1e-5)
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_body_params_batched():
    betas = jax.random.normal(KEY, (16, 16))
    bp = body_model.build_body_params(betas)
    assert bp.local_offsets.shape == (16, 24, 3)
    assert bp.mass.shape == (16, 24)
    assert bp.kp.shape == (16, 23)
    assert np.all(np.asarray(bp.mass) > 0)
    assert np.all(np.asarray(bp.capsule_half) > 0)
    assert np.all(np.isfinite(np.asarray(bp.inv_inertia)))
    # zero betas → default mass ~77 kg
    bp0 = body_model.build_body_params(jnp.zeros((1, 16)))
    np.testing.assert_allclose(
        np.asarray(bp0.mass.sum()), body_model.DEFAULT_HUMANOID_MASS, rtol=1e-3
    )


def test_body_params_beta_scaling():
    """beta[0] grows everything; taller humanoid → larger height offset."""
    bp_small = body_model.build_body_params(jnp.array([[-2.0] + [0.0] * 15]))
    bp_big = body_model.build_body_params(jnp.array([[2.0] + [0.0] * 15]))
    assert float(bp_big.height_offset[0]) > float(bp_small.height_offset[0])
    assert float(bp_big.mass.sum()) > float(bp_small.mass.sum())


def test_body_params_jit():
    f = jax.jit(body_model.build_body_params)
    bp = f(jnp.zeros((2, 16)))
    assert bp.local_offsets.shape == (2, 24, 3)
