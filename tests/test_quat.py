import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emloco_tpu.ops import quat


def rand_quat(key, shape=()):
    q = jax.random.normal(key, shape + (4,))
    return quat.normalize(q)


KEY = jax.random.PRNGKey(0)


def test_mul_identity():
    q = rand_quat(KEY, (32,))
    ident = quat.identity_like((32,))
    np.testing.assert_allclose(quat.mul(q, ident), q, atol=1e-6)
    np.testing.assert_allclose(quat.mul(ident, q), q, atol=1e-6)


def test_mul_inverse():
    q = rand_quat(KEY, (32,))
    qq = quat.mul(q, quat.inverse(q))
    np.testing.assert_allclose(qq, quat.identity_like((32,)), atol=1e-5)


def test_rotate_matches_matrix():
    k1, k2 = jax.random.split(KEY)
    q = rand_quat(k1, (64,))
    v = jax.random.normal(k2, (64, 3))
    r = quat.to_matrix(q)
    np.testing.assert_allclose(
        quat.rotate(q, v), jnp.einsum("bij,bj->bi", r, v), atol=1e-5
    )


def test_rotate_inverse_roundtrip():
    k1, k2 = jax.random.split(KEY)
    q = rand_quat(k1, (64,))
    v = jax.random.normal(k2, (64, 3))
    np.testing.assert_allclose(quat.rotate_inv(q, quat.rotate(q, v)), v, atol=1e-5)


def test_angle_axis_roundtrip():
    k1, k2 = jax.random.split(KEY)
    angle = jax.random.uniform(k2, (64,), minval=-3.0, maxval=3.0)
    axis = jax.random.normal(k1, (64, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    q = quat.from_angle_axis(angle, axis)
    a2, ax2 = quat.to_angle_axis(q)
    # angle*axis is the invariant (sign of both can flip together)
    np.testing.assert_allclose(a2[:, None] * ax2, angle[:, None] * axis, atol=1e-5)


def test_exp_map_roundtrip():
    em = jax.random.normal(KEY, (64, 3)) * 0.8
    q = quat.exp_map_to_quat(em)
    np.testing.assert_allclose(quat.to_exp_map(q), em, atol=1e-5)


def test_exp_map_zero():
    em = jnp.zeros((4, 3))
    q = quat.exp_map_to_quat(em)
    np.testing.assert_allclose(q, quat.identity_like((4,)), atol=1e-6)
    # gradient must be finite at the singularity
    g = jax.grad(lambda e: jnp.sum(quat.exp_map_to_quat(e)))(jnp.zeros(3))
    assert np.all(np.isfinite(g))


def test_matrix_roundtrip():
    q = rand_quat(KEY, (128,))
    q2 = quat.from_matrix(quat.to_matrix(q))
    # quaternion double cover: compare up to sign
    dots = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dots, jnp.ones(128), atol=1e-5)


def test_heading():
    # yaw-only rotation: heading == yaw
    yaw = jax.random.uniform(KEY, (32,), minval=-np.pi, maxval=np.pi)
    ez = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (32, 1))
    q = quat.from_angle_axis(yaw, ez)
    np.testing.assert_allclose(quat.calc_heading(q), yaw, atol=1e-5)
    # heading_quat_inv removes the heading
    hq = quat.heading_quat_inv(q)
    np.testing.assert_allclose(
        quat.calc_heading(quat.mul(hq, q)), jnp.zeros(32), atol=1e-5
    )


def test_slerp_endpoints():
    k1, k2 = jax.random.split(KEY)
    q0, q1 = rand_quat(k1, (16,)), rand_quat(k2, (16,))
    np.testing.assert_allclose(quat.slerp(q0, q1, jnp.zeros(16)), q0, atol=1e-4)
    s1 = quat.slerp(q0, q1, jnp.ones(16))
    dots = jnp.abs(jnp.sum(s1 * q1, axis=-1))
    np.testing.assert_allclose(dots, jnp.ones(16), atol=1e-4)


def test_slerp_midpoint_unit_norm():
    k1, k2 = jax.random.split(KEY)
    q0, q1 = rand_quat(k1, (16,)), rand_quat(k2, (16,))
    mid = quat.slerp(q0, q1, jnp.full(16, 0.5))
    np.testing.assert_allclose(jnp.linalg.norm(mid, axis=-1), jnp.ones(16), atol=1e-4)


def test_tan_norm_orthonormal():
    q = rand_quat(KEY, (32,))
    tn = quat.to_tan_norm(q)
    tan, norm = tn[..., :3], tn[..., 3:]
    np.testing.assert_allclose(jnp.sum(tan * norm, axis=-1), jnp.zeros(32), atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.norm(tan, axis=-1), jnp.ones(32), atol=1e-5)


def test_from_euler_xyz():
    # pure yaw
    q = quat.from_euler_xyz(jnp.zeros(1), jnp.zeros(1), jnp.array([np.pi / 2]))
    v = quat.rotate(q, jnp.array([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(v, jnp.array([[0.0, 1.0, 0.0]]), atol=1e-6)


def test_angular_velocity():
    # constant spin about z
    w = jnp.array([[0.0, 0.0, 2.0]])
    dt = 0.01
    q0 = quat.identity_like((1,))
    q1 = quat.mul(quat.exp_map_to_quat(w * dt), q0)
    west = quat.angular_velocity(q0, q1, dt)
    np.testing.assert_allclose(west, w, atol=1e-4)


@pytest.mark.parametrize("fn", [quat.mul, lambda a, b: quat.rotate(a, b[..., :3])])
def test_jit_and_vmap(fn):
    k1, k2 = jax.random.split(KEY)
    a, b = rand_quat(k1, (8, 16)), rand_quat(k2, (8, 16))
    out1 = jax.jit(fn)(a, b)
    out2 = jax.vmap(fn)(a, b)
    np.testing.assert_allclose(out1, out2, atol=1e-6)
