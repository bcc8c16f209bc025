"""Real-scan mesh ground: loaders, rasterizer parity, env-on-mesh smoke.

Reference counterpart: MeshTerrain + HumanoidPedestrian
(humanoid_pedestrain_terrain.py:996-1133, humanoid_pedestrian.py:15-51).
"""
import jax
import numpy as np

from emloco_tpu.native.terrain import fast_rasterize_trimesh
from emloco_tpu.physics import mesh_heightfield, mesh_terrain_from_file
from emloco_tpu.physics.mesh_terrain import load_mesh, rasterize_trimesh_np
from emloco_tpu.physics.terrain import height_at
import jax.numpy as jnp


def _quad_mesh():
    # 4x4 m sloped ground quad + a 1x1 m platform at z=1
    verts = np.array([[0, 0, 0], [4, 0, 0], [4, 4, 0.8], [0, 4, 0.8],
                      [1, 1, 1.0], [2, 1, 1.0], [2, 2, 1.0], [1, 2, 1.0]],
                     np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32)
    return verts, faces


def test_rasterizer_native_numpy_parity():
    verts, faces = _quad_mesh()
    h1, c1 = fast_rasterize_trimesh(verts, faces, 50, 50, 0.1, (-0.5, -0.5))
    h2, c2 = rasterize_trimesh_np(verts, faces, 50, 50, 0.1, (-0.5, -0.5))
    np.testing.assert_array_equal(c1, c2)
    both = c1 & c2
    np.testing.assert_allclose(h1[both], h2[both], atol=1e-5)


def test_mesh_heightfield_heights_and_spawn():
    verts, faces = _quad_mesh()
    hf = mesh_heightfield(verts, faces, cell=0.1)
    # platform top is sampled at z=1; slope interpolates
    z_plat = float(height_at(hf, jnp.array([1.5, 1.5])))
    assert abs(z_plat - 1.0) < 1e-4
    z_slope = float(height_at(hf, jnp.array([3.0, 3.0])))
    assert abs(z_slope - 0.6) < 0.03  # 0.8 * 3/4
    # spawn points lie on covered, walkable ground inside the quad
    xy = np.asarray(hf.spawnable_xy)
    assert len(xy) > 10
    assert xy[:, 0].min() >= -0.05 and xy[:, 0].max() <= 4.05
    assert xy[:, 1].min() >= -0.05 and xy[:, 1].max() <= 4.05


def test_obj_and_npz_loaders(tmp_path):
    verts, faces = _quad_mesh()
    obj = tmp_path / "m.obj"
    with open(obj, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for a, b, c in faces + 1:
            f.write(f"f {a} {b} {c}\n")
    v2, f2 = load_mesh(str(obj))
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)

    npz = tmp_path / "m.npz"
    np.savez(npz, vertices=verts, faces=faces)
    v3, f3 = load_mesh(str(npz))
    np.testing.assert_allclose(v3, verts, atol=1e-6)

    hf = mesh_terrain_from_file(str(obj), cell=0.1)
    assert hf.heights.ndim == 2


def test_env_runs_on_mesh_ground():
    from emloco_tpu.envs import EnvConfig, PedestrianTerrainEnv
    from emloco_tpu.kinematics import motion_lib as ml

    verts, faces = _quad_mesh()
    hf = mesh_heightfield(verts, faces, cell=0.1)
    lib = ml.synthetic_walk_motions(speeds=(1.2,), duration=1.5)
    cfg = EnvConfig(num_envs=4, sensor_res=8, episode_length=20,
                    num_amp_obs_steps=3)
    env = PedestrianTerrainEnv(cfg, hf, lib)
    key = jax.random.PRNGKey(0)
    state = env.reset(key)
    actions = jnp.zeros((4, cfg.num_actions))
    for _ in range(3):
        state, out = env.step(state, actions)
    assert np.isfinite(np.asarray(out.obs)).all()
    # roots stay above the mesh floor
    z = np.asarray(state.physics.root_pos[:, 2])
    assert (z > -0.5).all()
