"""Live viewer server (reference Isaac Gym viewer loop + server mode,
base_task.py:135-211, 351-430): compiled chunk stepping, keyboard-action
parity controls, PNG frame rendering, HTTP round trips."""
import json
import urllib.error
import urllib.request

import jax
import numpy as np

from emloco_tpu.envs import EnvConfig, PedestrianTerrainEnv
from emloco_tpu.envs.viewer_server import ViewerServer, ViewerSession
from emloco_tpu.kinematics import motion_lib as ml
from emloco_tpu.learning.amp_agent import AMPAgent, AMPConfig
from emloco_tpu.physics import flat_terrain


def tiny_session():
    cfg = EnvConfig(num_envs=4, sensor_res=8, episode_length=24,
                    num_amp_obs_steps=3)
    terrain = flat_terrain(extent=20.0, cell=0.1)
    lib = ml.synthetic_walk_motions(speeds=(1.0,), duration=2.0)
    env = PedestrianTerrainEnv(cfg, terrain, lib)
    acfg = AMPConfig(horizon=4, num_minibatches=2, mini_epochs=2,
                     amp_batch_size=8, amp_replay_size=64)
    agent = AMPAgent(env, acfg)
    ts = agent.init(jax.random.PRNGKey(0))
    return ViewerSession(agent, ts, chunk_steps=2)


def test_session_steps_and_controls():
    sess = tiny_session()
    assert sess.step_chunk()
    assert sess.step_count == 2

    # SPACE pause (base_task.py:187): no sim advance while paused
    sess.control("pause")
    assert not sess.step_chunk()
    assert sess.step_count == 2
    sess.control("resume")
    assert sess.step_chunk()

    # KEY_J apply_force (base_task.py:401-410): root velocity changes
    u_before = np.asarray(sess.state.physics.u[0, 0:2])
    sess.control("push", velocity=[-2.0, 1.0])
    u_after = np.asarray(sess.state.physics.u[0, 0:2])
    np.testing.assert_allclose(u_after - u_before, [-2.0, 1.0], atol=1e-5)

    # env switching wraps (KEY_LEFT/KEY_RIGHT, base_task.py:412-419)
    sess.control("prev_env")
    assert sess.env_index == 3
    sess.control("next_env")
    assert sess.env_index == 0
    sess.control("env", index=6)
    assert sess.env_index == 2

    # KEY_R reset (base_task.py:170): step counter back to zero
    sess.control("reset")
    assert sess.step_count == 0

    st = sess.status()
    assert st["num_envs"] == 4 and not st["paused"]


def test_render_png_and_http_roundtrip():
    sess = tiny_session()
    sess.step_chunk()
    png = sess.render_png()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"

    server = ViewerServer(sess, port=0, fps=4.0).start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        with urllib.request.urlopen(base + "/status", timeout=30) as r:
            st = json.loads(r.read())
        assert st["num_envs"] == 4
        with urllib.request.urlopen(base + "/frame.png", timeout=60) as r:
            assert r.read()[:4] == b"\x89PNG"
        with urllib.request.urlopen(base + "/", timeout=30) as r:
            assert b"emloco_tpu" in r.read()
        req = urllib.request.Request(
            base + "/control", data=json.dumps({"cmd": "pause"}).encode(),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["paused"] is True
        # unknown command → 400, server keeps serving
        req = urllib.request.Request(
            base + "/control", data=json.dumps({"cmd": "bogus"}).encode(),
            method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.close()
