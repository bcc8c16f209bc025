"""Live interactive viewer served over HTTP (headless-safe).

TPU-native counterpart of the reference's Isaac Gym viewer loop and
server mode (/root/reference/pacer/pacer/env/tasks/base_task.py:135-211
camera + keyboard subscription, :351-430 event handling, :163 "headless
server mode will use the smart display"): instead of an X viewer with
keyboard shortcuts, a small HTTP server streams rendered frames and maps
each reference keyboard action to a POST /control command —

    reference key (base_task.py)        /control cmd
    SPACE "PAUSE"            (:187)  →  pause / resume
    R     "reset"            (:170)  →  reset
    J     "apply_force"      (:401-410) → push  (impulse on the focus env's
                                          root, like the -3500 N body forces)
    F     "follow"           (:171,379) → follow (camera tracks the root)
    K     "show_traj"        (:178,398) → show_traj
    LEFT/RIGHT prev/next_env (:180-181,412-419) → prev_env / next_env / env

The sim itself advances in compiled chunks (one jitted lax.scan per chunk —
an eager per-step loop would pay a remote-dispatch round trip per op on the
tunnel backend), with controls applied between chunks; that is the same
cadence as the reference, which polls viewer events once per env step.
"""
from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_PAGE = """<!doctype html>
<html><head><title>emloco_tpu viewer</title></head>
<body style="font-family:sans-serif;background:#111;color:#eee">
<h3>emloco_tpu live viewer</h3>
<img id="frame" src="/frame.png" width="560"/>
<pre id="status"></pre>
<div>
<button onclick="ctl('pause')">pause</button>
<button onclick="ctl('resume')">resume</button>
<button onclick="ctl('reset')">reset</button>
<button onclick="ctl('push')">push</button>
<button onclick="ctl('follow')">follow</button>
<button onclick="ctl('show_traj')">traj</button>
<button onclick="ctl('prev_env')">&larr; env</button>
<button onclick="ctl('next_env')">env &rarr;</button>
</div>
<script>
function ctl(cmd){fetch('/control',{method:'POST',body:JSON.stringify({cmd:cmd})});}
setInterval(function(){
  document.getElementById('frame').src='/frame.png?t='+Date.now();
  fetch('/status').then(r=>r.json()).then(
    s=>document.getElementById('status').textContent=JSON.stringify(s));
}, 500);
</script></body></html>"""


class ViewerSession:
    """Owns the env state and the compiled chunk-step; thread-safe controls.

    `agent` is an AMPAgent (or anything exposing .env and ._policy with the
    same signature); `ts` a TrainState whose params drive the policy. With
    deterministic=True the policy mean is used (the reference player's
    is_determenistic flag, amp_players.py).
    """

    def __init__(self, agent, ts, chunk_steps: int = 4,
                 deterministic: bool = True, seed: int = 0,
                 push_velocity=(-2.0, 0.0)):
        self.agent = agent
        self.ts = ts
        self.state = ts.env_state
        self.env_index = 0          # reference viewing_env_idx
        self.paused = False
        self.follow = True          # reference flags.follow
        self.show_traj = True       # reference flags.show_traj
        self.step_count = 0
        self.last_reward = 0.0
        self.last_error = None
        self.push_velocity = push_velocity
        self.chunk_steps = int(chunk_steps)
        self._lock = threading.Lock()
        self._key = jax.random.PRNGKey(seed)
        env = agent.env

        @jax.jit
        def _chunk(params, obs_norm, state, key):
            def body(carry, _):
                state, key = carry
                key, k_act = jax.random.split(key)
                obs = env.observe(state)
                a, mu, *_ = agent._policy(params, obs_norm, obs, k_act)
                act = mu if deterministic else a
                state, out = env.step(state, act)
                return (state, key), out.reward
            (state, _), rew = jax.lax.scan(body, (state, key), None,
                                           length=self.chunk_steps)
            return state, rew[-1]

        self._chunk = _chunk

    # -- sim advance ------------------------------------------------------

    def step_chunk(self):
        """Advance one compiled chunk unless paused. Returns True if the
        sim advanced."""
        with self._lock:
            if self.paused:
                return False
            self._key, k = jax.random.split(self._key)
            self.state, rew = self._chunk(self.ts.params, self.ts.obs_norm,
                                          self.state, k)
            self.step_count += self.chunk_steps
            self.last_reward = float(rew[self.env_index])
            return True

    # -- controls (reference keyboard actions, base_task.py:351-430) ------

    def control(self, cmd: str, **kw):
        with self._lock:
            n = self.state.physics.num_envs
            if cmd == "pause":
                self.paused = True
            elif cmd == "resume":
                self.paused = False
            elif cmd == "reset":                       # KEY_R
                self._key, k = jax.random.split(self._key)
                self.state = self.agent.env.reset(k)
                self.step_count = 0
            elif cmd == "push":                        # KEY_J apply_force
                dv = jnp.asarray(kw.get(
                    "velocity", self.push_velocity), dtype=jnp.float32)
                u = self.state.physics.u.at[
                    self.env_index, 0:2].add(dv[:2])
                self.state = self.state.replace(
                    physics=self.state.physics.replace(u=u))
            elif cmd == "follow":                      # KEY_F
                self.follow = not self.follow
            elif cmd == "show_traj":                   # KEY_K
                self.show_traj = not self.show_traj
            elif cmd == "prev_env":                    # KEY_LEFT
                self.env_index = (self.env_index - 1) % n
            elif cmd == "next_env":                    # KEY_RIGHT
                self.env_index = (self.env_index + 1) % n
            elif cmd == "env":
                self.env_index = int(kw.get("index", 0)) % n
            else:
                raise ValueError(f"unknown viewer command: {cmd}")
        return self.status()

    # -- rendering --------------------------------------------------------

    def render_png(self) -> bytes:
        """Render the focus env's current frame to PNG bytes (the viewer
        camera; follow mode centers on the root like viewer_camera_look_at).

        Builds a Figure directly on an Agg canvas — pyplot's Gcf registry is
        global, not thread-safe, and ThreadingHTTPServer serves concurrent
        /frame.png requests."""
        from matplotlib.backends.backend_agg import FigureCanvasAgg
        from matplotlib.figure import Figure

        from ..kinematics.visualization import plot_skeleton_state
        from ..physics import body_frame_state

        with self._lock:
            state = self.state
            idx = self.env_index
            show_traj = self.show_traj
            follow = self.follow
            step = self.step_count
            rew = self.last_reward
        pos, _, _, _ = body_frame_state(self.agent.env.model, state.physics)
        joints = np.asarray(pos[idx])                      # (24, 3)
        traj = np.asarray(state.traj_verts[idx])

        fig = Figure(figsize=(5, 5))
        FigureCanvasAgg(fig)
        ax = fig.add_subplot(111, projection="3d")
        if show_traj:
            ax.plot(traj[:, 0], traj[:, 1], traj[:, 2] * 0,
                    color="tab:red", linewidth=1, alpha=0.6)
        plot_skeleton_state(ax, joints)
        c = joints[0] if follow else np.zeros(3)
        ax.set_xlim(c[0] - 2, c[0] + 2)
        ax.set_ylim(c[1] - 2, c[1] + 2)
        ax.set_zlim(0, 2.2)
        ax.set_title(f"env {idx}  t={step}  r={rew:+.3f}", fontsize=9)
        buf = io.BytesIO()
        fig.savefig(buf, format="png", dpi=100)
        return buf.getvalue()

    def status(self) -> dict:
        return {
            "step": self.step_count,
            "env": self.env_index,
            "num_envs": int(self.state.physics.num_envs),
            "reward": self.last_reward,
            "paused": self.paused,
            "follow": self.follow,
            "show_traj": self.show_traj,
            "last_error": getattr(self, "last_error", None),
        }


class ViewerServer:
    """HTTP front-end over a ViewerSession + a paced background sim loop."""

    def __init__(self, session: ViewerSession, host: str = "127.0.0.1",
                 port: int = 8703, fps: float = 10.0):
        self.session = session
        self.fps = max(fps, 0.1)
        self._stop = threading.Event()
        sess = session

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code, payload, ctype="application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self):
                path = self.path.split("?")[0]
                try:
                    if path == "/":
                        self._reply(200, _PAGE.encode(), "text/html")
                    elif path == "/frame.png":
                        self._reply(200, sess.render_png(), "image/png")
                    elif path == "/status":
                        self._reply(200, json.dumps(sess.status()).encode())
                    else:
                        self._reply(404, b'{"error": "not found"}')
                except Exception as e:  # keep serving after a bad render
                    try:
                        self._reply(500,
                                    json.dumps({"error": str(e)}).encode())
                    except Exception:
                        pass

            def do_POST(self):
                if self.path.split("?")[0] != "/control":
                    self._reply(404, b'{"error": "not found"}')
                    return
                n = int(self.headers.get("Content-Length", 0))
                try:
                    body = json.loads(self.rfile.read(n) or b"{}")
                    cmd = body.pop("cmd")
                    out = sess.control(cmd, **body)
                    self._reply(200, json.dumps(out).encode())
                except Exception as e:  # bad command → 400, keep serving
                    self._reply(400, json.dumps({"error": str(e)}).encode())

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._http_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True)
        self._sim_thread = threading.Thread(target=self._loop, daemon=True)

    def _loop(self):
        period = 1.0 / self.fps
        while not self._stop.is_set():
            t0 = time.time()
            try:
                self.session.step_chunk()
                self.session.last_error = None
            except Exception as e:
                # transient backend errors (the tunnel TPU is known to throw
                # Internal/Unavailable mid-run) must not kill the sim thread
                # — surface in /status and retry next tick
                self.session.last_error = str(e)
            dt = time.time() - t0
            if dt < period:
                self._stop.wait(period - dt)

    def start(self):
        self._http_thread.start()
        self._sim_thread.start()
        return self

    def close(self):
        self._stop.set()
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._sim_thread.is_alive():
            self._sim_thread.join(timeout=10)
