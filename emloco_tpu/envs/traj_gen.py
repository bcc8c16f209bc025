"""Trajectory generation — procedural random walks and real-path banks.

Pure-functional counterpart of the reference TrajGenerator
(/root/reference/pacer/pacer/env/util/traj_generator.py:19-296): trajectories
are (V, 3) vertex chains per env, resampled fully on-device so resets can live
inside a compiled rollout. Supports:
  * procedural random walks with heading-rate / acceleration caps and sharp
    turns (reference reset, :60-118)
  * real-path banks (e.g. JTA/JRDB exports — reference pkl loading :40-54 and
    real-path branch :121-161), with hybrid sampling probability
  * initial-heading alignment of real paths and the negative-sample heading
    inversion used for LocoVal hard negatives (reference :177-234)
  * root-speed adjustment (adjust_root_vel, :100-106)
  * linear interpolation queries (calc_pos, :278-296)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class TrajConfig(struct.PyTreeNode):
    num_verts: int = struct.field(pytree_node=False, default=101)
    episode_dur: float = struct.field(pytree_node=False, default=10.0)
    speed_min: float = struct.field(pytree_node=False, default=0.0005)
    speed_max: float = struct.field(pytree_node=False, default=3.0)
    accel_max: float = struct.field(pytree_node=False, default=2.0)
    dtheta_max: float = struct.field(pytree_node=False, default=2.0)
    sharp_turn_prob: float = struct.field(pytree_node=False, default=0.02)
    # probability of a procedural (random) trajectory when a real bank exists
    hybrid_init_prob: float = struct.field(pytree_node=False, default=0.5)
    adjust_root_vel: bool = struct.field(pytree_node=False, default=True)
    init_heading: bool = struct.field(pytree_node=False, default=True)
    # fraction of real paths flipped 180° as LocoVal hard negatives
    heading_inversion_prob: float = struct.field(pytree_node=False, default=0.0)
    fixed_path: bool = struct.field(pytree_node=False, default=False)
    slow: bool = struct.field(pytree_node=False, default=False)

    @property
    def dt(self):
        return self.episode_dur / (self.num_verts - 1)


def procedural_verts(key, n, cfg: TrajConfig, init_pos, root_vel=None):
    """Random-walk trajectories (reference traj_generator.py:63-117).

    init_pos (n,3); returns verts (n, V, 3) with verts[:,0,:2] = init xy.
    """
    V = cfg.num_verts
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    dtheta = (2 * jax.random.uniform(k1, (n, V - 1)) - 1) * cfg.dtheta_max * cfg.dt
    sharp = jax.random.uniform(k2, (n, V - 1)) < cfg.sharp_turn_prob
    dtheta_sharp = np.pi * (2 * jax.random.uniform(k3, (n, V - 1)) - 1)
    dtheta = jnp.where(sharp, dtheta_sharp, dtheta)
    heading0 = np.pi * (2 * jax.random.uniform(k4, (n,)) - 1)
    dtheta = dtheta.at[:, 0].set(heading0)

    dspeed = (2 * jax.random.uniform(k5, (n, V - 1)) - 1) * cfg.accel_max * cfg.dt
    speed0 = (jax.random.uniform(jax.random.fold_in(k5, 1), (n,))
              * (cfg.speed_max - cfg.speed_min) + cfg.speed_min)
    dspeed = dspeed.at[:, 0].set(speed0)

    def clip_speed(prev, d):
        s = jnp.clip(prev + d, cfg.speed_min, cfg.speed_max)
        return s, s

    _, speed = jax.lax.scan(clip_speed, dspeed[:, 0] * 0 + speed0,
                            dspeed.T[1:])
    speed = jnp.concatenate([speed0[None], speed], axis=0).T  # (n, V-1)

    if cfg.fixed_path:
        dtheta = jnp.zeros_like(dtheta)
        speed = jnp.full_like(speed, (cfg.speed_min + cfg.speed_max) / 2)
    if cfg.slow:
        speed = speed / 4

    if cfg.adjust_root_vel and root_vel is not None:
        root_speed = jnp.linalg.norm(root_vel[:, :2], axis=-1)
        ratio = root_speed / jnp.maximum(speed[:, 0], 1e-6)
        speed = jnp.clip(speed * ratio[:, None], cfg.speed_min, cfg.speed_max)

    theta = jnp.cumsum(dtheta, axis=-1)
    seg = speed * cfg.dt
    dpos = jnp.stack([jnp.cos(theta), -jnp.sin(theta),
                      jnp.zeros_like(theta)], -1) * seg[..., None]
    dpos = dpos.at[:, 0, 0:2].add(init_pos[:, None, 0:2][:, 0])
    verts = jnp.cumsum(dpos, axis=-2)
    first = jnp.concatenate([init_pos[:, :2],
                             jnp.zeros_like(init_pos[:, :1])], -1)
    return jnp.concatenate([first[:, None], verts], axis=1)


def align_real_paths(paths, init_pos, root_vel=None, init_heading=True,
                     invert=None):
    """Shift a bank sample to start at init_pos and rotate its first segment
    to the root's heading (reference :177-234). paths (n, V, 2).

    invert (n,) bool: heading-inverted envs rotate so the path points
    OPPOSITE the root's facing (reference rot_diff = init_heading − root_rot
    + π, traj_generator.py:195-200) — the LocoVal hard negative: a
    trajectory the humanoid would have to walk backward to follow."""
    p = paths - paths[:, 0:1]
    if init_heading and root_vel is not None:
        tgt = jnp.arctan2(root_vel[:, 1], root_vel[:, 0])
        if invert is not None:
            tgt = tgt + jnp.where(invert, jnp.pi, 0.0)
        d0 = p[:, 1] - p[:, 0]
        src = jnp.arctan2(d0[..., 1], d0[..., 0])
        a = tgt - src
        ca, sa = jnp.cos(a), jnp.sin(a)
        rot = jnp.stack([jnp.stack([ca, -sa], -1),
                         jnp.stack([sa, ca], -1)], -2)
        p = jnp.einsum("nij,nvj->nvi", rot, p)
    return p + init_pos[:, None, :2]


def sample_traj(key, cfg: TrajConfig, init_pos, root_vel=None,
                real_bank=None):
    """Full reset: procedural or real-bank trajectory per env (hybrid prob,
    reference :121-161). Returns (verts (n,V,3), inverted (n,) bool)."""
    n = init_pos.shape[0]
    k_proc, k_pick, k_mix, k_inv = jax.random.split(key, 4)
    verts = procedural_verts(k_proc, n, cfg, init_pos, root_vel)
    inverted = jnp.zeros((n,), bool)
    if real_bank is None and cfg.heading_inversion_prob > 0.0:
        raise ValueError(
            "heading_inversion_prob > 0 requires a real trajectory bank "
            "(inversion is defined on real-path resets, "
            "traj_generator.py:121-200)")
    if real_bank is not None:
        P = real_bank.shape[0]
        idx = jax.random.randint(k_pick, (n,), 0, P)
        picked = real_bank[idx]                          # (n, V, 2)
        # inversion only exists under init-heading alignment (the reference's
        # heading_inversion branch lives inside `if flags.init_heading:`,
        # traj_generator.py:177-200); a pre-alignment point-mirror would be
        # cancelled by the alignment rotation
        do_inv = cfg.init_heading and root_vel is not None
        if cfg.heading_inversion_prob > 0.0 and not do_inv:
            # fail loudly at trace time: a valuenet run that configures hard
            # negatives but disables init-heading (or has no root velocity)
            # would otherwise silently train with zero inverted episodes
            raise ValueError(
                "heading_inversion_prob > 0 requires traj.init_heading=True "
                "and a root velocity at reset (the reference's inversion "
                "branch lives inside the init-heading alignment, "
                "traj_generator.py:177-200)")
        inv = (jax.random.uniform(k_inv, (n,)) < cfg.heading_inversion_prob) \
            & do_inv
        aligned = align_real_paths(picked, init_pos, root_vel,
                                   cfg.init_heading, invert=inv)
        aligned3 = jnp.concatenate(
            [aligned, jnp.zeros_like(aligned[..., :1])], -1)
        use_real = jax.random.uniform(k_mix, (n,)) >= cfg.hybrid_init_prob
        verts = jnp.where(use_real[:, None, None], aligned3, verts)
        inverted = use_real & inv
    return verts, inverted


def _interp(verts, times, episode_dur):
    """Vertex-chain lerp for times (n, ...) → (n, ..., 3) as ONE interpolation
    matmul: per-env gathers lower to TPU's serial scalar path (~2 ms for a
    (4096,13) lookup), while w·verts with a fused one-hot weight matrix rides
    the MXU in ~40 µs. w[k, v] = (1−f)·[v=i0] + f·[v=i0+1]."""
    V = verts.shape[1]
    phase = jnp.clip(times / episode_dur, 0.0, 1.0)
    seg = phase * (V - 1)
    i0 = jnp.clip(jnp.floor(seg).astype(jnp.int32), 0, V - 2)
    lerp = seg - i0
    idx = i0.reshape(times.shape[0], -1)                  # (n, K)
    f = lerp.reshape(times.shape[0], -1)                  # (n, K)
    vr = jnp.arange(V, dtype=jnp.int32)
    w = (jnp.where(idx[..., None] == vr, 1.0 - f[..., None], 0.0)
         + jnp.where(idx[..., None] + 1 == vr, f[..., None], 0.0))
    out = jnp.einsum("nkv,nvd->nkd", w.astype(verts.dtype), verts,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(times.shape + (3,))


def calc_pos(verts, times, episode_dur):
    """Linear interpolation along the vertex chain (reference calc_pos,
    :278-296). verts (n,V,3), times (n,) seconds → (n,3)."""
    return _interp(verts, times, episode_dur)


def fetch_samples(verts, times, episode_dur, num_samples, sample_dt):
    """Future waypoints at fixed time offsets (reference _fetch_traj_samples,
    humanoid_traj.py:208-224). Returns (n, S, 3)."""
    offsets = jnp.arange(num_samples) * sample_dt
    ts = times[:, None] + offsets[None]                   # (n,S)
    return _interp(verts, ts, episode_dur)


def synthetic_real_bank(num_paths=256, num_verts=101, seed=0):
    """Stand-in 'real path' bank with pedestrian-like statistics (used when
    JTA/JRDB exports are absent; same (P,V,2) layout as load_jta_traj.py
    cubic-spline exports, reference load_jta_traj.py:66-119)."""
    rng = np.random.RandomState(seed)
    t = np.linspace(0, 1, num_verts)
    paths = []
    for _ in range(num_paths):
        speed = rng.uniform(0.5, 2.2)
        curv = rng.normal(0, 0.3)
        wob = rng.normal(0, 0.05, 3)
        theta = curv * t * 2 * np.pi * 0.2 + \
            wob[0] * np.sin(2 * np.pi * t * rng.uniform(1, 3))
        x = np.cumsum(np.cos(theta)) * speed * 10.0 / num_verts
        y = np.cumsum(np.sin(theta)) * speed * 10.0 / num_verts
        paths.append(np.stack([x, y], -1))
    return jnp.asarray(np.stack(paths), jnp.float32)
