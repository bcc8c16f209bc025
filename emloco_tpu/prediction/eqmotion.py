"""EqMotion-style equivariant trajectory predictor (second HTP baseline).

Semantic rebuild of the reference's EqMotion ETH-UCY variant
(/root/reference/EqMotion/h36m/model_t.py:8-170 + gcl_t.py feature-learning
layers; wired to the LocoVal loss in main_eth_diverse.py:172-177, 295-316):

  * geometric channels: the centered past trajectory (C=past_length coordinate
    channels per agent) mixed by learned channel matrices WITHOUT bias —
    linear maps on coordinate channels are rotation/translation equivariant
  * invariant node features from velocity magnitudes and turn angles
  * interaction reasoning: per-edge soft categories from invariant features,
    aggregating relative-coordinate messages weighted per category
  * multi-head (nmode) equivariant decoders → (B, agents, M, T_future, 2)
  * WTA (min-over-modes) training loss; EmLoco/LocoVal loss per mode with
    ValuePoseNet(use_pose=False, use_vel=True)

The whole model is einsums over (B, A, C, 2) tensors — MXU-friendly.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from . import metrics as M


def _safe_arccos(cos):
    """arccos with the reference's [-1,1] clamp (model_t.py:119) but a
    bounded gradient: d/dx arccos is -1/sqrt(1-x²) = -inf at the clamp
    boundary, and real ETH-UCY tracks are grid-interpolated straight lines
    whose turning-cos is EXACTLY 1 — torch/jax both emit inf->NaN grads
    there (the reference survives only because mocap data is noisy).
    Forward value is exact; the gradient is evaluated eps inside."""
    c = jnp.clip(cos, -1.0, 1.0)
    safe = jnp.clip(c, -1.0 + 1e-6, 1.0 - 1e-6)
    return (jnp.arccos(safe)
            + jax.lax.stop_gradient(jnp.arccos(c) - jnp.arccos(safe)))


@dataclasses.dataclass(frozen=True)
class EqMotionConfig:
    past_length: int = 8
    future_length: int = 12
    hidden_nf: int = 64
    hid_channel: int = 32
    n_layers: int = 4
    nmode: int = 20
    category_num: int = 4


class EqLayer(nn.Module):
    """One feature-learning layer: invariant update + equivariant coordinate
    channel update with reasoning-weighted neighbor aggregation."""

    hidden_nf: int
    hid_channel: int
    category_num: int

    @nn.compact
    def __call__(self, h, z):
        # h (B,A,H) invariant; z (B,A,C,2) equivariant channels
        B, A, C, _ = z.shape
        # invariant pairwise features: channel distances
        zd = z[:, :, None] - z[:, None]                   # (B,A,A,C,2)
        dist = jnp.sqrt(jnp.sum(zd ** 2, -1) + 1e-8)      # (B,A,A,C)
        h1 = jnp.repeat(h[:, :, None], A, 2)
        h2 = jnp.repeat(h[:, None], A, 1)
        e_in = jnp.concatenate([h1, h2, dist], -1)
        e = nn.Dense(self.hidden_nf)(e_in)
        e = nn.silu(e)
        e = nn.Dense(self.hidden_nf)(e)
        e = nn.silu(e)                                    # (B,A,A,H)

        # reasoning: soft interaction categories (model_t.py calc_category)
        cat = nn.Dense(self.category_num)(e)
        cat = jax.nn.softmax(cat, -1)                     # (B,A,A,K)

        mask = 1.0 - jnp.eye(A)[None, :, :, None]
        # equivariant message: per-category scalar gates on channel diffs
        gate = nn.Dense(self.category_num * C)(e).reshape(
            B, A, A, self.category_num, C)
        w = jnp.einsum("bijk,bijkc->bijc", cat, gate) * mask
        dz = jnp.einsum("bijc,bijcd->bicd", w, zd) / (A - 1 + 1e-6)

        # channel mixing (equivariant linear, no bias)
        z_new = z + dz + nn.Dense(C, use_bias=False)(
            jnp.swapaxes(z, -1, -2)).swapaxes(-1, -2)

        # invariant node update
        agg = jnp.sum(e * mask[..., :1], 2)
        h_new = h + nn.silu(nn.Dense(self.hidden_nf)(
            jnp.concatenate([h, agg], -1)))
        return h_new, z_new


class EqMotion(nn.Module):
    cfg: EqMotionConfig

    @nn.compact
    def __call__(self, past):
        """past (B, A, T_past, 2) absolute trajectories →
        (B, A, nmode, T_future, 2) absolute predictions."""
        c = self.cfg
        B, A, T, _ = past.shape
        center = past[:, :, -1:]                          # last observed
        z = past - center                                 # translation-equiv

        vel = jnp.diff(past, axis=2, prepend=past[:, :, :1])
        speed = jnp.linalg.norm(vel, axis=-1)             # (B,A,T)
        vp = jnp.concatenate([vel[:, :, :1], vel[:, :, :-1]], 2)
        cos = jnp.sum(vp * vel, -1) / (
            jnp.linalg.norm(vp, axis=-1) * speed + 1e-6)
        angle = _safe_arccos(cos)
        h = nn.Dense(c.hidden_nf // 2)(speed)
        h = jnp.concatenate([h, nn.Dense(c.hidden_nf // 2)(angle)], -1)

        # lift T coordinate channels → hid_channel (equivariant, no bias)
        zc = nn.Dense(c.hid_channel, use_bias=False,
                      name="coord_trans")(jnp.swapaxes(z, -1, -2))
        zc = jnp.swapaxes(zc, -1, -2)                     # (B,A,C,2)

        for i in range(c.n_layers):
            h, zc = EqLayer(c.hidden_nf, c.hid_channel, c.category_num,
                            name=f"gcl_{i}")(h, zc)

        # multi-head equivariant decoders (no bias → equivariance preserved)
        outs = []
        for m in range(c.nmode):
            o = nn.Dense(c.future_length, use_bias=False,
                         name=f"head_{m}")(jnp.swapaxes(zc, -1, -2))
            outs.append(jnp.swapaxes(o, -1, -2))          # (B,A,Tf,2)
        out = jnp.stack(outs, 2)                          # (B,A,M,Tf,2)
        return out + center[:, :, None]


class EqMotionTrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    key: jnp.ndarray
    step: jnp.ndarray


class EqMotionTrainer:
    """ETH-UCY-style training with WTA loss + optional LocoVal loss
    (reference main_eth_diverse.py:295-316: per-mode
    calc_embodied_motion_loss with init_vel only, averaged, ×valueloss_w)."""

    def __init__(self, cfg: EqMotionConfig = EqMotionConfig(), lr=5e-4,
                 vnet=None, valueloss_w: float = 0.0,
                 value_loss_mode: str = "all", model=None):
        self.cfg = cfg
        # `model`: any flax module mapping past (B,A,Tp,2) →
        # (B,A,nmode,Tf,2) — e.g. eqmotion_full.EqMotionFullEth, the
        # architecture-exact port on the eth 20-mode interface
        self.model = EqMotion(cfg) if model is None else model
        self.tx = optax.adam(lr)
        self.vnet = vnet
        self.valueloss_w = valueloss_w
        # "all": reference semantics — value loss averaged over every mode
        # (main_eth_diverse.py:304-316). "wta": gate it to the WTA-winning
        # head only, so non-winning heads keep their diversity (the failure
        # mode RESULTS.md documents for "all" at every tested weight: value
        # pressure pulls unanchored heads toward observation-independent
        # plausible trajectories).
        if value_loss_mode not in ("all", "wta"):
            raise ValueError(f"value_loss_mode {value_loss_mode!r}")
        self.value_loss_mode = value_loss_mode

    def init(self, key, example_past, vnet_params=None):
        params = self.model.init(key, example_past)
        return EqMotionTrainState(
            params=params, opt_state=self.tx.init(params),
            key=key, step=jnp.zeros((), jnp.int32)), vnet_params

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, ts, vnet_params, past, future):
        """past (B,A,Tp,2); future (B,A,Tf,2). Primary agent = index 0."""

        def loss_fn(p):
            pred = self.model.apply(p, past)              # (B,A,M,Tf,2)
            # sqrt(Σd²+1e-12), not linalg.norm: real scenes contain standing
            # pedestrians whose window is one repeated point — the model's
            # translation-equivariant init predicts the future EXACTLY there
            # (z=0 → heads emit center), and norm's gradient at 0 is NaN,
            # which one Adam step spreads to every parameter.
            d = pred[:, 0] - future[:, 0:1]
            err = jnp.sqrt(jnp.sum(d * d, -1) + 1e-12)
            wta = err.mean(-1).min(-1).mean()             # ego-agent WTA
            total = wta
            vloss = 0.0
            if self.vnet is not None and self.valueloss_w > 0:
                # per-mode LocoVal loss with velocity only
                cur = past[:, 0, -1:]
                init_vel = (past[:, 0, -1] - past[:, 0, -2]) * 2.5
                rel = pred[:, 0] - cur[:, None]           # (B,M,Tf,2)
                origin = jnp.zeros_like(rel[:, :, :1])
                trajs = jnp.concatenate([origin, rel], 2)  # (B,M,Tf+1,2)
                # all modes at once: fold M into the batch axis
                B, Mm = trajs.shape[:2]
                v = self.vnet.apply(
                    vnet_params, trajs.reshape(B * Mm, -1, 2), None,
                    jnp.repeat(init_vel, Mm, 0))
                per_mode = ((v - 1.0) ** 2).reshape(B, Mm)
                if self.value_loss_mode == "wta":
                    # only the data-term winner feels the value pressure
                    win = jax.lax.stop_gradient(err.mean(-1).argmin(-1))
                    vloss = jnp.mean(
                        jnp.take_along_axis(per_mode, win[:, None], 1))
                else:
                    vloss = per_mode.mean()
                total = total + self.valueloss_w * vloss
            return total, dict(wta=wta, value_loss=vloss)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params)
        updates, opt_state = self.tx.update(grads, ts.opt_state)
        params = optax.apply_updates(ts.params, updates)
        return ts.replace(params=params, opt_state=opt_state,
                          step=ts.step + 1), aux

    @functools.partial(jax.jit, static_argnums=0)
    def predict(self, params, past):
        return self.model.apply(params, past)

    def mode_values(self, vnet_params, past, pred):
        """LocoVal score per mode: each predicted mode rebased to start at
        the primary agent's last observed position, scored by the frozen
        value net (reference main_eth_diverse.py:189). pred is (B,M,Tf,2);
        returns (B,M)."""
        cur = past[:, 0, -1:]
        init_vel = (past[:, 0, -1] - past[:, 0, -2]) * 2.5
        rel = pred - cur[:, None]
        trajs = jnp.concatenate([jnp.zeros_like(rel[:, :, :1]), rel], 2)
        return jnp.stack([
            self.vnet.apply(vnet_params, trajs[:, m], None, init_vel)
            for m in range(trajs.shape[1])], -1)

    def vis_dict(self, params, past, future, vnet_params=None):
        """Adapt a batch to the shared vis_dict plot schema (visualize.py) —
        the counterpart of the reference's standalone
        EqMotion/ETH-UCY-Trajectory-Visualizer tool: primary-agent observed
        track, GT future, per-mode predictions, and LocoVal values when a
        value net is attached. Consumable by plot_prediction_comparison /
        plot_metric_diff_histograms / plot_value_histogram."""
        pred = self.predict(params, past)[:, 0]          # (B,M,Tf,2)
        out = {
            "obs": np.asarray(past[:, 0, :, :2]),        # (B,Tp,2)
            "gt": np.asarray(future[:, 0, :, :2]),       # (B,Tf,2)
            "pred": np.asarray(jnp.moveaxis(pred, 1, 2))[..., :2],
        }
        if self.vnet is not None and vnet_params is not None:
            out["values"] = np.asarray(
                self.mode_values(vnet_params, past, pred))
        return out

    def evaluate(self, params, past, future, vnet_params=None,
                 threshold: float = 0.7):
        """ADE/FDE over modes; with vnet_params also the LocoVal-filter
        metrics (reference main_eth_diverse.py test-time filter, :189 —
        score each mode with the frozen value net, keep modes ≥ threshold,
        fall back to the argmax-value mode)."""
        pred = self.predict(params, past)[:, 0]          # (B,M,Tf,2)
        pred_t = jnp.moveaxis(pred, 1, 2)                # (B,Tf,M,2)
        out = {k: float(v) for k, v in
               M.ade_fde(pred_t, future[:, 0]).items()
               if not k.endswith("per_mode")}
        if self.vnet is not None and vnet_params is not None:
            values = self.mode_values(vnet_params, past, pred)
            keep = M.locoval_filter(pred_t, values, threshold)
            err = jnp.linalg.norm(pred - future[:, 0:1], axis=-1).mean(-1)
            big = jnp.where(keep, err, jnp.inf)
            out["ade_filtered_min"] = float(big.min(-1).mean())
            out["mean_value"] = float(values.mean())
        return out


def synthetic_eth_batch(key, batch=8, agents=4, past=8, future=12):
    """ETH-UCY-like random pedestrian scenes (2.5 Hz world coordinates)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    T = past + future
    speed = jax.random.uniform(k1, (batch, agents, 1), minval=0.3, maxval=1.8)
    heading0 = jax.random.uniform(k2, (batch, agents, 1), minval=-np.pi,
                                  maxval=np.pi)
    curv = jax.random.normal(k3, (batch, agents, 1)) * 0.1
    t = jnp.arange(T)[None, None]
    heading = heading0 + curv * t
    v = jnp.stack([speed * jnp.cos(heading), speed * jnp.sin(heading)], -1)
    xy = jnp.cumsum(v, 2) / 2.5
    xy = xy + jax.random.uniform(k4, (batch, agents, 1, 2), minval=-5,
                                 maxval=5)
    return xy[:, :, :past], xy[:, :, past:]


def synthetic_nbody_batch(key, batch=8, bodies=5, past=10, future=10,
                          dim=3, dt=0.05, k_spring=0.5):
    """N-body spring-system rollouts (the reference's second EqMotion domain,
    EqMotion/n_body_system: charged/spring particles in 3-D). Symplectic
    Euler under pairwise linear springs, simulated in one lax.scan —
    the physical system is E(3)-equivariant, which is exactly what the
    coordinate-channel design must preserve. Returns (past, future) with
    shapes (B, bodies, T, dim)."""
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (batch, bodies, dim))
    v0 = jax.random.normal(k2, (batch, bodies, dim)) * 0.5

    def step(carry, _):
        x, v = carry
        d = x[:, :, None] - x[:, None]                    # (B,N,N,dim)
        f = -k_spring * jnp.sum(d, 2)                     # linear springs
        v = v + dt * f
        x = x + dt * v
        return (x, v), x

    _, xs = jax.lax.scan(step, (x0, v0), None, length=past + future)
    xs = jnp.moveaxis(xs, 0, 2)                           # (B,N,T,dim)
    return xs[:, :, :past], xs[:, :, past:]


def nbody_config(past=10, future=10, nmode=1) -> EqMotionConfig:
    """Config preset for the n-body domain (single-mode regression, as in
    the reference's n_body_system main)."""
    return EqMotionConfig(past_length=past, future_length=future,
                          hidden_nf=64, hid_channel=32, n_layers=4,
                          nmode=nmode)


def synthetic_h36m_batch(key, batch=8, past=10, future=10, fps=25.0,
                         lib=None):
    """Human-motion domain (the reference's EqMotion/h36m variant): nodes are
    the 24 skeleton JOINTS of one person; per-node 3-D trajectories come from
    FK over the motion library's gaits. Returns (past, future) shaped
    (B, 24, T, 3)."""
    from ..kinematics import motion_lib as ml

    if lib is None:
        lib = ml.synthetic_walk_motions(speeds=(0.8, 1.2, 1.6), duration=4.0)
    from ..kinematics import body_model as bm
    from ..kinematics.skeleton import forward_kinematics

    T = past + future
    k1, k2 = jax.random.split(key)
    ids = ml.sample_motions(lib, k1, batch)
    t0 = ml.sample_time(lib, k2, ids, truncate_time=T / fps)
    times = t0[:, None] + jnp.arange(T)[None] / fps       # (B, T)
    st = ml.get_motion_state(lib, jnp.repeat(ids, T), times.reshape(-1))
    tree = bm.canonical_skeleton()
    _, jpos = forward_kinematics(tree, st["local_rot"], st["root_pos"])
    jpos = jpos.reshape(batch, T, -1, 3)                  # (B, T, J, 3)
    return (jnp.swapaxes(jpos[:, :past], 1, 2),
            jnp.swapaxes(jpos[:, past:], 1, 2))


def h36m_config(past=10, future=10, nmode=1) -> EqMotionConfig:
    return EqMotionConfig(past_length=past, future_length=future,
                          hidden_nf=64, hid_channel=32, n_layers=4,
                          nmode=nmode)


def load_md17_structure(molecule: str = "aspirin"):
    """Real molecule bond topology for the MD17 domain: the reference's
    preprocess derives a heavy-atom adjacency from the MD17 dumps
    (md17/preprocess.py:59 → processed_dataset/aspirin_structure.npy, 13
    atoms = aspirin's 9 C + 4 O). The aspirin matrix is committed as a
    repo fixture (prediction/fixtures/) so runtime never depends on this
    machine's mount layout; EMLOCO_MD17_DIR points at an external
    processed_dataset dir for other molecules. Returns the (N, N) 0/1
    matrix, or None when unavailable (callers fall back to the synthetic
    chain)."""
    import os
    fixture_dir = os.path.join(os.path.dirname(__file__), "fixtures")
    for root in (os.environ.get("EMLOCO_MD17_DIR"), fixture_dir):
        if not root:
            continue
        p = os.path.join(root, f"{molecule}_structure.npy")
        if os.path.exists(p):
            adj = np.load(p)
            if adj.ndim == 2 and adj.shape[0] == adj.shape[1]:
                return (np.asarray(adj) > 0.5).astype(np.float32)
    return None


def _embed_structure(adj: np.ndarray, bond_len: float = 1.4,
                     iters: int = 800, seed: int = 0) -> np.ndarray:
    """Deterministic 3-D equilibrium geometry for a bond graph: gradient
    descent on harmonic bond springs (rest = bond_len) plus a short-range
    repulsion between non-bonded atoms — the standard force-directed embed.
    Host-side numpy; runs once per dataset like the reference's preprocess."""
    n = adj.shape[0]
    rng = np.random.RandomState(seed)
    x = rng.randn(n, 3) * 0.5
    bonded = adj > 0.5
    np.fill_diagonal(bonded, True)                        # mask self-pairs
    for _ in range(iters):
        d = x[:, None] - x[None]                          # (N,N,3)
        dist = np.sqrt((d ** 2).sum(-1)) + 1e-9
        f_bond = np.where(adj > 0.5, dist - bond_len, 0.0)
        rep = np.where(~bonded & (dist < 2.0 * bond_len),
                       dist - 2.0 * bond_len, 0.0)        # soft repulsion
        coef = (f_bond + 0.3 * rep) / dist
        x = x - 0.05 * (coef[..., None] * d).sum(1)
        x -= x.mean(0)
    return x.astype(np.float32)


def synthetic_md17_batch(key, batch=8, atoms=13, past=25, future=25,
                         dt=0.02, k_bond=8.0, damping=0.02, structure=None):
    """Molecular-dynamics domain (the reference's EqMotion/md17 variant:
    atom trajectories of one molecule, past 25 → future 25 frames,
    dataset_md17.py:10-56 loads (B,T,N,3) position arrays). The real MD17
    trajectory dumps cannot be downloaded here, so trajectories are
    simulated: harmonic bonds around the equilibrium geometry, damped
    symplectic Euler in one lax.scan. `structure` takes a real (N, N) bond
    adjacency (load_md17_structure() for the reference's aspirin matrix) —
    then the topology is the real molecule's and only the dynamics are
    synthetic; default is a fixed chain+skip graph. The dynamics are
    E(3)-equivariant — each batch element gets a random global rotation —
    which is the property the model family exists to exploit.
    Returns (past, future) shaped (B, atoms, T, 3)."""
    k1, k2, k3 = jax.random.split(key, 3)
    if structure is not None:
        adj = np.asarray(structure)
        # `structure` defines the atom count; a conflicting explicit
        # `atoms` argument is a caller error, not a silent override
        assert atoms == 13 or atoms == adj.shape[0], (
            f"atoms={atoms} conflicts with structure of {adj.shape[0]} "
            f"atoms; omit `atoms` when passing `structure`")
        atoms = adj.shape[0]
        eq = jnp.asarray(_embed_structure(adj))           # (N, 3)
        ii, jj = np.nonzero(np.triu(adj, 1))
        bonds = list(zip(ii.tolist(), jj.tolist()))
        # angle stiffness: second neighbours (atoms sharing a bonded atom)
        two_hop = (adj @ adj > 0.5) & (adj < 0.5)
        np.fill_diagonal(two_hop, False)
        ii2, jj2 = np.nonzero(np.triu(two_hop, 1))
        bonds += list(zip(ii2.tolist(), jj2.tolist()))
    else:
        # equilibrium geometry: a jittered 3-D zig-zag chain (one fixed
        # molecule per call, like one MD17 molecule type per dataset)
        t = jnp.arange(atoms, dtype=jnp.float32)
        eq = jnp.stack([t * 1.2,
                        0.6 * jnp.cos(t * 2.1),
                        0.6 * jnp.sin(t * 1.3)], -1)      # (N, 3)
        bonds = [(i, i + 1) for i in range(atoms - 1)]
        bonds += [(i, i + 2) for i in range(atoms - 2)]   # angle stiffness
    bi = jnp.array([b[0] for b in bonds])
    bj = jnp.array([b[1] for b in bonds])
    r0 = jnp.linalg.norm(eq[bi] - eq[bj], axis=-1)        # rest lengths

    from ..ops import quat as Q
    q = Q.normalize(jax.random.normal(k1, (batch, 4)))
    x0 = Q.rotate(jnp.broadcast_to(q[:, None], (batch, atoms, 4)),
                  eq[None] + 0.05 * jax.random.normal(k2, (batch, atoms, 3)))
    v0 = 0.4 * jax.random.normal(k3, (batch, atoms, 3))
    v0 = v0 - v0.mean(1, keepdims=True)                   # zero net momentum

    def step(carry, _):
        x, v = carry
        d = x[:, bi] - x[:, bj]                           # (B, E, 3)
        dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
        f_e = -k_bond * (dist - r0[None, :, None]) * d / (dist + 1e-8)
        f = jnp.zeros_like(x).at[:, bi].add(f_e).at[:, bj].add(-f_e)
        v = (1.0 - damping) * v + dt * f
        x = x + dt * v
        return (x, v), x

    _, xs = jax.lax.scan(step, (x0, v0), None, length=past + future)
    xs = jnp.moveaxis(xs, 0, 2)                           # (B, N, T, 3)
    return xs[:, :, :past], xs[:, :, past:]


def md17_config(past=25, future=25, nmode=1) -> EqMotionConfig:
    """Config preset for the MD17 molecular domain (reference
    main_md17.py envelope: 25 past / 25 future frames, single-mode)."""
    return EqMotionConfig(past_length=past, future_length=future,
                          hidden_nf=64, hid_channel=32, n_layers=4,
                          nmode=nmode)


# ---------------------------------------------------------------------------
# ETH-UCY raw annotation ingestion (real-data path for the EqMotion baseline)
# ---------------------------------------------------------------------------

def read_ethucy_txt(path: str):
    """ETH-UCY raw annotation reader: one row per observation,
    whitespace-separated ``frame_id ped_id x y`` in world meters, annotated
    every 10 video frames (2.5 Hz) — the format consumed by the reference's
    `eth_dataset` loader (main_eth_diverse.py:160; the loader module itself
    is not in the reference mount, but the public ETH/UCY release format is
    fixed). Returns (sorted frame ids (F,), {frame_id: {ped_id: (x, y)}})."""
    data = np.loadtxt(path, dtype=np.float64)
    if data.ndim == 1:
        data = data[None]
    frames = np.unique(data[:, 0])
    table = {f: {} for f in frames}
    for f, p, x, y in data:
        table[f][int(p)] = (float(x), float(y))
    return frames, table


def ethucy_windows(path: str, past: int = 8, future: int = 12,
                   num_agents: int = 4, stride: int = 1,
                   pad_offset: float = 1e3):
    """Slide a (past+future)-frame window over the annotated frames and emit
    one sample per fully-present pedestrian (the reference drops peds with
    missing frames in the window): ego at agent index 0, the remaining slots
    filled with the nearest co-present peds at the last observed frame.
    Windows with fewer than num_agents peds are padded with static far-away
    dummies (+pad_offset m — outside any interaction radius, so the
    equivariant message weights vanish; the reference instead carries a
    validity mask, get_valid_mask2, main_eth_diverse.py:258).

    `path` may be a comma-separated list of txt files (the leave-one-out
    protocol trains on several scenes): windows are built PER FILE and
    concatenated — frame ids collide across scenes, so sliding one window
    over a naive row concat would fabricate cross-scene co-presence.

    Returns (past (S, A, Tp, 2), future (S, A, Tf, 2)) float32 arrays."""
    if "," in path:
        parts = [ethucy_windows(p, past, future, num_agents, stride,
                                pad_offset)
                 for p in path.split(",") if p]
        return (np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]))
    frames, table = read_ethucy_txt(path)
    T = past + future
    past_out, future_out = [], []
    for i in range(0, len(frames) - T + 1, stride):
        window = frames[i:i + T]
        present = set(table[window[0]].keys())
        for f in window[1:]:
            present &= set(table[f].keys())
        if not present:
            continue
        tracks = {p: np.asarray([table[f][p] for f in window])
                  for p in present}                        # (T, 2) each
        for ego in sorted(present):
            anchor = tracks[ego][past - 1]
            others = sorted(
                (p for p in present if p != ego),
                key=lambda p: np.hypot(*(tracks[p][past - 1] - anchor)))
            arr = np.empty((num_agents, T, 2), np.float32)
            arr[0] = tracks[ego]
            for k in range(1, num_agents):
                if k - 1 < len(others):
                    arr[k] = tracks[others[k - 1]]
                else:
                    arr[k] = anchor + pad_offset * k       # static dummy
            past_out.append(arr[:, :past])
            future_out.append(arr[:, past:])
    if not past_out:
        raise ValueError(f"no complete {T}-frame windows in {path}")
    return np.stack(past_out), np.stack(future_out)


def ethucy_batches(past_arr, future_arr, batch_size: int, key):
    """Shuffled full batches over the windowed samples (drop_last=True, as
    the reference's train DataLoader, main_eth_diverse.py:163)."""
    S = past_arr.shape[0]
    perm = np.asarray(jax.random.permutation(key, S))
    for i in range(0, S - batch_size + 1, batch_size):
        idx = perm[i:i + batch_size]
        yield jnp.asarray(past_arr[idx]), jnp.asarray(future_arr[idx])
