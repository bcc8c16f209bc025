"""Faithful EqMotion (h36m/nbody family) — transplant-compatible flax port.

Architecture-exact port of the reference EqMotion
(/root/reference/EqMotion/h36m/model_t.py:8-167 and h36m/gcl_t.py:26-171,
the same model class the nbody/md17 mains instantiate): DCT temporal basis,
velocity-angle invariants, learned interaction-category reasoning
(calc_category), and per-layer equivariant updates (inner-agent attention,
category-weighted neighbor aggregation, velocity channel mix, the
reflection-style non_linear gate) — every tensor contraction matches the
torch code 1:1 so weights transplant directly; measured logits parity lives
in tests/test_reference_parity.py::test_eqmotion_h36m_parity.

The compact E(2)-equivariant model in eqmotion.py remains the ETH-UCY
production model (the reference mount ships no eth_ucy model file); this
module is the h36m-family reference architecture.

Notes mirrored from the reference, kept for parity:
  * the per-layer `coord_mlp` of Feature_learning_layer is DEAD code (built,
    never called in forward) — not ported;
  * `aggregate_coord_reasoning` sums category_mlp[i] over i <
    category_num-2, so the last TWO categories contribute no force;
  * inner_agent_attention and the aggregation both read the coord tensor of
    their call site (the aggregation uses coord_diff from BEFORE the
    attention) — order preserved.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .eqmotion import _safe_arccos


def _safe_norm(d, axis=-1):
    """sqrt(Σd²+1e-12): forward-identical to torch.norm at 2e-4 tolerance,
    but with a finite gradient at the self-pair zeros (i==j rows), where
    jax's norm differentiates to NaN and torch defines the subgradient 0."""
    return jnp.sqrt(jnp.sum(d * d, axis=axis) + 1e-12)


@dataclasses.dataclass(frozen=True)
class EqMotionFullConfig:
    past: int = 10                 # in_node_nf == in_channel
    future: int = 10               # out_channel
    nf: int = 64                   # hidden_nf
    channels: int = 72             # hid_channel
    n_layers: int = 4
    category_num: int = 4
    n_agent: int = 22
    add_agent_token: bool = True


def _dct_matrix(N: int) -> np.ndarray:
    """model_t.get_dct_matrix (model_t.py:74-85)."""
    m = np.eye(N)
    for k in range(N):
        for i in range(N):
            w = np.sqrt((1 if k == 0 else 2) / N)
            m[k, i] = w * np.cos(np.pi * (i + 0.5) * k / N)
    return m


def _mlp(sizes, name, act_last=True):
    """nn.Sequential(Linear, SiLU, Linear[, SiLU]) with torch-index names so
    transplant maps `prefix.0` → Dense `f"{name}_0"`, `prefix.2` → `_2`."""
    layers = []
    for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
        layers.append(nn.Dense(b, name=f"{name}_{2 * i}"))
    return layers, act_last


def _run_mlp(layers, x, act_last=True):
    for i, lyr in enumerate(layers):
        x = lyr(x)
        if i < len(layers) - 1 or act_last:
            x = nn.silu(x)
    return x


class FeatureLayer(nn.Module):
    """gcl_t.Feature_learning_layer (gcl_t.py:26-171), SiLU activations."""

    nf: int
    channels: int
    category_num: int

    def setup(self):
        c, f = self.channels, self.nf
        self.coord_vel = nn.Dense(c, use_bias=False, name="coord_vel")
        self.edge_mlp, _ = _mlp([2 * f + c, f, f], "edge_mlp")
        self.cat_mlps = [
            _mlp([2 * f + c, f, c], f"category_mlp_{i}")[0]
            for i in range(self.category_num - 2)]
        self.factor_mlp, _ = _mlp([c, c, c], "factor_mlp")
        self.node_mlp, _ = _mlp([2 * f, f, f], "node_mlp")
        self.layer_q = nn.Dense(c, use_bias=False, name="layer_q")
        self.layer_k = nn.Dense(c, use_bias=False, name="layer_k")
        self.mlp_q = nn.Dense(c, name="mlp_q_0")

    def __call__(self, h, coord, vel, category):
        B, N, C, _ = coord.shape
        h1 = jnp.broadcast_to(h[:, :, None], (B, N, N, h.shape[-1]))
        h2 = jnp.broadcast_to(h[:, None, :], (B, N, N, h.shape[-1]))
        coord_diff = coord[:, :, None] - coord[:, None, :]   # (B,N,N,C,3)
        coord_dist = _safe_norm(coord_diff)                  # (B,N,N,C)
        edge_h = jnp.concatenate([h1, h2, coord_dist], -1)
        edge_feat = _run_mlp(self.edge_mlp, edge_h)

        # inner-agent attention (gcl_t.py:137-145)
        att = nn.silu(self.mlp_q(h))[..., None]              # (B,N,C,1)
        v = coord - jnp.mean(coord, axis=(1, 2), keepdims=True)
        coord = att * v + coord

        # category-weighted neighbor aggregation (gcl_t.py:112-126);
        # coord_diff is from BEFORE the attention, as in the reference
        factors = jnp.zeros((B, N, N, C))
        for i, ml in enumerate(self.cat_mlps):
            factors = factors + category[..., i:i + 1] * _run_mlp(ml, edge_h)
        factors = _run_mlp(self.factor_mlp, factors)
        coord = coord + jnp.sum(factors[..., None] * coord_diff, axis=2)

        # velocity channel mix
        coord = coord + jnp.swapaxes(
            self.coord_vel(jnp.swapaxes(vel, 2, 3)), 2, 3)

        # reflection-gate non-linearity (gcl_t.py:147-159)
        mean = jnp.mean(coord, axis=(1, 2), keepdims=True)
        cc = coord - mean
        q = jnp.swapaxes(self.layer_q(jnp.swapaxes(cc, 2, 3)), 2, 3)
        k = jnp.swapaxes(self.layer_k(jnp.swapaxes(cc, 2, 3)), 2, 3)
        product = jnp.sum(q * k, axis=-1, keepdims=True)     # (B,N,C,1)
        mask = (product >= 0).astype(coord.dtype)
        k_norm_sq = jnp.sum(k * k, axis=-1, keepdims=True)
        coord = mask * q + (1 - mask) * (q - (product / (k_norm_sq + 1e-4))
                                         * k)
        coord = coord + mean

        # node update with self-excluded edge sum (gcl_t.py:128-135)
        eye = jnp.eye(N)[None, :, :, None]
        agg = jnp.sum((1.0 - eye) * edge_feat, axis=2)
        h = h + _run_mlp(self.node_mlp,
                         jnp.concatenate([h, agg], -1), act_last=False)
        return h, coord


class EqMotionFull(nn.Module):
    """model_t.EqMotion forward (model_t.py:115-167)."""

    cfg: EqMotionFullConfig

    def setup(self):
        c = self.cfg
        half = c.nf // 2
        self.embedding = nn.Dense(half, name="embedding")
        self.embedding2 = nn.Dense(half, name="embedding2")
        self.coord_trans = nn.Dense(c.channels, use_bias=False,
                                    name="coord_trans")
        self.vel_trans = nn.Dense(c.channels, use_bias=False,
                                  name="vel_trans")
        self.predict_head = nn.Dense(c.future, use_bias=False,
                                     name="predict_head")
        if c.add_agent_token:
            self.agent_embed = self.param(
                "agent_embed", nn.initializers.normal(1.0),
                (1, c.n_agent, c.nf))
            self.embed_mlp, _ = _mlp([2 * c.nf, c.nf, c.nf], "embed_MLP")
        # calc_category heads (model_t.py:40-63)
        self.cat_edge_mlp, _ = _mlp(
            [2 * c.nf + 2 * c.channels, c.nf, c.nf], "cat_edge_mlp")
        self.cat_coord_mlp, _ = _mlp(
            [2 * c.channels, c.nf, 2 * c.channels], "cat_coord_mlp")
        self.cat_node_mlp, _ = _mlp([2 * c.nf, c.nf, c.nf], "cat_node_mlp")
        self.cat_head_mlp, _ = _mlp(
            [2 * c.nf + 2 * c.channels, c.nf, c.category_num],
            "cat_head_mlp")
        self.layers = [FeatureLayer(c.nf, c.channels, c.category_num,
                                    name=f"gcl_{i}")
                       for i in range(c.n_layers)]

    def _calc_category(self, h, x_cat):
        B, N = h.shape[:2]
        diff = x_cat[:, :, None] - x_cat[:, None, :]
        dist = _safe_norm(diff)                              # (B,N,N,2C)
        dist = _run_mlp(self.cat_coord_mlp, dist)
        h1 = jnp.broadcast_to(h[:, :, None], (B, N, N, h.shape[-1]))
        h2 = jnp.broadcast_to(h[:, None, :], (B, N, N, h.shape[-1]))
        edge_feat = _run_mlp(self.cat_edge_mlp,
                             jnp.concatenate([h1, h2, dist], -1))
        eye = jnp.eye(N)[None, :, :, None]
        agg = jnp.sum((1.0 - eye) * edge_feat, axis=2)
        node = _run_mlp(self.cat_node_mlp, jnp.concatenate([h, agg], -1))
        n1 = jnp.broadcast_to(node[:, :, None], (B, N, N, node.shape[-1]))
        n2 = jnp.broadcast_to(node[:, None, :], (B, N, N, node.shape[-1]))
        logits = _run_mlp(self.cat_head_mlp,
                          jnp.concatenate([n1, n2, dist], -1))
        return jax.nn.softmax(logits, axis=-1)               # tao = 1

    def __call__(self, h, x, vel):
        """h (B,N,T) node invariants, x (B,N,T,3) positions,
        vel (B,N,T,3) → (pred (B,N,out,3), [category]·n_layers)."""
        c = self.cfg
        B, N, T, _ = x.shape
        # velocity turning-angle invariant (model_t.py:116-123)
        vel_pre = jnp.concatenate([vel[:, :, :1], vel[:, :, :-1]], axis=2)
        cos = jnp.sum(vel_pre * vel, -1) / (
            (jnp.linalg.norm(vel_pre, axis=-1) + 1e-6)
            * (jnp.linalg.norm(vel, axis=-1) + 1e-6))
        vel_angle = _safe_arccos(cos)

        x_center = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = x - x_center
        dct = jnp.asarray(_dct_matrix(c.past), x.dtype)
        idct = jnp.asarray(np.linalg.inv(_dct_matrix(c.future)), x.dtype)
        x = jnp.einsum("kt,bntd->bnkd", dct, x)
        vel = jnp.einsum("kt,bntd->bnkd", dct, vel)

        h = jnp.concatenate([self.embedding(h),
                             self.embedding2(vel_angle)], -1)
        if c.add_agent_token:
            tok = jnp.broadcast_to(self.agent_embed, (B, N, c.nf))
            h = _run_mlp(self.embed_mlp, jnp.concatenate([h, tok], -1))

        x_mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = jnp.swapaxes(self.coord_trans(jnp.swapaxes(x - x_mean, 2, 3)),
                         2, 3) + x_mean
        vel = jnp.swapaxes(self.vel_trans(jnp.swapaxes(vel, 2, 3)), 2, 3)
        category = self._calc_category(
            h, jnp.concatenate([x, vel], axis=-2))

        cats = []
        for lyr in self.layers:
            h, x = lyr(h, x, vel, category)
            cats.append(category)

        x_mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = jnp.swapaxes(self.predict_head(jnp.swapaxes(x - x_mean, 2, 3)),
                         2, 3) + x_mean
        x = jnp.einsum("kt,bntd->bnkd", idct, x)
        return x + x_center, cats


# ---------------------------------------------------------------------------
# torch → flax weight transplant (tests + checkpoint import)
# ---------------------------------------------------------------------------

def transplant_from_torch(state_dict, cfg: EqMotionFullConfig):
    """Build a flax params pytree from the reference model's state_dict.
    Key mapping is mechanical: every torch Linear `a.b.weight` lands in the
    Dense named by this module's layout with kernel = weightᵀ."""
    import numpy as _np

    def lin(prefix, bias=True):
        out = {"kernel": _np.asarray(state_dict[f"{prefix}.weight"]).T}
        if bias:
            out["bias"] = _np.asarray(state_dict[f"{prefix}.bias"])
        return out

    def seq(prefix, name, idxs=(0, 2)):
        return {f"{name}_{i}": lin(f"{prefix}.{i}") for i in idxs}

    p = {
        "embedding": lin("embedding"),
        "embedding2": lin("embedding2"),
        "coord_trans": lin("coord_trans", bias=False),
        "vel_trans": lin("vel_trans", bias=False),
        "predict_head": lin("predict_head", bias=False),
        **seq("edge_mlp", "cat_edge_mlp"),
        **seq("coord_mlp", "cat_coord_mlp"),
        **seq("node_mlp", "cat_node_mlp"),
        **seq("category_mlp", "cat_head_mlp"),
    }
    if cfg.add_agent_token:
        p["agent_embed"] = _np.asarray(state_dict["agent_embed"])
        p.update(seq("embed_MLP", "embed_MLP"))
    for i in range(cfg.n_layers):
        g = {
            "coord_vel": lin(f"gcl_{i}.coord_vel", bias=False),
            **seq(f"gcl_{i}.edge_mlp", "edge_mlp"),
            **seq(f"gcl_{i}.factor_mlp", "factor_mlp"),
            **seq(f"gcl_{i}.node_mlp", "node_mlp"),
            "layer_q": lin(f"gcl_{i}.layer_q", bias=False),
            "layer_k": lin(f"gcl_{i}.layer_k", bias=False),
            "mlp_q_0": lin(f"gcl_{i}.mlp_q.0"),
        }
        for j in range(cfg.category_num - 2):
            g.update(seq(f"gcl_{i}.category_mlp.{j}", f"category_mlp_{j}"))
        p[f"gcl_{i}"] = g
    return {"params": p}


# ---------------------------------------------------------------------------
# trainer (reference main_h36m.py:224-266 / main_nbody.py: mean L2-norm
# regression on the predicted trajectory)
# ---------------------------------------------------------------------------

class EqMotionFullTrainer:
    """Single-mode regression trainer for the faithful architecture, usable
    on the h36m (joints-as-nodes) and nbody domains."""

    def __init__(self, cfg: EqMotionFullConfig, lr: float = 5e-4):
        import optax
        self.cfg = cfg
        self.model = EqMotionFull(cfg)
        self.tx = optax.adam(lr)

    @staticmethod
    def featurize(past):
        """(B,N,T,3) positions → (h, x, vel) as main_h36m.py:231-236 feeds
        the model: vel by backward difference, h = per-step speed."""
        vel = jnp.diff(past, axis=2, prepend=past[:, :, :1])
        h = jnp.linalg.norm(vel, axis=-1)
        return h, past, vel

    def init(self, key, example_past):
        h, x, vel = self.featurize(example_past)
        params = self.model.init(key, h, x, vel)
        return params, self.tx.init(params)

    def train_step(self, params, opt_state, past, future):
        import jax as _jax

        def loss_fn(p):
            h, x, vel = self.featurize(past)
            pred, _ = self.model.apply(p, h, x, vel)
            # _safe_norm, not linalg.norm: a static joint the model predicts
            # exactly puts norm's gradient at 0/0 (see eqmotion.py loss_fn)
            return jnp.mean(_safe_norm(pred - future))

        loss, grads = _jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def predict(self, params, past):
        h, x, vel = self.featurize(past)
        pred, cats = self.model.apply(params, h, x, vel)
        return pred, cats
