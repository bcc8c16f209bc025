"""LSTM trajectory-prediction baseline.

Counterpart of the reference's LSTM baselines (social-transmotion ships them
as configs — configs/jta_lstm.yaml etc. — selecting a seq2seq LSTM over the
primary agent's observed trajectory). Same call signature as TransMotion so
PredictorTrainer, the EmLoco loss, evaluation and the LocoVal filter all work
unchanged: (tokens, padding_mask) → (B, total_F, nmode, 2).

TPU note: the recurrences run as lax.scan over ≤21 steps of dense (B, H)
matmuls — sequence length is trivially small here, so the scan-carried
dependency costs ~20 fused steps, not a host loop.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .model import TransMotionConfig


class LSTMPredictor(nn.Module):
    """Encoder-decoder LSTM over the primary agent's xy track."""

    cfg: TransMotionConfig

    @nn.compact
    def __call__(self, tokens, padding_mask, train: bool = False,
                 limit_obs: int = 0):
        c = self.cfg
        B, in_F, N, J, K = tokens.shape
        out_F = c.total_frames - in_F
        xy = tokens[:, :, 0, 0, :2]                      # (B, in_F, 2)
        # traced like TransMotion's limit_obs (≤0 → keep all); one compiled
        # program serves the whole observation-length sweep
        lim = jnp.asarray(limit_obs, jnp.int32)
        lim = jnp.where(lim > 0, lim, in_F)
        keep = jnp.arange(in_F) >= (in_F - lim)
        xy = jnp.where(keep[None, :, None], xy, 0.0)

        H = c.nhid
        enc = nn.OptimizedLSTMCell(H)
        dec = nn.OptimizedLSTMCell(H)
        carry = enc.initialize_carry(jnp.zeros(2, jnp.uint32), (B,))
        emb = nn.Dense(H, name="in_proj")
        for t in range(in_F):                            # unrolled: in_F ≤ 9
            carry, _ = enc(carry, emb(xy[:, t]))

        # decoder: autoregressive velocity residuals from the last position,
        # one recurrence PER MODE — every mode feeds back its OWN rollout
        # (a true multi-sample decoder; modes diverge through both the
        # learned mode embedding and their own feedback, not just the output
        # head). Modes ride the batch axis, so the per-step work is one
        # (B·M, H) matmul — same kernel shape class as before on the MXU.
        M = c.nmode
        head = nn.Dense(2, name="out_proj",
                        kernel_init=nn.initializers.zeros)
        mode_emb = self.param("mode_emb", nn.initializers.normal(0.02),
                              (M, H))
        last = xy[:, -1]
        # b-major repeat ↔ per-b mode tile, so row b·M+m is (batch b, mode m)
        dcarry = jnp.repeat(carry[0], M, axis=0), jnp.repeat(carry[1], M,
                                                             axis=0)
        cur = jnp.repeat(last, M, axis=0)                # (B·M, 2)
        inp = emb(cur) + jnp.tile(mode_emb, (B, 1))
        outs = []
        for _ in range(out_F):
            dcarry, h = dec(dcarry, inp)
            dv = head(h) * c.output_scale                # (B·M, 2)
            outs.append(dv.reshape(B, M, 2))
            cur = cur + dv                               # own-mode feedback
            inp = emb(cur)
        vel = jnp.stack(outs, axis=1)                    # (B, out_F, M, 2)
        pred = last[:, None, None] + jnp.cumsum(vel, axis=1)
        obs_part = jnp.repeat(xy[:, :, None], c.nmode, axis=2)
        return jnp.concatenate([obs_part, pred], axis=1)  # (B, total_F, M, 2)
