"""Social-Transmotion-style trajectory predictor (flax).

Architectural parity with the reference TransMotionJTA
(/root/reference/social-transmotion/model_jta.py:130-336; JRDB subclass
model_jrdb.py:12): a dual-transformer over multi-modal visual-cue tokens —

  * token layout per person per frame: [trajectory xy (1 token), 3D box (1),
    2D box (1), 3D pose joints (24), 2D pose joints (22)] (model_jta.py:
    214-255; K=4 feature channels)
  * CMT (local) encoder over each person's token sequence: 21 traj tokens
    (9 obs + 12 padded) + 9·(1+1+24+22) cue tokens = 453 tokens
  * ST (global) encoder across people over the 21·N traj tokens
  * learned trajectory+ID / modality positional embeddings (:46-128)
  * train-time random masking: traj 0.2, joints 0.2, modality 0.3, frame 0.2
    (:207-243), and `limit_obs` evaluation masking (:266-275)
  * local/global residual ×output_scale (:313-320)
  * multi-head (nmode) linear decoders on the primary agent (:147-158,
    323-335)

TPU-first notes: everything is dense attention over static shapes in
(B·N, S, D) batches — MXU all the way; dropout/masking via explicit rngs.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TransMotionConfig:
    obs_frames: int = 9
    total_frames: int = 21          # obs + pred
    nhid: int = 128                 # jta_all_visual_cues.yaml: 128
    nhead: int = 4
    dim_ff: int = 1024
    nlayers_local: int = 6
    nlayers_global: int = 3
    nmode: int = 20                 # multi-modal heads
    dropout: float = 0.1
    output_scale: float = 1.0
    num_3dpose: int = 24
    num_2dpose: int = 22
    multi_modal: bool = True
    # stream selection: the JRDB variant (model_jrdb.py:12-145, token_num
    # 26 = traj + 2D box + 24 3D-pose joints) has NO 3D-box and NO 2D-pose
    # stream — with these off the local former runs the reference's exact
    # 246-token sequence (21 + 9 + 216) and creates no params for the
    # absent streams. Token INPUT keeps the superset layout either way
    # (absent slots are simply never read).
    use_3dbb: bool = True
    use_2dpose: bool = True
    # architecture selector: "transmotion" | "lstm" (the reference ships LSTM
    # baselines as alternate configs, configs/*lstm.yaml)
    arch: str = "transmotion"
    # train-time mask ratios (model_jta.py:207-243)
    mask_traj: float = 0.2
    mask_joints: float = 0.2
    mask_modality: float = 0.3
    mask_frame: float = 0.2

    @property
    def tokens_per_frame(self):
        return 3 + self.num_3dpose + self.num_2dpose  # traj + 2 boxes + poses

    @property
    def pred_frames(self):
        return self.total_frames - self.obs_frames


class EncoderLayer(nn.Module):
    """Post-LN torch-style transformer encoder layer."""

    nhid: int
    nhead: int
    dim_ff: int
    dropout: float

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        # key_padding_mask: (B, S) True = valid
        attn_mask = None
        if key_padding_mask is not None:
            attn_mask = key_padding_mask[:, None, None, :]
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dropout_rate=self.dropout,
            deterministic=deterministic)(x, x, mask=attn_mask)
        # eps=1e-5 matches torch nn.LayerNorm (the reference's encoder
        # layers); measured parity in tests/test_reference_parity.py
        x = nn.LayerNorm(epsilon=1e-5)(x + nn.Dropout(self.dropout)(
            a, deterministic=deterministic))
        h = nn.Dense(self.dim_ff)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.nhid)(h)
        x = nn.LayerNorm(epsilon=1e-5)(x + nn.Dropout(self.dropout)(
            h, deterministic=deterministic))
        return x


class _ScanBody(nn.Module):
    """scan body: (carry, _) with broadcast mask/det, remat'd per layer."""

    nhid: int
    nhead: int
    dim_ff: int
    dropout: float

    @nn.compact
    def __call__(self, x, key_padding_mask, deterministic):
        y = EncoderLayer(self.nhid, self.nhead, self.dim_ff,
                         self.dropout)(x, key_padding_mask=key_padding_mask,
                                       deterministic=deterministic)
        return y, None


class EncoderStack(nn.Module):
    """nlayers identical encoder layers via nn.scan over stacked params.

    The reference unrolls its torch encoder layers (model_jta.py:160-180);
    unrolled XLA programs made the round-1 train step take tens of minutes
    to compile (9 attention layers + 20 heads traced inline). Scanning over
    a (L, …) parameter stack compiles ONE layer body regardless of depth,
    and nn.remat keeps activation memory flat through the scan.
    """

    nlayers: int
    nhid: int
    nhead: int
    dim_ff: int
    dropout: float

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        # no nn.remat: at this model size (S=453, D=128) saved activations
        # are tens of MB/layer, while remat's custom-VJP scan bodies
        # multiplied XLA compile time (measured ~5 min on XLA:CPU for the
        # full train epoch — hours through the remote-TPU compile service)
        stack = nn.scan(
            _ScanBody,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=self.nlayers,
        )(self.nhid, self.nhead, self.dim_ff, self.dropout, name="layers")
        y, _ = stack(x, key_padding_mask, deterministic)
        return y


class TransMotion(nn.Module):
    cfg: TransMotionConfig

    @nn.compact
    def __call__(self, tokens, padding_mask, train: bool = False,
                 limit_obs: int = 0):
        """tokens (B, in_F, N, J, 4): per-frame per-person token features
        (channel count 4; traj uses [:2], boxes [:4], 3d pose [:3],
        2d pose [:2]). padding_mask (B, N): True = person present.
        Returns (B, total_F, nmode, 2) trajectory predictions for the
        primary agent (person 0).
        """
        c = self.cfg
        B, in_F, N, J, K = tokens.shape
        F = c.total_frames
        out_F = F - in_F
        D = c.nhid

        # pad future frames with the last observed frame (model_jta.py:199-203)
        pad = jnp.repeat(tokens[:, -1:], out_F, axis=1)
        tgt = jnp.concatenate([tokens, pad], axis=1)       # (B,F,N,J,K)

        tgt_traj = tgt[:, :, :, 0, :2]
        tgt_3dbb = tgt[:, :, :, 1, :4]
        tgt_2dbb = tgt[:, :, :, 2, :4]
        p3 = 3 + c.num_3dpose
        tgt_3dpose = tgt[:, :, :, 3:p3, :3]
        tgt_2dpose = tgt[:, :, :, p3:p3 + c.num_2dpose, :2]

        if train:
            rng = self.make_rng("mask")
            ks = jax.random.split(rng, 8)
            mt = jax.random.uniform(ks[0], (B, F, N, 1)) > c.mask_traj
            tgt_traj = tgt_traj * mt
            fm = jax.random.uniform(ks[1], (B, in_F, N, 1)) > c.mask_frame
            tgt_traj = tgt_traj.at[:, :in_F].multiply(fm)
            jm3 = jax.random.uniform(
                ks[2], (B, F, N, c.num_3dpose, 1)) > c.mask_joints
            tgt_3dpose = tgt_3dpose * jm3
            jm2 = jax.random.uniform(
                ks[3], (B, F, N, c.num_2dpose, 1)) > c.mask_joints
            tgt_2dpose = tgt_2dpose * jm2
            # whole-modality dropout per person (model_jta.py:218-226)
            if c.use_3dbb:
                tgt_3dbb = tgt_3dbb * (jax.random.uniform(
                    ks[4], (B, 1, N, 1)) > c.mask_modality)
            tgt_2dbb = tgt_2dbb * (jax.random.uniform(
                ks[5], (B, 1, N, 1)) > c.mask_modality)
            tgt_3dpose = tgt_3dpose * (jax.random.uniform(
                ks[6], (B, 1, N, 1, 1)) > c.mask_modality)
            if c.use_2dpose:
                tgt_2dpose = tgt_2dpose * (jax.random.uniform(
                    ks[7], (B, 1, N, 1, 1)) > c.mask_modality)

        # keep only the last `limit_obs` observed frames (evaluate_jta.py
        # --all_frames sweep; model_jta.py:266-275). Traced, not static: the
        # sweep evaluates 9 lengths and a static arg would compile 9 separate
        # programs (each minutes through the remote-TPU compile service);
        # limit_obs ≤ 0 means "keep all" and folds to a multiply-by-ones.
        lim = jnp.asarray(limit_obs, jnp.int32)
        lim = jnp.where(lim > 0, lim, in_F)
        t_idx = jnp.arange(F)
        keep = (t_idx >= (in_F - lim)) | (t_idx >= in_F)
        keep = keep.astype(tgt_traj.dtype)[None, :, None, None]
        tgt_traj = tgt_traj * keep
        # cue tensors are already padded to F frames; frames ≥ in_F stay
        # (they replicate the last observed frame, which limit_obs keeps)
        tgt_3dbb = tgt_3dbb * keep
        tgt_2dbb = tgt_2dbb * keep
        tgt_3dpose = tgt_3dpose * keep[..., None]
        tgt_2dpose = tgt_2dpose * keep[..., None]

        det = not train

        # per-modality input projections + learned positional embeddings
        def emb(name, n):
            return self.param(name, nn.initializers.normal(0.02), (n, D))

        traj_f = nn.Dense(D, name="fc_in_traj")(tgt_traj)    # (B,F,N,D)
        traj_f = traj_f + emb("pe_traj_time", F)[None, :, None]
        traj_f = traj_f + emb("pe_traj_id", 1)[0][None, None, None]

        if c.use_3dbb:
            bb3_f = nn.Dense(D, name="fc_in_3dbb")(tgt_3dbb[:, :in_F])
            bb3_f = bb3_f + emb("pe_3dbb", in_F)[None, :, None]
        bb2_f = nn.Dense(D, name="fc_in_2dbb")(tgt_2dbb[:, :in_F])
        bb2_f = bb2_f + emb("pe_2dbb", in_F)[None, :, None]

        p3_f = nn.Dense(D, name="fc_in_3dpose")(tgt_3dpose[:, :in_F])
        p3_f = p3_f + emb("pe_3dpose", in_F * c.num_3dpose).reshape(
            in_F, c.num_3dpose, D)[None, :, None]
        if c.use_2dpose:
            p2_f = nn.Dense(D, name="fc_in_2dpose")(tgt_2dpose[:, :in_F])
            p2_f = p2_f + emb("pe_2dpose", in_F * c.num_2dpose).reshape(
                in_F, c.num_2dpose, D)[None, :, None]

        # ---- local (CMT) former: per person, over its token sequence ----
        # stream order matches the reference concat (model_jta.py:309 /
        # model_jrdb.py:118): traj, [3dbb], 2dbb, 3dpose, [2dpose]
        def flatten_person(x):
            # (B, T, N, …, D) → (B·N, T·…, D)
            x = jnp.moveaxis(x, 2, 1)                        # (B,N,T,…,D)
            return x.reshape(B * N, -1, D)

        parts = [flatten_person(traj_f)]
        if c.use_3dbb:
            parts.append(flatten_person(bb3_f))
        parts.append(flatten_person(bb2_f))
        parts.append(flatten_person(p3_f))
        if c.use_2dpose:
            parts.append(flatten_person(p2_f))
        seq = jnp.concatenate(parts, axis=1)                 # (B·N, S, D)

        local_in = seq
        h = EncoderStack(c.nlayers_local, D, c.nhead, c.dim_ff, c.dropout,
                         name="local")(seq, deterministic=det)
        h = h * c.output_scale + local_in                    # local residual

        # ---- global (ST) former: traj tokens across people ----
        traj_tok = h[:, :F].reshape(B, N, F, D)
        g_in = traj_tok.reshape(B, N * F, D)
        mask = jnp.repeat(padding_mask, F, axis=1)           # (B, N·F)
        g = EncoderStack(c.nlayers_global, D, c.nhead, c.dim_ff, c.dropout,
                         name="global")(g_in, key_padding_mask=mask,
                                        deterministic=det)
        g = g * c.output_scale + g_in                        # global residual

        primary = g.reshape(B, N, F, D)[:, 0]                # (B,F,D)

        if c.multi_modal:
            # all nmode heads as one Dense(2·nmode): identical function
            # family to the reference's per-mode Dense stack
            # (model_jta.py:147-158) but a single MXU matmul to trace
            out = nn.Dense(2 * c.nmode, name="heads")(primary)
            return out.reshape(B, F, c.nmode, 2)             # (B,F,nmode,2)
        out = nn.Dense(2, name="fc_out_traj")(primary)
        return out[:, :, None]                               # (B,F,1,2)
