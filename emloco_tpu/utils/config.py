"""Run configuration: YAML + dotted CLI overrides over the typed configs.

Replaces the reference's three-tier flag system (argparse with isaacgym's
custom-parameter schema + two YAML files + a mutable global `flags` singleton;
utils/config.py:24-529, flags.py:1-11, run.py:263-315) with ONE composition:
frozen config pytrees constructed from a YAML dict with `key.subkey=value`
overrides. No mutable global state — everything threads explicitly.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import yaml

from ..envs.getup import GetupEnvConfig
from ..envs.pedestrian_terrain import DRConfig, EnvConfig
from ..envs.traj_gen import TrajConfig
from ..learning.amp_agent import AMPConfig
from ..learning.value_train import ValueTrainConfig
from ..physics.types import EngineConfig
from ..prediction.eqmotion import EqMotionConfig
from ..prediction.model import TransMotionConfig
from ..prediction.train import PredictTrainConfig


_SECTIONS = {
    "env": EnvConfig,
    "traj": TrajConfig,
    "engine": EngineConfig,
    "amp": AMPConfig,
    "value": ValueTrainConfig,
    "model": TransMotionConfig,
    "predict": PredictTrainConfig,
    "eqmotion": EqMotionConfig,
}


@dataclasses.dataclass
class RunConfig:
    env: EnvConfig
    amp: AMPConfig
    value: ValueTrainConfig
    model: TransMotionConfig
    predict: PredictTrainConfig
    # run-level knobs
    # env task family: "terrain" (HumanoidPedestrianTerrain), "getup"
    # (…TerrainGetup fall-recovery variant), "hand" (…TerrainHand)
    task: str = "terrain"
    seed: int = 0
    out_dir: str = "output/run"
    epochs: int = 1000
    save_every: int = 200
    terrain: dict = dataclasses.field(default_factory=dict)
    motions: Optional[str] = None        # motion pkl path (None → synthetic)
    # SMPL model npz for vert-fit mesh colliders + regressed offsets
    # (kinematics.body_model.from_smpl_npz); None → auto: when
    # engine.mesh_contacts is on, fall back to the committed fixture so
    # self-contact/getup runs get real per-beta collision spheres instead
    # of capsule-axis defaults (reference builds per-beta vertex colliders,
    # smpl_local_robot.py:83-146)
    smpl_npz: Optional[str] = None
    real_traj_pkl: Optional[str] = None  # real-path bank (None → synthetic)
    ndjson: Optional[str] = None         # real JTA/JRDB ndjson scenes for the
    ndjson_val: Optional[str] = None     # predictor (None → synthetic)
    # EqMotion baseline (reference main_eth_diverse.py): raw ETH-UCY txt
    # annotations (frame ped x y @2.5 Hz); None → synthetic scenes
    eqmotion: "EqMotionConfig" = None
    ethucy: Optional[str] = None
    ethucy_val: Optional[str] = None


def _apply(cls, base, overrides: dict):
    if not overrides:
        return base
    known = {f.name for f in dataclasses.fields(cls)}
    bad = set(overrides) - known
    if bad:
        raise KeyError(f"unknown {cls.__name__} keys: {sorted(bad)}")
    return base.replace(**overrides) if hasattr(base, "replace") \
        else dataclasses.replace(base, **overrides)


def load_config(yaml_path: Optional[str] = None,
                overrides: Optional[list] = None) -> RunConfig:
    """Build a RunConfig from an optional YAML file plus dotted overrides
    like ["env.num_envs=1024", "amp.lr=1e-5"]."""
    raw: dict = {}
    if yaml_path:
        with open(yaml_path) as f:
            raw = yaml.safe_load(f) or {}
    for ov in overrides or []:
        key, val = ov.split("=", 1)
        parts = key.split(".")
        d = raw
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = yaml.safe_load(val)

    engine = _apply(EngineConfig, EngineConfig(), raw.get("engine", {}))
    traj = _apply(TrajConfig, TrajConfig(), raw.get("traj", {}))
    dr = _apply(DRConfig, DRConfig(), raw.get("dr", {}))
    task = str(raw.get("task", "terrain"))
    env_cls = GetupEnvConfig if task == "getup" else EnvConfig
    env_over = dict(raw.get("env", {}))
    env = _apply(env_cls, env_cls(engine=engine, traj=traj, dr=dr), env_over)
    return RunConfig(
        env=env,
        task=task,
        amp=_apply(AMPConfig, AMPConfig(), raw.get("amp", {})),
        value=_apply(ValueTrainConfig, ValueTrainConfig(),
                     raw.get("value", {})),
        model=_apply(TransMotionConfig, TransMotionConfig(),
                     raw.get("model", {})),
        predict=_apply(PredictTrainConfig, PredictTrainConfig(),
                       raw.get("predict", {})),
        eqmotion=_apply(EqMotionConfig, EqMotionConfig(),
                        raw.get("eqmotion", {})),
        seed=int(raw.get("seed", 0)),
        out_dir=str(raw.get("out_dir", "output/run")),
        epochs=int(raw.get("epochs", 1000)),
        save_every=int(raw.get("save_every", 200)),
        terrain=raw.get("terrain", {}),
        motions=raw.get("motions"),
        smpl_npz=raw.get("smpl_npz"),
        real_traj_pkl=raw.get("real_traj_pkl"),
        ndjson=raw.get("ndjson"),
        ndjson_val=raw.get("ndjson_val"),
        ethucy=raw.get("ethucy"),
        ethucy_val=raw.get("ethucy_val"),
    )
