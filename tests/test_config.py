"""Config loader round-trips (reference three-tier flag system,
pacer/pacer/utils/config.py:24-529 — ours is one YAML + dotted overrides)."""
import pytest

from emloco_tpu.utils.config import load_config


def test_top_level_overrides_reach_runconfig():
    # regression: ndjson/ndjson_val were accepted by the parser but silently
    # dropped when constructing RunConfig, so "real-data" predictor runs
    # fell back to synthetic scenes
    cfg = load_config(None, [
        "ndjson=/tmp/a.ndjson", "ndjson_val=/tmp/b.ndjson",
        "motions=/tmp/m.pkl", "real_traj_pkl=/tmp/r.pkl",
        "out_dir=/tmp/o", "epochs=7", "seed=3", "task=getup",
    ])
    assert cfg.ndjson == "/tmp/a.ndjson"
    assert cfg.ndjson_val == "/tmp/b.ndjson"
    assert cfg.motions == "/tmp/m.pkl"
    assert cfg.real_traj_pkl == "/tmp/r.pkl"
    assert cfg.out_dir == "/tmp/o"
    assert cfg.epochs == 7 and cfg.seed == 3 and cfg.task == "getup"


def test_dotted_section_overrides():
    cfg = load_config(None, ["env.num_envs=12", "predict.lr=0.5",
                             "model.nmode=4", "engine.self_contact=true"])
    assert cfg.env.num_envs == 12
    assert cfg.predict.lr == 0.5
    assert cfg.model.nmode == 4
    assert cfg.env.engine.self_contact is True


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        load_config(None, ["env.not_a_field=1"])


def test_tensorboard_event_writer_roundtrip(tmp_path):
    """Native TensorBoard sink (utils/tracking.py — the reference's
    wandb/tensorboard run tracking, run.py:344-353): records carry valid
    TFRecord CRCs and scalars parse back exactly."""
    from emloco_tpu.utils.logging import MetricsLogger
    from emloco_tpu.utils.tracking import read_scalars

    log = MetricsLogger(out_dir=str(tmp_path), name="t", print_every=10)
    log.log(1, {"loss": 1.25, "reward": 0.5})
    log.log(2, {"loss": 0.75})
    log.close()
    path = log._tb.path
    rows = set(read_scalars(path))
    assert (1, "loss", 1.25) in rows
    assert (1, "reward", 0.5) in rows
    assert (2, "loss", 0.75) in rows
    # jsonl sink still written alongside
    import json, os
    with open(os.path.join(str(tmp_path), "t.metrics.jsonl")) as f:
        lines = [json.loads(x) for x in f]
    assert lines[0]["loss"] == 1.25 and lines[1]["step"] == 2
