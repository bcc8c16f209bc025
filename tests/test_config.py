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
