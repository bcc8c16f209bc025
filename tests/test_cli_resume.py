"""train-policy --resume fidelity: absolute epoch numbering, optimizer
moments and value_norm restored from the checkpoint (reference restores the
full rl_games state dict incl. optimizer + running stats,
common_agent.py:248-265 / set_full_state_weights)."""
import numpy as np
import pytest

from emloco_tpu.cli.run import main
from emloco_tpu.utils.checkpoint import load_pytree

TINY = [
    "terrain.map_length=4.0", "terrain.num_tiles=1",
    "env.num_envs=4", "env.sensor_res=8", "env.episode_length=16",
    "env.num_amp_obs_steps=5",
    "amp.horizon=4", "amp.num_minibatches=2", "amp.mini_epochs=1",
    "amp.amp_batch_size=16", "amp.amp_replay_size=64",
    "save_every=2",
]


def test_train_policy_resume_absolute_epochs(tmp_path):
    out = str(tmp_path)
    main(["train-policy", f"out_dir={out}", "epochs=3", *TINY])
    ck = tmp_path / "policy_00000002.ckpt"
    assert ck.exists(), sorted(p.name for p in tmp_path.iterdir())
    tree, meta = load_pytree(str(ck))
    # the checkpoint now carries full resume state
    assert meta["epoch"] == 2
    assert "opt_state" in tree and "value_norm" in tree

    # resume for 2 more epochs: filenames continue at the absolute epoch
    main(["train-policy", "--resume", str(ck),
          f"out_dir={out}", "epochs=2", *TINY])
    ck4 = tmp_path / "policy_00000004.ckpt"
    assert ck4.exists(), sorted(p.name for p in tmp_path.iterdir())
    tree4, meta4 = load_pytree(str(ck4))
    assert meta4["epoch"] == 4

    # optimizer moments were restored, not re-initialized: after 2 more
    # epochs of updates the resumed moments differ from a cold Adam start
    leaves = [np.asarray(x) for x in
              __import__("jax").tree.leaves(tree4["opt_state"])]
    assert any(np.any(l != 0) for l in leaves if l.dtype.kind == "f")


def test_train_policy_resume_restores_norms(tmp_path):
    out = str(tmp_path)
    main(["train-policy", f"out_dir={out}", "epochs=3", *TINY])
    tree, _ = load_pytree(str(tmp_path / "policy_00000002.ckpt"))
    # value_norm accumulated statistics during training and round-trips
    count = np.asarray(tree["value_norm"].count)
    assert count > 1


def test_train_eqmotion_arch_full(tmp_path):
    """train-eqmotion --arch full runs the architecture-exact EqMotion port
    on the eth 20-mode interface end-to-end through the CLI (synthetic
    scenes) and writes a loadable checkpoint."""
    out = str(tmp_path)
    main(["train-eqmotion", "--arch", "full", "--channels", "8",
          "--batch-size", "4", "--batches", "2", "--threshold", "0.1",
          f"out_dir={out}", "epochs=2", "eqmotion.nmode=2"])
    tree, _ = load_pytree(str(tmp_path / "eqmotion.ckpt"))
    # the faithful module tree (core/gcl_*) — not the compact one
    assert "core" in tree["params"]["params"]
