"""Generate faithful-format JRDB all-visual-cues ndjson exports.

Real JRDB exports cannot be fetched here (zero egress), so this writes the
reference's JRDB export schema from the same kinematically-consistent
synthetic generator as make_jta_export.py, with the JRDB cue set: the
reference's jrdb_all_visual_cues.yaml runs TransMotionJRDB on
[trajectory, 2D box, 3D pose] (token_num 26 = 1 + 1 + 24, model_jrdb.py:12),
i.e. NO 3D box and NO 2D pose streams — those cue slots are absent in the
ndjson and read back NaN (Reader_jrdb style, trajnetplusplustools/
reader.py:10-143).

Pose convention: JRDB 3D poses are consumed AS-IS — train_jrdb.py:187 ships
the z-flip commented out — so this export carries z-UP poses (the generator's
FK frame), unlike the JTA export which negates z to match the raw JTA
convention (see SyntheticScenes.scene()).

Usage: python scripts/make_jrdb_export.py [out_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force CPU — host-side data generation must not contend with chip jobs; the
# axon sitecustomize runs first, so the in-process update is authoritative
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from emloco_tpu.prediction.data import SyntheticScenes, write_ndjson_all_cues  # noqa: E402

SPLITS = {"train": (400, 100), "val": (80, 1100), "test": (80, 2100)}


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "output/data_jrdb"
    os.makedirs(out_dir, exist_ok=True)
    zflip = np.array([1.0, 1.0, -1.0], np.float32)
    for split, (n, seed) in SPLITS.items():
        gen = SyntheticScenes(num_people=4, seed=seed)
        scenes = []
        for _ in range(n):
            s = gen.scene()
            scenes.append(dict(
                traj=s["traj"],
                box2d=s["box2d"],
                # undo the JTA raw z-negation: JRDB poses ride z-up
                pose3d=s["pose3d"] * zflip,
            ))
        path = os.path.join(out_dir, f"jrdb_synth_{split}.ndjson")
        write_ndjson_all_cues(path, scenes)
        print(f"{path}: {n} scenes, {os.path.getsize(path) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
