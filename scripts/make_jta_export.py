"""Generate faithful-format JTA all-visual-cues ndjson exports.

Real JTA/JRDB exports cannot be fetched in this environment (zero egress), so
this writes the reference's exact export schema (SceneRow / TrackRow_all_jta,
trajnetplusplustools/data.py:2-7 consumed by Reader_jta_all_visual_cues,
reader.py:144-266) from the kinematically-consistent synthetic scene
generator. Training/eval on these files exercises the ENTIRE real-data
ingestion path (ndjson parse -> window/drop/pad -> token layout ->
normalization); only the underlying motion is synthetic.

Usage: python scripts/make_jta_export.py [out_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force CPU — the ambient env binds the axon TPU tunnel otherwise, and this
# is host-side data generation that must not contend with chip jobs. The
# axon sitecustomize runs before this file, so the env vars alone are too
# late: the in-process config update is the authoritative switch.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from emloco_tpu.prediction.data import SyntheticScenes, write_ndjson_all_cues  # noqa: E402

SPLITS = {"train": (400, 0), "val": (80, 1000), "test": (80, 2000)}


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "output/data"
    os.makedirs(out_dir, exist_ok=True)
    for split, (n, seed) in SPLITS.items():
        gen = SyntheticScenes(num_people=4, seed=seed)
        scenes = [gen.scene() for _ in range(n)]
        path = os.path.join(out_dir, f"jta_synth_{split}.ndjson")
        write_ndjson_all_cues(path, scenes)
        print(f"{path}: {n} scenes, {os.path.getsize(path) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
