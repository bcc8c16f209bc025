"""Write synthetic ETH-UCY-format annotation txts (frame ped x y @2.5 Hz).

The real ETH/UCY videos can't be redistributed or downloaded here; these
exports are format-faithful stand-ins (same row schema, 10-frame annotation
stride, staggered pedestrian presence, social-group walking statistics) so
the ingestion path (`prediction.eqmotion.ethucy_windows`) and the
train-eqmotion pipeline run exactly as they would on the real files.
"""
import argparse
import os

import numpy as np


def write_split(path, num_peds, num_frames, seed):
    rng = np.random.RandomState(seed)
    rows = []
    p_id = 0
    # pedestrians arrive in small groups with shared headings (ETH/UCY
    # crowds walk in pairs/groups along shared corridors)
    while p_id < num_peds:
        group = min(int(rng.randint(1, 4)), num_peds - p_id)
        start = int(rng.randint(0, max(1, num_frames - 25)))
        dur = int(rng.randint(20, num_frames - start + 1))
        heading = rng.uniform(-np.pi, np.pi)
        gx, gy = rng.uniform(-10, 10, 2)
        for g in range(group):
            p_id += 1
            x = gx + rng.normal() * 0.8
            y = gy + rng.normal() * 0.8
            h = heading + rng.normal() * 0.15
            speed = rng.uniform(0.6, 1.8) / 2.5
            curv = rng.normal() * 0.02
            jitter = rng.uniform(0.01, 0.05)
            for i in range(start, min(start + dur, num_frames)):
                h += curv + rng.normal() * jitter
                x += speed * np.cos(h)
                y += speed * np.sin(h)
                rows.append((i * 10, p_id, x, y))
    rows.sort()
    with open(path, "w") as f:
        for fr, p, x, y in rows:
            f.write(f"{fr:.1f}\t{p:.1f}\t{x:.4f}\t{y:.4f}\n")
    return len(rows)


def write_bank(txt_path, pkl_path, max_paths=2048, seed=0):
    """Trajectory bank for LocoVal training from the train-split windows:
    ego last-obs + 12 future waypoints (@0.4 s) splined to the sim's
    101-vertex chains (the reference trains its valuenet on real-path pkls
    from the prediction datasets, traj_generator.py:40-54 — matched
    trajectory statistics are what make the EmLoco value loss useful)."""
    import pickle

    from emloco_tpu.prediction.eqmotion import ethucy_windows
    from emloco_tpu.prediction.export import spline_to_vertices

    past, future = ethucy_windows(txt_path)
    wp = np.concatenate([past[:, 0, -1:], future[:, 0]], 1)   # (S, 13, 2)
    rng = np.random.RandomState(seed)
    idx = rng.permutation(len(wp))[:max_paths]
    bank = {f"w{i}": spline_to_vertices(wp[i]) for i in idx}
    with open(pkl_path, "wb") as f:
        pickle.dump(bank, f)
    return len(bank)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="output/data")
    ap.add_argument("--peds", type=int, default=160)
    ap.add_argument("--frames", type=int, default=400)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for split, seed in (("train", 0), ("val", 1), ("test", 2)):
        n = write_split(os.path.join(args.out_dir, f"ethucy_{split}.txt"),
                        args.peds if split == "train" else args.peds // 4,
                        args.frames, seed)
        print(split, n, "rows")
    nb = write_bank(os.path.join(args.out_dir, "ethucy_train.txt"),
                    os.path.join(args.out_dir, "ethucy_bank.pkl"))
    print("bank", nb, "paths")


if __name__ == "__main__":
    main()
