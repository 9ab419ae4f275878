"""Generate synthetic example sessions in every format the CLI accepts.

Creates small self-contained datasets under ``data/`` (analogous to the
reference's bundled sessions, SURVEY.md §2.1 row 29, but synthetic — no data
is copied from the reference):

  data/singlecam/        5 seeds x 500 frames x 3 keypoints
  data/mirrored/         5 seeds, 2 mirrored views in one CSV per seed
  data/multicam/         3 seeds x 2 cameras, separate CSVs + calibration.toml
  data/pupil/            5 seeds of the fixed 4-keypoint pupil set
  data/paw/              3 seeds x 2 async cameras + timestamp .npy files

Run: ``python examples/make_example_data.py [out_root]``
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd


def _dlc_frame(data: np.ndarray, kps: list[str], scorer: str) -> pd.DataFrame:
    cols = pd.MultiIndex.from_product(
        [[scorer], kps, ["x", "y", "likelihood"]],
        names=["scorer", "bodyparts", "coords"],
    )
    return pd.DataFrame(data, columns=cols)


def _walk(rng, T, K, scale=3.0, base=80.0):
    return rng.normal(size=(T, K, 2)).cumsum(axis=0) * scale / np.sqrt(T) + base


def _seeded(rng, truth, noise):
    T, K, _ = truth.shape
    out = np.zeros((T, K, 3))
    out[..., :2] = truth + rng.normal(size=(T, K, 2)) * noise
    out[..., 2] = rng.uniform(0.7, 1.0, size=(T, K))
    return out.reshape(T, K * 3)


def make_singlecam(root, rng, T=500, seeds=5):
    d = os.path.join(root, "singlecam")
    os.makedirs(d, exist_ok=True)
    kps = ["nose", "left_ear", "tail_base"]
    truth = _walk(rng, T, len(kps))
    for s in range(seeds):
        df = _dlc_frame(_seeded(rng, truth, 0.8), kps, "example_tracker")
        df.to_csv(os.path.join(d, f"session.rng={s}.csv"))


def make_mirrored(root, rng, T=500, seeds=5):
    d = os.path.join(root, "mirrored")
    os.makedirs(d, exist_ok=True)
    base_kps = ["paw1", "paw2"]
    kps = [f"{kp}_{cam}" for kp in base_kps for cam in ["top", "bot"]]
    truth = _walk(rng, T, len(kps))
    for s in range(seeds):
        df = _dlc_frame(_seeded(rng, truth, 0.6), kps, "example_tracker")
        df.to_csv(os.path.join(d, f"session.rng={s}.csv"))


def make_multicam(root, rng, T=400, seeds=3):
    d = os.path.join(root, "multicam")
    os.makedirs(d, exist_ok=True)
    kps = ["head", "thorax"]
    # two synthetic pinhole cameras looking at a 3D random walk
    cams = []
    for c in range(2):
        cams.append(
            dict(
                name=f"cam{c}",
                matrix=[[900.0 + 40 * c, 0.0, 320.0], [0.0, 900.0 + 40 * c, 240.0], [0.0, 0.0, 1.0]],
                distortions=[0.02, -0.005, 0.0, 0.0, 0.0],
                rotation=[float(v) for v in rng.normal(size=3) * 0.2],
                translation=[0.3 * c - 0.15, 0.05 * c, 4.0 + 0.5 * c],
            )
        )
    # calibration TOML
    with open(os.path.join(d, "calibration.toml"), "w") as f:
        for i, cam in enumerate(cams):
            f.write(f"[cam_{i}]\n")
            f.write(f'name = "{cam["name"]}"\n')
            f.write("size = [ 640, 480,]\n")
            f.write(f"matrix = {cam['matrix']}\n".replace("'", ""))
            f.write(f"distortions = {cam['distortions']}\n")
            f.write(f"rotation = {cam['rotation']}\n")
            f.write(f"translation = {cam['translation']}\n\n")
        f.write("[metadata]\nadjusted = false\nerror = 0.0\n")

    from eks_tpu.geometry import CameraGroup

    group = CameraGroup.load(os.path.join(d, "calibration.toml"))
    X = rng.normal(size=(T, len(kps), 3)).cumsum(axis=0) * 0.01
    import jax.numpy as jnp

    for c, cam in enumerate(group.cameras):
        uv = np.asarray(cam.projection_fn()(jnp.asarray(X.reshape(-1, 3))))
        uv = uv.reshape(T, len(kps), 2)
        for s in range(seeds):
            arr = np.zeros((T, len(kps), 3))
            arr[..., :2] = uv + rng.normal(size=uv.shape) * 1.0
            arr[..., 2] = rng.uniform(0.8, 1.0, size=(T, len(kps)))
            df = _dlc_frame(arr.reshape(T, -1), kps, "example_tracker")
            df.to_csv(os.path.join(d, f"session.{cam.name}.rng={s}.csv"))


def make_pupil(root, rng, T=500, seeds=5):
    d = os.path.join(root, "pupil")
    os.makedirs(d, exist_ok=True)
    kps = ["pupil_top_r", "pupil_bottom_r", "pupil_right_r", "pupil_left_r"]
    cx, cy = 60.0, 40.0
    diam = 10.0 + np.sin(np.linspace(0, 6 * np.pi, T)) * 1.5
    com = rng.normal(size=(T, 2)).cumsum(axis=0) * 0.05 + [cx, cy]
    truth = np.zeros((T, 4, 2))
    truth[:, 0] = com + np.stack([np.zeros(T), -diam / 2], -1)  # top
    truth[:, 1] = com + np.stack([np.zeros(T), diam / 2], -1)  # bottom
    truth[:, 2] = com + np.stack([diam / 2, np.zeros(T)], -1)  # right
    truth[:, 3] = com + np.stack([-diam / 2, np.zeros(T)], -1)  # left
    for s in range(seeds):
        df = _dlc_frame(_seeded(rng, truth, 0.25), kps, "example_tracker")
        df.to_csv(os.path.join(d, f"session.rng={s}.csv"))


def make_paw(root, rng, T_left=400, T_right=480, seeds=3):
    d = os.path.join(root, "paw")
    os.makedirs(d, exist_ok=True)
    kps = ["paw_l", "paw_r"]
    ts_left = np.linspace(0.0, 20.0, T_left)
    ts_right = np.linspace(-0.4, 20.4, T_right)
    np.save(os.path.join(d, "session.timestamps.left.npy"), ts_left)
    np.save(os.path.join(d, "session.timestamps.right.npy"), ts_right)
    truth_l = _walk(rng, T_left, len(kps), base=64.0)
    truth_r = _walk(rng, T_right, len(kps), base=64.0)
    for s in range(seeds):
        df = _dlc_frame(_seeded(rng, truth_l, 0.5), kps, "example_tracker")
        df.to_csv(os.path.join(d, f"session.left.rng={s}.csv"))
        df = _dlc_frame(_seeded(rng, truth_r, 0.5), kps, "example_tracker")
        df.to_csv(os.path.join(d, f"session.right.rng={s}.csv"))


def main(root: str | None = None):
    root = root or os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
    rng = np.random.default_rng(42)
    make_singlecam(root, rng)
    make_mirrored(root, rng)
    make_multicam(root, rng)
    make_pupil(root, rng)
    make_paw(root, rng)
    print(f"example data written under {root}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
