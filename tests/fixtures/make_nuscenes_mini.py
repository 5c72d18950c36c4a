"""Generator for the committed NuScenes mini-fixture (tests/fixtures/nuscenes_mini).

Real on-disk NuScenes-as-mmdet3d layout: `nuscenes_infos_{train,val}.pkl`
in the v2 info schema (`data_list` + `lidar_points`/`lidar_sweeps`/
`instances` with 9D bbox_3d incl. velocity and `attr_label`), key-frame
lidar bins under samples/LIDAR_TOP (float32 x,y,z,intensity,ring -> 5
floats/point) and one transformed sweep per frame under sweeps/LIDAR_TOP —
the data contract of the reference's NuScenes path
(train_nuscenes_adversarial.py:93-191 via mmdet3d info pkls).

Checked in; this script regenerates the files deterministically
(`python tests/fixtures/make_nuscenes_mini.py`). Objects sit inside the
tiny smoke grid (±12.8 m) so the default tier can run reader -> multi-sweep
aggregation -> host plan -> CenterPoint train step -> eval CLI quickly.
"""
from __future__ import annotations

import os
import pickle

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "nuscenes_mini")

# (frame, class_name, label_id, x, y, z_center, dx, dy, dz, yaw, vx, vy, attr)
# labels follow data/nuscenes.NUSCENES_CLASSES (flattened task order); attrs
# follow eval/nuscenes_metric.ATTRIBUTES indices
OBJECTS = [
    ("n000000", 0, 5.0, 2.0, -0.8, 4.6, 1.9, 1.7, 0.4, 2.0, 0.3, 5),   # car, vehicle.moving
    ("n000000", 8, -3.0, 6.0, -0.6, 0.7, 0.7, 1.8, 1.2, 0.5, 0.1, 2),  # pedestrian.moving
    ("n000001", 0, -7.0, -4.0, -0.9, 4.4, 1.8, 1.6, -1.1, 0.0, 0.0, 6),  # vehicle.parked
    ("n000001", 9, 3.5, -8.0, -0.7, 0.4, 0.4, 0.8, 0.0, 0.0, 0.0, -1),   # cone
    ("n000002", 0, 9.0, 1.0, -0.8, 4.8, 2.0, 1.8, 2.4, -1.0, 0.4, 5),
    ("n000002", 8, -5.0, -5.0, -0.5, 0.6, 0.6, 1.7, 0.3, 0.2, -0.2, 3),  # pedestrian.standing
]

# small ego-motion between the sweep and the key frame
SWEEP_R = np.array([
    [np.cos(0.02), -np.sin(0.02), 0.0],
    [np.sin(0.02), np.cos(0.02), 0.0],
    [0.0, 0.0, 1.0],
])
SWEEP_T = np.array([0.8, -0.1, 0.01])


def _frame_points(rng, objs, n_bg=500):
    pts = np.zeros((n_bg, 5), np.float32)
    pts[:, 0] = rng.uniform(-12.0, 12.0, n_bg)
    pts[:, 1] = rng.uniform(-12.0, 12.0, n_bg)
    pts[:, 2] = rng.normal(-1.8, 0.05, n_bg)
    pts[:, 3] = rng.uniform(0, 255, n_bg)
    parts = [pts]
    for (_, x, y, zc, dx, dy, dz, yaw) in objs:
        n = 60
        box = np.zeros((n, 5), np.float32)
        local = rng.uniform([-dx / 2, -dy / 2, -dz / 2], [dx / 2, dy / 2, dz / 2], (n, 3))
        c, s = np.cos(yaw), np.sin(yaw)
        box[:, 0] = x + local[:, 0] * c - local[:, 1] * s
        box[:, 1] = y + local[:, 0] * s + local[:, 1] * c
        box[:, 2] = zc + local[:, 2]
        box[:, 3] = rng.uniform(0, 255, n)
        parts.append(box)
    return np.concatenate(parts).astype(np.float32)


def main():
    os.makedirs(os.path.join(ROOT, "samples", "LIDAR_TOP"), exist_ok=True)
    os.makedirs(os.path.join(ROOT, "sweeps", "LIDAR_TOP"), exist_ok=True)
    rng = np.random.RandomState(20260819)
    frames = sorted({o[0] for o in OBJECTS})
    infos = []
    for i, fid in enumerate(frames):
        objs = [(o[1], *o[2:9]) for o in OBJECTS if o[0] == fid]
        key = _frame_points(rng, [(o[0], *o[1:]) for o in objs])
        key_rel = f"samples/LIDAR_TOP/{fid}.bin"
        key.tofile(os.path.join(ROOT, key_rel))

        # the sweep: the same static scene seen from the previous ego pose —
        # applying sensor2lidar (R|T) must land it back on the key frame
        sweep = _frame_points(rng, [(o[0], *o[1:]) for o in objs], n_bg=300)
        inv_R = SWEEP_R.T
        sweep[:, :3] = ((sweep[:, :3] - SWEEP_T) @ inv_R.T).astype(np.float32)
        sweep_rel = f"sweeps/LIDAR_TOP/{fid}_sw0.bin"
        sweep.tofile(os.path.join(ROOT, sweep_rel))

        key_ts = 1_533_151_603_547_590 + i * 500_000  # microseconds
        instances = []
        for (lbl, x, y, zc, dx, dy, dz, yaw), obj in zip(
            objs, (o for o in OBJECTS if o[0] == fid)
        ):
            vx, vy, attr = obj[9], obj[10], obj[11]
            instances.append({
                # v2 bbox_3d: (x, y, Z_BOTTOM, dx, dy, dz, yaw, vx, vy)
                "bbox_3d": [float(x), float(y), float(zc - dz / 2.0),
                            float(dx), float(dy), float(dz), float(yaw),
                            float(vx), float(vy)],
                "bbox_label_3d": int(lbl),
                "attr_label": int(attr),
            })
        infos.append({
            "token": f"mini_{fid}",
            "timestamp": key_ts,
            "lidar_points": {"lidar_path": key_rel, "num_pts_feats": 5},
            "lidar_sweeps": [{
                "lidar_points": {
                    "lidar_path": sweep_rel,
                    "timestamp": key_ts - 100_000,
                },
                "sensor2lidar_rotation": SWEEP_R.tolist(),
                "sensor2lidar_translation": SWEEP_T.tolist(),
            }],
            "instances": instances,
        })

    meta = {"metainfo": {"dataset": "nuscenes", "version": "v1.0-mini"}}
    with open(os.path.join(ROOT, "nuscenes_infos_train.pkl"), "wb") as f:
        pickle.dump(dict(meta, data_list=infos[:2]), f, protocol=4)
    with open(os.path.join(ROOT, "nuscenes_infos_val.pkl"), "wb") as f:
        pickle.dump(dict(meta, data_list=infos[2:]), f, protocol=4)
    print(f"wrote nuscenes_mini fixture under {ROOT}")


if __name__ == "__main__":
    main()
