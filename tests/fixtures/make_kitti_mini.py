"""Generator for the committed KITTI mini-fixture (tests/fixtures/kitti_mini).

Writes 3 tiny frames in the REAL on-disk KITTI layout — velodyne/*.bin
(float32 x,y,z,intensity), label_2/*.txt (camera-frame labels, devkit column
order), calib/*.txt (P0-P3 / R0_rect / Tr_velo_to_cam / Tr_imu_to_velo) plus
ImageSets split files — matching the data layout contract the reference
configures (reference configs/_base_/kitti-3d-car.py:27-103: data_root with
training/{velodyne,label_2,calib} and ImageSets/{train,val}.txt).

The fixture is checked in; this script only exists so the files are
reproducible (`python tests/fixtures/make_kitti_mini.py` regenerates them
bit-for-bit). Frames are small (≈700 points) and every object sits inside the
tiny smoke-grid range (0,-8,-3)..(16,8,1) so the default-tier test can run
the full reader → host-plan → train-step → eval-CLI chain on them quickly.

Labels are authored by the exact forward transform (lidar box -> camera
frame via R0 @ Tr_velo_to_cam), so the reader's inverse conversion
(data/kitti.read_label) must recover the intended lidar boxes — the
round-trip is asserted in tests/test_kitti_mini.py against the literals in
`EXPECTED` below.
"""
from __future__ import annotations

import os

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "kitti_mini")

# Realistic (KITTI-like) calibration: the standard camera<-lidar axis swap
# perturbed by a small rotation, a nonzero translation, and a non-identity
# rectification — so the test exercises the full R0 @ Tr inversion, not the
# identity shortcut.
def _rot(axis, angle):
    c, s = np.cos(angle), np.sin(angle)
    if axis == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


AXIS_SWAP = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
R_TR = _rot("x", 0.008) @ _rot("y", -0.005) @ _rot("z", 0.012) @ AXIS_SWAP
T_TR = np.array([-0.002, -0.075, -0.272])  # KITTI-like cam<-velo offset
R0 = _rot("z", 0.002) @ _rot("y", 0.001)
P2 = np.array([
    [721.54, 0.0, 609.56, 44.857],
    [0.0, 721.54, 172.854, 0.2163],
    [0.0, 0.0, 1.0, 0.00274],
])

# (frame, class, x, y, z_center, l, w, h, yaw) in the LIDAR frame; all inside
# the tiny grid range. 'Van' exercises unused-class filtering.
OBJECTS = [
    ("000000", "Car", 6.0, 2.0, -0.92, 3.9, 1.6, 1.56, 0.30),
    ("000000", "Pedestrian", 9.0, -2.5, -0.80, 0.8, 0.6, 1.73, -1.20),
    ("000001", "Car", 10.0, -3.0, -0.95, 4.2, 1.7, 1.50, 2.00),
    ("000001", "Cyclist", 7.5, 4.0, -0.85, 1.76, 0.6, 1.73, 0.00),
    ("000001", "Van", 13.0, 0.0, -0.80, 4.8, 1.9, 2.0, 0.10),
    ("000002", "Car", 12.0, 4.5, -0.90, 3.8, 1.55, 1.45, -0.70),
    ("000002", "Car", 5.0, -5.0, -1.00, 4.0, 1.62, 1.52, 1.40),
]
# truncated, occluded chosen so difficulty spans easy/moderate (devkit rules)
OBJ_META = {
    ("000000", 0): (0.00, 0, 48.0),  # bbox height 48px -> easy
    ("000000", 1): (0.10, 1, 30.0),  # -> moderate
    ("000001", 0): (0.00, 0, 55.0),
    ("000001", 1): (0.20, 1, 27.0),
    ("000001", 2): (0.00, 0, 42.0),
    ("000002", 0): (0.00, 0, 44.0),
    ("000002", 1): (0.05, 0, 41.0),
}


def _to_camera(x, y, zc, h):
    """Lidar box center -> camera-frame bottom-center location."""
    bottom = np.array([x, y, zc - h / 2.0])
    return R0 @ (R_TR @ bottom + T_TR)


def _project(loc_cam):
    uvw = P2 @ np.array([*loc_cam, 1.0])
    return uvw[:2] / uvw[2]


def _frame_points(rng, objs):
    """Ground plane + in-box clusters + clutter, all float32 xyzi."""
    ground = np.zeros((420, 4), np.float32)
    ground[:, 0] = rng.uniform(0.5, 15.5, 420)
    ground[:, 1] = rng.uniform(-7.5, 7.5, 420)
    ground[:, 2] = rng.normal(-1.72, 0.02, 420)
    ground[:, 3] = rng.uniform(0.1, 0.4, 420)
    parts = [ground]
    for (x, y, zc, l, w, h, yaw) in objs:
        n = 70
        pts = np.zeros((n, 4), np.float32)
        local = rng.uniform([-l / 2, -w / 2, -h / 2], [l / 2, w / 2, h / 2], (n, 3))
        c, s = np.cos(yaw), np.sin(yaw)
        pts[:, 0] = x + local[:, 0] * c - local[:, 1] * s
        pts[:, 1] = y + local[:, 0] * s + local[:, 1] * c
        pts[:, 2] = zc + local[:, 2]
        pts[:, 3] = rng.uniform(0.3, 0.9, n)
        parts.append(pts)
    clutter = np.zeros((60, 4), np.float32)
    clutter[:, 0] = rng.uniform(0.5, 15.5, 60)
    clutter[:, 1] = rng.uniform(-7.5, 7.5, 60)
    clutter[:, 2] = rng.uniform(-1.5, 0.8, 60)
    clutter[:, 3] = rng.uniform(0.0, 1.0, 60)
    parts.append(clutter)
    return np.concatenate(parts).astype(np.float32)


def _fmt(mat):
    return " ".join(f"{v:.12e}" for v in np.asarray(mat).ravel())


def main():
    for sub in ("training/velodyne", "training/label_2", "training/calib",
                "ImageSets"):
        os.makedirs(os.path.join(ROOT, sub), exist_ok=True)

    frames = sorted({o[0] for o in OBJECTS})
    rng = np.random.RandomState(20260818)
    for fid in frames:
        objs = [o[2:] for o in OBJECTS if o[0] == fid]
        pts = _frame_points(rng, objs)
        pts.tofile(os.path.join(ROOT, f"training/velodyne/{fid}.bin"))

        with open(os.path.join(ROOT, f"training/calib/{fid}.txt"), "w") as f:
            f.write(f"P0: {_fmt(P2)}\n")
            f.write(f"P1: {_fmt(P2)}\n")
            f.write(f"P2: {_fmt(P2)}\n")
            f.write(f"P3: {_fmt(P2)}\n")
            f.write(f"R0_rect: {_fmt(R0)}\n")
            f.write(f"Tr_velo_to_cam: {_fmt(np.c_[R_TR, T_TR])}\n")
            f.write(f"Tr_imu_to_velo: {_fmt(np.eye(3, 4))}\n")

        lines = []
        for k, (_, name, x, y, zc, l, w, h, yaw) in enumerate(
            o for o in OBJECTS if o[0] == fid
        ):
            trunc, occ, box_h = OBJ_META[(fid, k)]
            loc = _to_camera(x, y, zc, h)
            rot_y = -(yaw + np.pi / 2.0)
            u, v = _project(loc)
            bbox = (u - box_h * 0.4, v - box_h, u + box_h * 0.4, v)
            alpha = rot_y - np.arctan2(loc[0], loc[2])
            lines.append(
                f"{name} {trunc:.2f} {occ} {alpha:.2f} "
                f"{bbox[0]:.2f} {bbox[1]:.2f} {bbox[2]:.2f} {bbox[3]:.2f} "
                f"{h:.2f} {w:.2f} {l:.2f} "
                f"{loc[0]:.6f} {loc[1]:.6f} {loc[2]:.6f} {rot_y:.6f}"
            )
        lines.append("DontCare -1 -1 -10 610.00 170.00 640.00 185.00 "
                     "-1 -1 -1 -1000 -1000 -1000 -10")
        with open(os.path.join(ROOT, f"training/label_2/{fid}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")

    with open(os.path.join(ROOT, "ImageSets/train.txt"), "w") as f:
        f.write("000000\n000001\n")
    with open(os.path.join(ROOT, "ImageSets/val.txt"), "w") as f:
        f.write("000002\n")
    print(f"wrote kitti_mini fixture under {ROOT}")


if __name__ == "__main__":
    main()
