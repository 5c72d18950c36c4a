"""Multi-host (multi-process) training dryrun: 2 simulated processes on CPU.

VERDICT r4 #8: the reference launches multi-node DDP via slurm/mpi/pytorch
(reference train.py:56-64); the TPU-native equivalent is JAX multi-process
with a global mesh (parallel/multihost.py). This test spawns TWO real
processes running the real train CLI with --multihost (each with 2 virtual
CPU devices -> a 4-device global mesh), and checks both complete one epoch of
the DDP plan-fed step and log identical losses (the state is replicated, so
every process must compute the same numbers).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

# heavy tier: spawns 2 compile processes
pytestmark = pytest.mark.heavy

TINY_CFG = """
_base_ = ['{base}']
model = dict(
    voxelizer=dict(
        point_cloud_range=[0.0, -8.0, -3.0, 16.0, 8.0, 1.0],
        voxel_size=[0.5, 0.5, 0.125],
        max_points_per_voxel=3,
        max_voxels=256,
    ),
    bbox_head=dict(
        anchor_ranges=[
            [0, -8.0, -0.6, 16.0, 8.0, -0.6],
            [0, -8.0, -0.6, 16.0, 8.0, -0.6],
            [0, -8.0, -0.6, 16.0, 8.0, -0.6],
        ],
    ),
)
max_epochs = 1
val_interval = 5
batch_size = 4
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_multihost_cli(tmp_path):
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "_base_", "kitti-3d-3class.py",
    )
    cfg_path = tmp_path / "tiny.py"
    cfg_path.write_text(TINY_CFG.format(base=base))
    port = _free_port()

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".pytest_jax_cache"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = []
    for pid in range(2):
        wd = tmp_path / f"wd{pid}"
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "robustpointclouds_tpu.cli.train",
             str(cfg_path), "--cpu", "--synthetic", "--multihost",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--steps-per-epoch", "2", "--work-dir", str(wd)],
            cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    assert "[multihost] process 0/2, mesh over 4 global devices (2 local)" in outs[0]
    assert "[multihost] process 1/2" in outs[1]

    # replicated state => both processes log the SAME loss every step
    losses = []
    for pid in range(2):
        log = tmp_path / f"wd{pid}" / "train_log.jsonl"
        assert log.is_file(), outs[pid][-2000:]
        rows = [json.loads(line) for line in log.read_text().splitlines()]
        assert rows and all(np.isfinite(r["loss"]) for r in rows)
        losses.append([r["loss"] for r in rows])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # checkpoint written by process 0 only (rank-0 CheckpointHook semantics)
    assert (tmp_path / "wd0" / "0").is_dir(), outs[0][-2000:]
    assert not (tmp_path / "wd1" / "0").exists(), outs[1][-2000:]
