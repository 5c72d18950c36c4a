"""Per-component timing of the adversarial train step on the attached chip.

Per-dispatch timing over the remote-device tunnel is unreliable (tiny jits
report impossible TFLOP/s), so every component is timed as ONE jit that runs
the component `ITERS` times inside a `lax.fori_loop` with a scalar data
dependency threaded through — nothing can be hoisted, memoized, or overlapped
away. Numbers are directly comparable to the full-step time measured the same
way.

Run: python -m robustpointclouds_tpu.tools.profile_components
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8


def timed(name, fn, *args):
    """fn(carry, *args) -> scalar; loops ITERS times inside one jit.

    The remote-device tunnel memoizes identical dispatches, so the timed call
    gets a fresh carry seed (extra scalar arg) — the loop body must recompute.
    """

    def looped(seed, *a):
        def body(_, c):
            return fn(c, *a)

        return jax.lax.fori_loop(0, ITERS, body, seed)

    f = jax.jit(looped)
    out = f(jnp.float32(0.0), *args)
    out.block_until_ready()  # compile + warm
    t0 = time.time()
    out = f(jnp.float32(1e-9), *args)
    out.block_until_ready()
    dt = (time.time() - t0) / ITERS
    print(f"{name:42s} {dt*1e3:9.2f} ms/iter", flush=True)
    return dt


def main():
    from robustpointclouds_tpu.data import synthetic_kitti_batch
    from robustpointclouds_tpu.data.structures import PointCloudBatch
    from robustpointclouds_tpu.models import AdversarialVoxelNet, VoxelNetConfig
    from robustpointclouds_tpu.models.detection import anchor_head_loss
    from robustpointclouds_tpu.ops import sparse
    from robustpointclouds_tpu.ops.voxelize import voxelize_batch
    from robustpointclouds_tpu.train import TrainConfig, Trainer

    cache_dir = "/root/repo/.jax_cache"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    B = 6
    cfg = VoxelNetConfig()
    trainer = Trainer(model_cfg=cfg, train_cfg=TrainConfig())
    model = AdversarialVoxelNet(cfg=cfg)

    rng = np.random.RandomState(0)
    batch_np = synthetic_kitti_batch(rng, batch_size=B, num_points=20000, max_gt=20)
    batch = PointCloudBatch(*(jnp.asarray(x) for x in batch_np))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    params, stats = state.params, state.batch_stats
    print(f"device: {jax.devices()[0]}, B={B}")

    vz = cfg.voxelizer

    # --- voxelize + batch merge
    def vox(c, pts, mask):
        res = voxelize_batch(pts[..., :4] + c * 1e-30, mask, vz)
        grid, order = sparse.with_batch_axis(res.coords, res.voxel_mask, vz.sparse_shape)
        return c + jnp.sum(res.voxels[0, 0, 0]) + grid.flat_ids[0].astype(jnp.float32)

    timed("voxelize + batch-merge", vox, batch.points, batch.points_mask)

    # precompute encoder inputs
    res = voxelize_batch(batch.points[..., :4], batch.points_mask, vz)
    grid, order = sparse.with_batch_axis(res.coords, res.voxel_mask, vz.sparse_shape)
    from robustpointclouds_tpu.nn import HardSimpleVFE

    feats = HardSimpleVFE(res.voxels, res.point_mask)
    feats = feats.reshape(-1, feats.shape[-1])[order]
    n_active = int(jnp.sum(grid.mask))
    print(f"active voxels: {n_active} / {feats.shape[0]}")

    from robustpointclouds_tpu.nn import SparseEncoder

    # match the model's compute dtype (bf16 default) — an f32 encoder here
    # once misattributed ~150 ms/step (profile vs fused-step mismatch)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    enc = SparseEncoder(sparse_shape=vz.sparse_shape, dtype=dt)
    enc_vars = {
        "params": params["middle_encoder"],
        "batch_stats": stats["middle_encoder"],
    }

    def enc_fwd(c, f):
        out = enc.apply(enc_vars, f + c * 1e-30, grid, False)
        return c + jnp.mean(out)

    timed("middle encoder fwd (eval)", enc_fwd, feats)

    def enc_fwdbwd(c, f):
        def loss(f_):
            out, _ = enc.apply(
                enc_vars, f_, grid, True, mutable=["batch_stats"]
            )
            return jnp.mean(out * out)

        v, g = jax.value_and_grad(loss)(f + c * 1e-30)
        return c + v + jnp.mean(g)

    timed("middle encoder fwd+bwd (train)", enc_fwdbwd, feats)

    # index builds alone
    def idx_build(c, ids):
        g2 = sparse.SparseGrid(
            ids + (c * 0).astype(jnp.int32), grid.coords, grid.mask, grid.spatial_shape
        )
        idx = sparse.neighbor_index(
            g2, g2.coords, g2.mask, (1, 3, 3, 3), (1, 1, 1, 1), (0, 1, 1, 1)
        )
        return c + idx[0, 0].astype(jnp.float32)

    timed("subm neighbor-index build (1 grid)", idx_build, grid.flat_ids)

    def down_build(c, ids):
        g2 = sparse.SparseGrid(
            ids + (c * 0).astype(jnp.int32), grid.coords, grid.mask, grid.spatial_shape
        )
        k4, s4, p4 = (1, 3, 3, 3), (1, 2, 2, 2), (0, 1, 1, 1)
        ng = sparse.downsample_sites(g2, k4, s4, p4, out_cap=feats.shape[0])
        di = sparse.neighbor_index(g2, ng.coords, ng.mask, k4, s4, p4)
        inv = sparse.inverse_neighbor_index(
            g2, ng, sparse.kernel_offsets(k4), s4, p4
        )
        return c + di[0, 0].astype(jnp.float32) + inv[0, 0].astype(jnp.float32)

    timed("downsample sites+idx+inv (1 stage)", down_build, grid.flat_ids)

    # backbone + neck + head
    from robustpointclouds_tpu.nn import Anchor3DHead, SECONDBackbone, SECONDFPN

    bev = enc.apply(enc_vars, feats, grid, False)

    bb, nk = SECONDBackbone(), SECONDFPN()
    hd = Anchor3DHead(
        num_classes=cfg.num_classes,
        num_anchors_per_loc=len(cfg.anchor_sizes) * len(cfg.anchor_rotations),
    )
    bb_vars = {"params": params["backbone"], "batch_stats": stats["backbone"]}
    nk_vars = {"params": params["neck"], "batch_stats": stats["neck"]}
    hd_vars = {"params": params["bbox_head"]}

    def head_fwdbwd(c, x):
        def loss(x_):
            outs, _ = bb.apply(bb_vars, x_, True, mutable=["batch_stats"])
            fused, _ = nk.apply(nk_vars, outs, True, mutable=["batch_stats"])
            cls, box, d = hd.apply(hd_vars, fused)
            return jnp.mean(cls * cls) + jnp.mean(box * box) + jnp.mean(d * d)

        v, g = jax.value_and_grad(loss)(x + c * 1e-30)
        return c + v + jnp.mean(g)

    timed("backbone+fpn+head fwd+bwd", head_fwdbwd, bev)

    # anchor targets + losses (fwd only; it has no params, bwd flows to preds)
    outs_full = model.apply(
        {"params": params, "batch_stats": stats},
        batch.points, batch.points_mask, False, 0, False,
    )

    def tgt(c, cls_s, box_p, dir_p):
        def loss(t3):
            cs, bp, dp = t3
            det = anchor_head_loss(
                cs, bp, dp, trainer.anchors, trainer.anchor_cls,
                batch.gt_boxes, batch.gt_labels, batch.gt_mask, cfg.head,
            )
            return det["loss_cls"] + det["loss_bbox"] + det["loss_dir"]

        v, g = jax.value_and_grad(loss)((cls_s + c * 1e-30, box_p, dir_p))
        return c + v + jnp.mean(g[0])

    timed(
        "anchor targets+losses fwd+bwd",
        tgt,
        outs_full.cls_scores,
        outs_full.bbox_preds,
        outs_full.dir_preds,
    )

    # full train step
    def full(c, pts):
        b2 = batch._replace(points=pts + c * 1e-30)
        new_state, logs = trainer._step_impl(state, b2, jnp.float32(5))
        return c + logs["loss"]

    timed("FULL fused train step", full, batch.points)


if __name__ == "__main__":
    main()
