"""Backbone/FPN/head/targets fine breakdown + deconv-as-depth-to-space A/B.

Round-2 measured backbone+FPN+head at 39 ms and targets+losses at 27 ms of
the 361 ms step — the largest non-encoder items. This bench splits them
(one process, fori_loop timing with a threaded carry, per the measurement
rules) and A/Bs the FPN's stride-2 ConvTranspose against the numerically
identical 1x1-matmul + depth-to-space form (a 2x2/s2 deconv has no overlap:
out[2i+di, 2j+dj] = x[i,j] @ K[di,dj] — pure reshape of the same weights).

Run: python -m robustpointclouds_tpu.tools.bench_backbone
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8


def timed(name, fn, *args):
    def looped(seed, *a):
        def body(_, c):
            return fn(c, *a)

        return jax.lax.fori_loop(0, ITERS, body, seed)

    f = jax.jit(looped)
    out = f(jnp.float32(0.0), *args)
    out.block_until_ready()
    t0 = time.time()
    out = f(jnp.float32(1e-9), *args)
    out.block_until_ready()
    dt = (time.time() - t0) / ITERS
    print(f"{name:52s} {dt*1e3:9.2f} ms/iter", flush=True)
    return dt


def main():
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from robustpointclouds_tpu.data import synthetic_kitti_batch
    from robustpointclouds_tpu.data.structures import PointCloudBatch
    from robustpointclouds_tpu.models import VoxelNetConfig
    from robustpointclouds_tpu.models.detection import anchor_head_loss, anchor_head_targets
    from robustpointclouds_tpu.nn import Anchor3DHead, SECONDBackbone, SECONDFPN
    from robustpointclouds_tpu.train import TrainConfig, Trainer

    cfg = VoxelNetConfig()
    trainer = Trainer(model_cfg=cfg, train_cfg=TrainConfig())
    rng = np.random.RandomState(0)
    b = synthetic_kitti_batch(rng, batch_size=6, num_points=20000, max_gt=20)
    batch = PointCloudBatch(*(jnp.asarray(x) for x in b))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    params, stats = state.params, state.batch_stats
    print(f"device: {jax.devices()[0]}", flush=True)

    dt = jnp.bfloat16
    bb, nk = SECONDBackbone(dtype=dt), SECONDFPN(dtype=dt)
    hd = Anchor3DHead(
        num_classes=cfg.num_classes,
        num_anchors_per_loc=len(cfg.anchor_sizes) * len(cfg.anchor_rotations),
    )
    bb_vars = {"params": params["backbone"], "batch_stats": stats["backbone"]}
    nk_vars = {"params": params["neck"], "batch_stats": stats["neck"]}
    hd_vars = {"params": params["bbox_head"]}

    H, W, C = 200, 176, 256
    key = jax.random.PRNGKey(1)
    bev = jax.random.normal(key, (6, H, W, C), jnp.float32)

    def bb_only(c, x):
        def loss(x_):
            outs, _ = bb.apply(bb_vars, x_, True, mutable=["batch_stats"])
            return sum(jnp.mean((o * o).astype(jnp.float32)) for o in outs)

        v, g = jax.value_and_grad(loss)(x + c * 1e-30)
        return c + v + jnp.mean(g)

    timed("backbone fwd+bwd", bb_only, bev)

    outs0, _ = bb.apply(bb_vars, bev, True, mutable=["batch_stats"])
    outs0 = tuple(jax.lax.stop_gradient(o) for o in outs0)

    def nk_only(c, o0, o1):
        def loss(t):
            fused, _ = nk.apply(nk_vars, t, True, mutable=["batch_stats"])
            return jnp.mean((fused * fused).astype(jnp.float32))

        v, g = jax.value_and_grad(loss)((o0 + c * 1e-30, o1))
        return c + v + jnp.mean(g[0])

    timed("FPN (deconv) fwd+bwd", nk_only, *outs0)

    # depth-to-space form of the stride-2 deconv leg, same weights
    dk = params["neck"]["deblock1_deconv"]["kernel"]  # [2, 2, in, out]
    kh, kw, cin, cout = dk.shape

    def d2s(x, k):
        w = k.reshape(kh * kw * cin, cout)  # contraction laid out (di,dj,c)
        # x [B,h,w,cin] @ K[di,dj,cin,out] -> [B,h,w,di,dj,out] -> interleave
        y = jnp.einsum(
            "bhwc,ijco->bhiwjo", x.astype(dt), dk.astype(dt),
            preferred_element_type=jnp.float32,
        )
        B, h, _, _, _, _ = y.shape
        return y.reshape(B, h * kh, x.shape[2] * kw, cout)

    def nk_d2s(c, o0, o1):
        def loss(t):
            a, b_ = t
            up = d2s(b_, dk)
            fused = jnp.concatenate([a.astype(dt), up.astype(dt)], axis=-1)
            return jnp.mean((fused * fused).astype(jnp.float32))

        v, g = jax.value_and_grad(loss)((o0 + c * 1e-30, o1))
        return c + v + jnp.mean(g[0])

    timed("FPN (depth-to-space) fwd+bwd*", nk_d2s, *outs0)

    fused0, _ = nk.apply(nk_vars, outs0, True, mutable=["batch_stats"])
    fused0 = jax.lax.stop_gradient(fused0)

    def hd_only(c, x):
        def loss(x_):
            cls, box, d = hd.apply(hd_vars, x_)
            return (
                jnp.mean((cls * cls).astype(jnp.float32))
                + jnp.mean((box * box).astype(jnp.float32))
                + jnp.mean((d * d).astype(jnp.float32))
            )

        v, g = jax.value_and_grad(loss)(x + c * 1e-30)
        return c + v + jnp.mean(g)

    timed("head convs fwd+bwd", hd_only, fused0)

    # targets assignment alone (no grad: pure target computation)
    def assign_only(c, gtb):
        tgt = jax.vmap(
            lambda gb, gl, gm: anchor_head_targets(
                trainer.anchors, trainer.anchor_cls, gb, gl, gm, cfg.head
            )
        )(gtb + c * 1e-30, batch.gt_labels, batch.gt_mask)
        return c + jnp.mean(tgt[0].astype(jnp.float32))

    try:
        timed("anchor target assignment alone", assign_only, batch.gt_boxes)
    except Exception as e:
        print("assign_only failed:", type(e).__name__, str(e)[:200], flush=True)

    outs_full = trainer.model.apply(
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


if __name__ == "__main__":
    main()
