"""Data-parallel mesh tests on the 8 virtual CPU devices (conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.data.structures import PointCloudBatch
from robustpointclouds_tpu.parallel import make_mesh, replicate, shard_batch
from robustpointclouds_tpu.train import TrainConfig, Trainer

from test_model import tiny_batch, tiny_cfg


def as_jnp(b):
    return PointCloudBatch(*(jnp.asarray(x) for x in b))


@pytest.fixture(scope="module")
def trainer():
    return Trainer(
        model_cfg=tiny_cfg(),
        train_cfg=TrainConfig(warmup_iters=5, max_epochs=1, steps_per_epoch=4),
    ).compile(donate=False)


def test_eight_devices_present():
    assert len(jax.devices()) >= 8


def test_sharded_step_runs_and_matches_single(trainer):
    mesh = make_mesh(jax.devices()[:8])
    batch = as_jnp(tiny_batch(np.random.RandomState(0), B=8))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    # unsharded step
    s1, logs1 = trainer.train_step(state, batch, epoch=5)

    with mesh:
        state_r = replicate(state, mesh)
        batch_s = shard_batch(batch, mesh)
        s2, logs2 = trainer.train_step(state_r, batch_s, epoch=5)

    # same math, different partitioning: losses agree to fp tolerance
    assert float(logs1["loss"]) == pytest.approx(float(logs2["loss"]), rel=2e-3)
    p1 = np.asarray(s1.params["middle_encoder"]["conv_input"]["kernel"])
    p2 = np.asarray(s2.params["middle_encoder"]["conv_input"]["kernel"])
    np.testing.assert_allclose(p1, p2, rtol=2e-3, atol=2e-5)


def test_batch_actually_sharded(trainer):
    mesh = make_mesh(jax.devices()[:8])
    batch = as_jnp(tiny_batch(np.random.RandomState(0), B=8))
    with mesh:
        sharded = shard_batch(batch, mesh)
    shards = sharded.points.sharding.device_set
    assert len(shards) == 8


def test_sharded_plan_step_matches_single(trainer):
    """Plan-fed step under the mesh (batch sharded, plan replicated) agrees
    with the unsharded plan-fed step — the production configuration."""
    mesh = make_mesh(jax.devices()[:8])
    batch = as_jnp(tiny_batch(np.random.RandomState(3), B=8))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    plan = trainer.make_plan_builder()(
        np.asarray(batch.points), np.asarray(batch.points_mask),
        np.asarray(batch.gt_boxes), np.asarray(batch.gt_labels),
        np.asarray(batch.gt_mask),
    )

    s1, logs1 = trainer.train_step(state, batch, epoch=5, plan=plan)

    with mesh:
        state_r = replicate(state, mesh)
        batch_s = shard_batch(batch, mesh)
        plan_r = replicate(plan, mesh)
        s2, logs2 = trainer.train_step(state_r, batch_s, epoch=5, plan=plan_r)

    # bf16 model + partition-dependent reduction orders: ~0.2% loss drift
    # with the f32 adversary, ~0.8% with the round-5 bf16-default adversary
    # MLP (its masked BN statistics shift with partition order at bf16
    # precision); plan-vs-inline exactness is pinned bitwise in test_plan.py
    assert float(logs1["loss"]) == pytest.approx(float(logs2["loss"]), rel=1.5e-2)
    p1 = np.asarray(s1.params["middle_encoder"]["conv_input"]["kernel"])
    p2 = np.asarray(s2.params["middle_encoder"]["conv_input"]["kernel"])
    np.testing.assert_allclose(p1, p2, rtol=1.5e-2, atol=2e-4)


def _build_device_plans(trainer_, batch, n):
    pb = trainer_.make_plan_builder()
    pts, msk = np.asarray(batch.points), np.asarray(batch.points_mask)
    gb, gl = np.asarray(batch.gt_boxes), np.asarray(batch.gt_labels)
    gm = np.asarray(batch.gt_mask)
    k = pts.shape[0] // n
    return [
        pb(pts[i * k:(i + 1) * k], msk[i * k:(i + 1) * k],
           gb[i * k:(i + 1) * k], gl[i * k:(i + 1) * k], gm[i * k:(i + 1) * k])
        for i in range(n)
    ]


def test_ddp_sharded_plan_step_partitions_flops():
    """The round-3 scaling defect test: the DDP shard_map step with per-device
    sub-plans must genuinely partition the work — per-device compiled FLOPs
    ~1/8 of the single-device module at the same global batch (replicated
    compute would put the ratio near 1) — and track the global step's params.
    """
    from robustpointclouds_tpu.parallel import shard_stacked, stack_plans

    batch = as_jnp(tiny_batch(np.random.RandomState(0), B=8))
    tr1 = Trainer(model_cfg=tiny_cfg(), train_cfg=TrainConfig(warmup_iters=5))
    tr1.compile(donate=False)
    state = tr1.init_state(jax.random.PRNGKey(0), batch)
    plan_g = tr1.make_plan_builder()(
        np.asarray(batch.points), np.asarray(batch.points_mask),
        np.asarray(batch.gt_boxes), np.asarray(batch.gt_labels),
        np.asarray(batch.gt_mask),
    )
    s1, logs1 = tr1.train_step(state, batch, epoch=5, plan=plan_g)

    n = 8
    tr2 = Trainer(model_cfg=tiny_cfg(), train_cfg=TrainConfig(warmup_iters=5))
    mesh = make_mesh(jax.devices()[:n])
    plans = _build_device_plans(tr2, batch, n)
    with mesh:
        state_r = replicate(state, mesh)
        batch_s = shard_batch(batch, mesh)
        plan_s = shard_stacked(stack_plans(plans), mesh)
        tr2.compile_sharded(mesh, donate=False)
        s2, logs2 = tr2.train_step(state_r, batch_s, epoch=5, plan=plan_s)

        cost = tr2._train_step.lower(
            state_r, batch_s, jnp.float32(5), plan_s
        ).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops_dev = float(cost.get("flops", 0.0))
    cost1 = tr1._train_step.lower(
        state, batch, jnp.float32(5),
        jax.device_put(plan_g, jax.devices()[0]),
    ).compile().cost_analysis()
    cost1 = cost1[0] if isinstance(cost1, (list, tuple)) else cost1
    flops_single = float(cost1.get("flops", 0.0))

    assert np.isfinite(float(logs2["loss"]))
    assert flops_single > 0 and flops_dev > 0
    assert flops_dev / flops_single < 2.0 / n, (
        f"per-device FLOPs not partitioned: ratio {flops_dev / flops_single:.3f}"
    )
    # DDP (per-device BN batches + per-device loss normalizers, the reference
    # DistributedDataParallel semantic) vs the global-view step: raw losses
    # drift, but Adam+clip updates land within tolerance of the global update
    p1 = np.asarray(s1.params["middle_encoder"]["conv_input"]["kernel"])
    p2 = np.asarray(s2.params["middle_encoder"]["conv_input"]["kernel"])
    np.testing.assert_allclose(p1, p2, atol=1e-3)


def test_ddp_one_device_mesh_matches_single_bitwise():
    """A 1-device 'mesh' DDP step is the single-device plan-fed step with
    pmean over one device — must be numerically identical (the semantic
    anchor for the n>1 DDP path)."""
    from robustpointclouds_tpu.parallel import shard_stacked, stack_plans

    batch = as_jnp(tiny_batch(np.random.RandomState(1), B=2))
    tr1 = Trainer(model_cfg=tiny_cfg(), train_cfg=TrainConfig(warmup_iters=5))
    tr1.compile(donate=False)
    state = tr1.init_state(jax.random.PRNGKey(0), batch)
    plan = tr1.make_plan_builder()(
        np.asarray(batch.points), np.asarray(batch.points_mask),
        np.asarray(batch.gt_boxes), np.asarray(batch.gt_labels),
        np.asarray(batch.gt_mask),
    )
    s1, logs1 = tr1.train_step(state, batch, epoch=5, plan=plan)

    tr2 = Trainer(model_cfg=tiny_cfg(), train_cfg=TrainConfig(warmup_iters=5))
    mesh = make_mesh(jax.devices()[:1])
    with mesh:
        state_r = replicate(state, mesh)
        batch_s = shard_batch(batch, mesh)
        plan_s = shard_stacked(stack_plans([plan]), mesh)
        tr2.compile_sharded(mesh, donate=False)
        s2, logs2 = tr2.train_step(state_r, batch_s, epoch=5, plan=plan_s)

    assert float(logs1["loss"]) == pytest.approx(float(logs2["loss"]), rel=1e-6)
    p1 = np.asarray(s1.params["middle_encoder"]["conv_input"]["kernel"])
    p2 = np.asarray(s2.params["middle_encoder"]["conv_input"]["kernel"])
    np.testing.assert_allclose(p1, p2, rtol=1e-6, atol=1e-7)


def test_ddp_inline_step_no_plan_runs():
    """compile_sharded with plan=None: each device traces the inline index
    build on its local sub-batch — the sharded fallback when no loader plan
    is available."""
    batch = as_jnp(tiny_batch(np.random.RandomState(2), B=8))
    tr = Trainer(model_cfg=tiny_cfg(), train_cfg=TrainConfig(warmup_iters=5))
    mesh = make_mesh(jax.devices()[:8])
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    with mesh:
        state_r = replicate(state, mesh)
        batch_s = shard_batch(batch, mesh)
        tr.compile_sharded(mesh, donate=False)
        s2, logs2 = tr.train_step(state_r, batch_s, epoch=5)
    assert np.isfinite(float(logs2["loss"]))
    assert int(s2.step) == 1
