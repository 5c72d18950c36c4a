"""Checkpoint save/restore via orbax (params + both optimizer states + step).

Replaces the reference's mmengine CheckpointHook plumbing (interval/max_keep
per config, `--resume auto` in train.py:36-43, :109-115) with orbax's
CheckpointManager. The reference's stale-checkpoint backup dance
(train_kitti_3class_adversarial.py:116-170) is unnecessary here — the state
schema is explicit and versioned by orbax.
"""
from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from .loop import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 10,
                 save_interval_epochs: int = 5,
                 single_process_io: bool = False):
        """`single_process_io`: in a multi-host run, saves are host-numpy
        trees written by process 0 alone (the training loop gates the calls);
        restrict orbax's barrier group to process 0 so the save does not
        block on peers that never call it (rank-0 CheckpointHook semantics).
        """
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        opts = dict(
            max_to_keep=max_to_keep, create=True,
            enable_async_checkpointing=False,
        )
        if single_process_io:
            import jax

            opts["multiprocessing_options"] = ocp.options.MultiprocessingOptions(
                primary_host=jax.process_index(),
                active_processes={jax.process_index()},
            )
            # orbax refuses create=True with active_processes set; the
            # makedirs above already created the root
            opts["create"] = False
        self._mgr = ocp.CheckpointManager(
            self.directory, options=ocp.CheckpointManagerOptions(**opts)
        )
        self.save_interval_epochs = save_interval_epochs

    def save(self, epoch: int, state: TrainState) -> None:
        self._mgr.save(epoch, args=ocp.args.StandardSave(state._asdict()))
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState, epoch: Optional[int] = None) -> TrainState:
        """Restore into the shape/dtype structure of `state_template`."""
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template._asdict())
        )
        return TrainState(**restored)

    def maybe_save(self, epoch: int, state: TrainState) -> bool:
        if (epoch + 1) % self.save_interval_epochs == 0:
            self.save(epoch, state)
            return True
        return False

    # -- best-metric checkpoint (reference CheckpointHook save_best,
    #    adversarial-centerpoint_voxel-nuscenes.py:98) -------------------
    def save_best(self, metric_value: float, state: TrainState, epoch: int) -> bool:
        """Keep the single best-metric checkpoint under <dir>/best.

        Returns True when this value beat the stored best (higher is better,
        matching the reference's mAP key)."""
        import json

        best_file = os.path.join(self.directory, "best_metric.json")
        prev = None
        if os.path.isfile(best_file):
            with open(best_file) as f:
                prev = json.load(f)
        if prev is not None and metric_value <= prev.get("value", -float("inf")):
            return False
        best_dir = os.path.join(self.directory, "best")
        ckpt = ocp.StandardCheckpointer()
        import shutil

        if os.path.isdir(best_dir):
            shutil.rmtree(best_dir)
        ckpt.save(best_dir, state._asdict())
        ckpt.wait_until_finished()
        with open(best_file, "w") as f:
            json.dump({"value": float(metric_value), "epoch": int(epoch)}, f)
        return True

    def restore_best(self, state_template: TrainState) -> TrainState:
        best_dir = os.path.join(self.directory, "best")
        if not os.path.isdir(best_dir):
            raise FileNotFoundError(f"no best checkpoint under {self.directory}")
        ckpt = ocp.StandardCheckpointer()
        restored = ckpt.restore(best_dir, state_template._asdict())
        return TrainState(**restored)


def load_pretrained(state: TrainState, path: str) -> TrainState:
    """Warm start: overlay params + batch_stats from a pretrained checkpoint.

    The reference always warm-starts from zoo checkpoints (`load_from=...`,
    configs/adversarial/adversarial-second_hv_secfpn_8xb6-80e_kitti-3d-3class.py:167,
    adversarial-centerpoint_voxel-nuscenes.py:88). Accepts either

      * a torch `.pth` file — converted on the fly through
        tools/convert_torch_checkpoint (spconv/conv/deconv/BN layout mapping);
        dropping any middle_encoder/backbone/neck tensor is a hard error;
      * a directory — an orbax checkpoint previously written by this
        framework or by the converter CLI; only params/batch_stats are taken
        (optimizer state and counters start fresh).

    Returns a new TrainState; never touches the adversary's fresh init unless
    the checkpoint carries adversary weights.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    if path.endswith(".pth"):
        from ..tools.convert_torch_checkpoint import (
            convert_centerpoint_state_dict,
            convert_pointpillars_state_dict,
            convert_second_state_dict,
            detect_state_dict_layout,
            load_torch_checkpoint,
            merge_into_params,
        )

        sd = load_torch_checkpoint(path)
        layout = detect_state_dict_layout(sd)
        convert, strict = {
            # strict = the detector trunk; head tensors may legitimately skip
            # (plain-conv vs DCN CenterHead variants), adversary always does
            "centerpoint": (convert_centerpoint_state_dict,
                            ("pts_middle_encoder", "pts_backbone", "pts_neck")),
            "pointpillars": (convert_pointpillars_state_dict,
                             ("pfn", "backbone", "neck")),
            "second": (convert_second_state_dict,
                       ("middle_encoder", "backbone", "neck")),
        }[layout]
        cp, cs = convert(sd)
        new_p, loaded_p, skipped_p = merge_into_params(
            jax.tree_util.tree_map(np.asarray, state.params), cp,
            strict_prefixes=strict,
        )
        new_s, loaded_s, skipped_s = merge_into_params(
            jax.tree_util.tree_map(np.asarray, state.batch_stats), cs,
            strict_prefixes=strict,
        )
        if not loaded_p:
            raise ValueError(
                f"warm start from {path} (detected layout: {layout}) loaded "
                "ZERO parameter tensors — the checkpoint family does not "
                "match this model's architecture"
            )
        print(f"[load-from] {path} ({layout}): "
              f"loaded {len(loaded_p) + len(loaded_s)} tensors, "
              f"skipped {len(skipped_p) + len(skipped_s)}")
        return state._replace(
            params=jax.tree_util.tree_map(jnp.asarray, new_p),
            batch_stats=jax.tree_util.tree_map(jnp.asarray, new_s),
        )
    mgr = CheckpointManager(path)
    restored = mgr.restore(state)
    print(f"[load-from] restored params from orbax checkpoint {path} "
          f"(epoch {mgr.latest_epoch()})")
    return state._replace(params=restored.params, batch_stats=restored.batch_stats)
