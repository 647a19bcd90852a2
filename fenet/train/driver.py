"""End-to-end per-category training driver: the train.py / finetune.py
equivalent (train.py:31-243, finetune.py:30-200) wired from fenet components.
"""

from __future__ import annotations

import os
import random
import time
from datetime import datetime
from typing import Dict, Optional

import jax
import numpy as np

from fenet.data.loader import DataLoader
from fenet.data.shapenet import ShapeNetDataset, load_split
from fenet.eval.metrics import Metrics
from fenet.eval.runner import evaluate_dataset
from fenet.models.generator import Generator
from fenet.train.checkpoint import (
    fetch_arrays,
    load_checkpoint,
    save_checkpoint,
)
from fenet.train.config import TrainConfig
from fenet.train.trainer import Trainer
from fenet.utils.logger import get_logger


class MetricWriter:
    """Scalar logger: tensorboardX when available, else JSONL fallback."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        else:
            import json

            self._jsonl.write(
                json.dumps({"tag": tag, "value": value, "step": step}) + "\n"
            )
            # Per-write flush: a crash must not lose the scalar history the
            # checkpoint cannot reconstruct (tiny writes, negligible cost).
            self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        else:
            self._jsonl.close()


def _build_datasets(cfg: TrainConfig, category):
    train_models = load_split(cfg.splits_path, "train_models.json")
    val_models = load_split(cfg.splits_path, "val_models.json")
    cats = [category] if isinstance(category, str) else list(category)
    train_ds = ShapeNetDataset(
        cfg.data_dir_imgs, cfg.data_dir_pcl, train_models, cats,
        cfg.num_points, variety=True, image_dtype="uint8",
    )
    val_ds = ShapeNetDataset(
        cfg.data_dir_imgs, cfg.data_dir_pcl, val_models, cats,
        cfg.num_points, image_dtype="uint8",
    )
    return train_ds, val_ds


def train_net(
    category,
    cfg: TrainConfig,
    train_ds=None,
    val_ds=None,
    loss_mode: str = "schedule",
    model: Optional[Generator] = None,
) -> Dict:
    """Train one category end to end. Returns {'state', 'history', 'ckpt_dir'}."""
    cat = category if isinstance(category, str) else "".join(category)
    if cfg.manual_seed is None:
        cfg.manual_seed = random.randint(1, 10000)  # train.py:59
    if jax.process_count() > 1:
        # All processes must init identical params/shuffles: take process
        # 0's seed everywhere (a per-process random seed would diverge the
        # replicas at init).
        from jax.experimental import multihost_utils

        cfg.manual_seed = int(
            multihost_utils.broadcast_one_to_all(
                np.asarray(cfg.manual_seed, np.int32)
            )
        )
    np.random.seed(cfg.manual_seed)

    if train_ds is None or val_ds is None:
        train_ds, val_ds = _build_datasets(cfg, category)
    # Multi-host: each process loads its own slice of every global batch
    # (same global semantics — the mesh step assembles the slices); only
    # process 0 owns filesystem side effects.
    n_proc = jax.process_count()
    primary = jax.process_index() == 0
    batch_size = cfg.batch_size
    mesh = None
    if n_proc > 1:
        from fenet.parallel.distributed import (
            ProcessShardDataset,
            batch_process_groups,
            local_batch_size,
        )

        tp = max(cfg.model_parallel, 1)
        # The mesh must span every process (each train step is a
        # cross-host collective); the single-process default would
        # build a host-0-only mesh and strand the workers.
        if jax.device_count() % tp:
            raise ValueError(
                f"--model_parallel {tp} does not divide the "
                f"{jax.device_count()} devices of this cluster"
            )
        if cfg.data_parallel == 1:
            cfg.data_parallel = jax.device_count() // tp
        elif cfg.data_parallel * tp != jax.device_count():
            raise ValueError(
                f"multi-host training needs the mesh to cover all "
                f"{jax.device_count()} devices across {n_proc} processes; "
                f"got dp x tp = {cfg.data_parallel} x {tp} (leave "
                "--data_parallel at 1 to auto-size)"
            )
        if tp > 1:
            from fenet.parallel.tp import make_dp_tp_mesh

            mesh = make_dp_tp_mesh(cfg.data_parallel, tp)
        else:
            from fenet.parallel.mesh import make_mesh

            mesh = make_mesh(cfg.data_parallel)
        # Tensor-parallel peer processes hold the SAME batch rows and must
        # feed identical local batches, so datasets shard per batch GROUP
        # (== per process on a dp-only mesh).
        grp, n_grp = batch_process_groups(mesh)
        batch_size = local_batch_size(cfg.batch_size, n_grp)
        train_ds = ProcessShardDataset(train_ds, process_index=grp,
                                       process_count=n_grp)
        if len(val_ds):
            val_ds = ProcessShardDataset(val_ds, process_index=grp,
                                         process_count=n_grp)
    train_loader = DataLoader(
        train_ds, batch_size, shuffle=True, drop_last=True,
        seed=cfg.manual_seed,
    )
    val_loader = DataLoader(val_ds, min(batch_size, max(len(val_ds), 1)),
                            shuffle=False, drop_last=False)

    output_dir = os.path.join(cfg.dir_path, cat)
    ckpt_dir = os.path.join(output_dir, "checkpoints")
    log_dir = os.path.join(output_dir, "logs", datetime.now().isoformat())
    if primary:
        os.makedirs(ckpt_dir, exist_ok=True)
        logger = get_logger(os.path.join(ckpt_dir, "logging.log"))
        train_writer = MetricWriter(os.path.join(log_dir, "train"))
    else:  # workers: silent except warnings (handler-less logger), no
        # checkpoint/log/scalar files — per-batch progress is identical
        # across replicas, so process 0's stream tells the whole story.
        import logging

        logger = logging.getLogger(f"fenet.worker{jax.process_index()}")
        train_writer = None

    gen = model or Generator(
        num_points=cfg.num_points, backbone=cfg.backbone,
        fine_width=cfg.fine_width, mid_width=cfg.mid_width,
    )
    trainer = Trainer(gen, cfg, mesh=mesh, loss_mode=loss_mode)
    sample = np.zeros((1, 128, 128, 3), np.float32)
    state = trainer.init_state(jax.random.PRNGKey(cfg.manual_seed), sample)

    if cfg.pretrained_backbone:
        from fenet.models.convert import load_torch_checkpoint, merge_variables

        backbone = load_torch_checkpoint(
            cfg.pretrained_backbone, prefix_map={"": "RepVGG."}
        )
        state = state.replace(
            params=merge_variables(state.params, backbone["params"]),
            batch_stats=merge_variables(
                state.batch_stats, backbone["batch_stats"]
            ),
        )

    best_chamfer: Optional[Metrics] = None
    best_emd: Optional[Metrics] = None
    all_epoch_time = 0.0
    start_epoch = cfg.start_epoch
    if cfg.resume:
        suffix = ".orbax" if cfg.ckpt_format == "orbax" else ".ckpt"
        path = os.path.join(ckpt_dir, f"model_best{suffix}")
        fallback = None
        if not n_proc > 1 or primary:
            # Newest --train_save_freq periodic checkpoint (the checkpoint
            # dir may be host-local, so only the loading process looks).
            from fenet.train.checkpoint import latest_checkpoint

            fallback = latest_checkpoint(ckpt_dir, cat, suffix)

        def _load_newest(target):
            """Resume from the HIGHEST-epoch checkpoint: a periodic save
            from after the last validate epoch (its epoch is in the
            filename; model_best's is only in the blob) must win over an
            older model_best, or a crash between validates silently redoes
            up to train_save_freq epochs. Periodic blobs carry the
            running-best metadata, so best-copy semantics survive."""
            import re as _re

            blob = (load_checkpoint(path, target=target)
                    if os.path.exists(path) else None)
            if fallback is not None:
                per_epoch = int(
                    _re.search(r"_checkpoint_(\d+)", fallback).group(1)
                )
                if blob is None or per_epoch > int(blob.get("epoch", 0)):
                    logger.info(
                        "resume: periodic checkpoint %s (epoch %d) is "
                        "newest", fallback, per_epoch,
                    )
                    blob = load_checkpoint(fallback, target=target)
            if blob is None:
                raise FileNotFoundError(
                    f"--resume: no checkpoint under {ckpt_dir}"
                )
            return blob

        target = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        if n_proc > 1:
            # Only process 0 writes checkpoints, and dir_path may be
            # host-local — load there and broadcast, so resume works
            # without a shared filesystem.
            from jax.experimental import multihost_utils

            if primary:
                # Probe before entering the collective: raising here while
                # the workers sit in broadcast_one_to_all would turn a clean
                # error into a cluster hang (collective watchdog). ANY load
                # failure counts — a truncated/corrupt checkpoint raises
                # from the msgpack/orbax layer, not FileNotFoundError.
                try:
                    blob = _load_newest(target)
                    found = 1
                except Exception as e:
                    logger.error("resume: loading %s failed: %r", path, e)
                    blob, found = target, 0
                def _f(key):  # missing/None best-loss -> NaN sentinel
                    v = blob.get(key)
                    return float(v) if v is not None else np.nan

                meta = np.asarray(
                    [float(blob.get("epoch", 0)),
                     float(blob.get("train_time", 0.0)),
                     _f("best_chamfer_loss"), _f("best_emd_loss")],
                    np.float32,
                )
            else:
                # Host-side zero placeholders: broadcast_one_to_all builds
                # np.zeros_like of every non-primary leaf, which raises on
                # the TP-sharded (non-addressable) live state arrays.
                blob = jax.tree_util.tree_map(
                    lambda x: np.zeros(x.shape, x.dtype), target
                )
                found = 1  # overwritten by the broadcast below
                meta = np.zeros(4, np.float32)
            found = int(
                multihost_utils.broadcast_one_to_all(
                    np.asarray(found, np.int32)
                )
            )
            if not found:
                raise FileNotFoundError(
                    f"--resume: checkpoint missing or unloadable on "
                    f"process 0: {path} (see process 0's log)"
                )
            arrays = multihost_utils.broadcast_one_to_all(
                {k: blob[k] for k in ("params", "batch_stats", "opt_state")}
            )
            meta = multihost_utils.broadcast_one_to_all(meta)
            blob = {**arrays, "epoch": int(meta[0]),
                    "train_time": float(meta[1]),
                    "best_chamfer_loss": float(meta[2]),
                    "best_emd_loss": float(meta[3])}
        else:
            blob = _load_newest(target)
        state = state.replace(
            params=blob["params"], batch_stats=blob["batch_stats"],
            opt_state=blob["opt_state"],
        )
        from fenet.parallel.tp import is_tp_mesh, shard_tree

        if is_tp_mesh(trainer.mesh):
            # The restored leaves are full host arrays; re-commit them to
            # the Megatron shardings (params AND Adam moments) so the
            # resumed state matches the jitted step's expectations.
            state = shard_tree(state, trainer.mesh)
        start_epoch = int(blob.get("epoch", 0))
        all_epoch_time = float(blob.get("train_time", 0.0))
        # Restore the running best (train.py:126-127): without this the
        # first post-resume validation always wins better_than(None) and
        # can overwrite model_best with strictly worse weights. Missing
        # keys (old periodic checkpoints) / NaN sentinels leave None.
        def _restore_best(key, name):
            v = blob.get(key)
            if v is None or not np.isfinite(float(v)):
                return None
            return Metrics(name, {name: float(v)})

        best_chamfer = _restore_best("best_chamfer_loss", "ChamferDistance")
        best_emd = _restore_best("best_emd_loss", "EMD_distance")

    def _best_vals():
        """Running-best scalars for checkpoint blobs (NaN = no validation
        yet). The reference stores the CURRENT validation under these keys
        (train.py:224-225) — harmless there because resume only ever reads
        model_best, which is by construction a best-epoch copy; here resume
        may fall back to periodic/non-best checkpoints, so the true running
        best is stored instead."""
        return {
            "best_chamfer_loss": (
                float(best_chamfer.state_dict()["ChamferDistance"])
                if best_chamfer is not None else float("nan")
            ),
            "best_emd_loss": (
                float(best_emd.state_dict()["EMD_distance"])
                if best_emd is not None else float("nan")
            ),
        }

    history = []
    for epoch in range(start_epoch + 1, cfg.nepoch + 1):
        t0 = time.time()
        state, epoch_stats = trainer.fit_epoch(
            state, train_loader, epoch, logger=logger,
            metric_writer=train_writer, category=cat,
        )
        epoch_time = time.time() - t0
        all_epoch_time += epoch_time
        if train_writer is not None:
            train_writer.add_scalar(
                "Loss/Epoch/chamfer_loss", epoch_stats["chamfer_loss"], epoch
            )
            train_writer.add_scalar(
                "Loss/Epoch/emd_loss", epoch_stats["emd_loss"], epoch
            )
        logger.info(
            "[[Category %s] Epoch %d/%d] EpochTime = %.3f (s) "
            "All_epoch_time = %.3f (s) Losses = %s",
            cat, epoch, cfg.nepoch, epoch_time, all_epoch_time,
            ["%.4f" % epoch_stats["chamfer_loss"],
             "%.4f" % epoch_stats["emd_loss"]],
        )
        history.append({"epoch": epoch, **epoch_stats})

        # --train_save_freq: periodic (non-best) checkpoint between the
        # validation epochs. The reference parses this flag but never reads
        # it (train.py:41 — dead there); here it is wired so long runs can
        # resume without waiting for the next validate epoch. 0 disables.
        if (
            cfg.train_save_freq > 0
            and epoch % cfg.train_save_freq == 0
            # Skip only when a validation actually runs this epoch (it
            # writes its own checkpoint); with no val split the validate
            # branch is dead and the periodic save must still fire.
            and not (epoch in tuple(cfg.validate_epochs) and len(val_ds))
        ):
            # fetch_arrays is a collective under multi-host TP: EVERY
            # process participates in the gather; only process 0 writes
            # (non-primary skips the device->host copies entirely).
            arrays = fetch_arrays({
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
            }, to_host=primary)
            if primary:
                save_checkpoint(
                    {
                        **arrays,
                        "epoch": epoch,
                        "model_name": ckpt_dir,
                        "train_time": all_epoch_time,
                        **_best_vals(),
                    },
                    False, cat, ckpt_dir, epoch, fmt=cfg.ckpt_format,
                )

        if epoch in tuple(cfg.validate_epochs) and len(val_ds):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            cd_m, emd_m, summary = evaluate_dataset(
                gen, variables, val_loader, category=cat, logger=logger,
                mesh=trainer.mesh,
                icp_iterations=cfg.eval_icp_iterations,
                icp_tolerance=cfg.eval_icp_tolerance,
                emd_iters=cfg.eval_emd_iters,
                emd_eps=cfg.eval_emd_eps,
            )
            is_best = cd_m.better_than(best_chamfer) and emd_m.better_than(
                best_emd
            )
            if is_best:
                best_chamfer, best_emd = cd_m, emd_m
            # Collective gather of host-sharded leaves (multi-host TP);
            # a pure-dp state reads straight off the local replica, and
            # non-primary processes skip the host copy altogether.
            ckpt_arrays = fetch_arrays({
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
            }, to_host=primary)
            if primary:  # replicas hold identical state; one copy suffices
                save_checkpoint(
                    {
                        **ckpt_arrays,
                        "epoch": epoch,
                        "model_name": ckpt_dir,
                        "train_time": all_epoch_time,
                        **_best_vals(),
                    },
                    is_best, cat, ckpt_dir, epoch, fmt=cfg.ckpt_format,
                )
            history[-1]["val"] = summary

    if train_writer is not None:
        train_writer.close()
    return {"state": state, "history": history, "ckpt_dir": ckpt_dir,
            "trainer": trainer, "model": gen}
