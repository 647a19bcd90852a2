"""Training loop with the reference's exact optimization semantics, scaled
over a data-parallel device mesh.

Reference semantics kept (train.py):
- Adam(lr=5e-4, betas=(0.9, 0.999)) with torch-style L2 weight decay 1e-4
  added to the gradient *before* the Adam moments (train.py:115) — i.e.
  ``add_decayed_weights`` then ``scale_by_adam``, not AdamW;
- loss schedule: 100*CD + 100*EMD for epochs 1-30, 100*EMD for 31-50
  (train.py:162-171);
- stepwise-multiplicative LR decay at each 10-epoch boundary: x0.1 below 30,
  x0.01 at [30, 40), x0.001 at 40+ — cumulative (train.py:191-199), see
  :func:`reference_lr_schedule`;
- per-epoch AverageMeters, validation at epochs {10, 30, 50}, checkpoint with
  best-copy on joint CD+EMD improvement (train.py:211-243).

TPU-native structure: one jitted ``train_step`` wrapped in ``shard_map`` over
a 1-D batch mesh — each device computes its shard's forward/backward (Pallas
kernels operate on local shapes), gradients and BN statistics are pmean'd
over ICI, and the Adam update runs replicated.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import PartitionSpec as P

from fenet.losses.facade import chamfer_loss, emd_loss
from fenet.parallel.mesh import (
    BATCH_AXIS,
    collective_compiler_options,
    make_mesh,
    replicate,
    shard_batch,
    shard_map_batch,
)
from fenet.train.config import TrainConfig


def reference_lr_schedule(base_lr: float, epoch: int) -> float:
    """LR in effect *during* ``epoch`` (1-indexed), replicating the cumulative
    in-place decay at train.py:191-199."""
    lr = base_lr
    for boundary in range(10, epoch, 10):
        if boundary < 30:
            lr *= 0.1
        elif boundary < 40:
            lr *= 0.01
        else:
            lr *= 0.001
    return lr


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(weight_decay: float) -> optax.GradientTransformation:
    """Torch-Adam-with-weight_decay; LR applied per step by the caller."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
    )


# One jitted step per (model config, mesh, loss mode, trace-relevant config):
# a fresh Trainer (resume, next category, benchmark re-run) would otherwise
# re-trace + re-compile an identical program. Epoch and lr are traced
# arguments, so nothing per-run leaks into the key.
_TRAIN_STEP_CACHE: Dict[tuple, Any] = {}


def _trace_key(config: TrainConfig, loss_mode: str) -> tuple:
    """Config fields that change the traced program (all others — paths,
    epochs, batch sizes — affect only the driver or input shapes)."""
    key = (
        loss_mode, config.weight_decay, config.lambda_cd, config.lambda_emd,
        config.emd_eps, config.emd_iters, config.emd_scale_phases,
        config.emd_early_exit, config.emd_scale_thresh,
        config.emd_impl, config.sinkhorn_blur, config.sinkhorn_iters,
    )
    if loss_mode == "finetune":
        key += (config.lambda_bce, config.grid_h, config.grid_w,
                config.sigma_sq, config.proj_squash)
    return key


class Trainer:
    """Owns the model, optimizer and the jitted sharded train/eval steps.

    ``loss_mode``:
      'schedule' — the train.py epoch-scheduled CD/EMD loss (default);
      'finetune' — the finetune.py projection loss: 100*BCE(silhouettes) +
        lambda_cd*CD + lambda_emd*EMD (finetune.py:148-163), with the
        projection genuinely differentiable (SURVEY.md §3.4).
    """

    def __init__(self, model, config: TrainConfig, mesh=None,
                 loss_mode: str = "schedule"):
        self.config = config
        self.loss_mode = loss_mode
        if mesh is not None:
            self.mesh = mesh
        elif config.model_parallel > 1:
            from fenet.parallel.tp import make_dp_tp_mesh

            self.mesh = make_dp_tp_mesh(config.data_parallel,
                                        config.model_parallel)
        else:
            self.mesh = make_mesh(config.data_parallel)
        if (
            config.sync_bn
            and getattr(model, "bn_axis", "absent") is None
            and self.mesh.shape[BATCH_AXIS] > 1
        ):
            # Sync-BN: normalize with GLOBAL batch statistics (psum over
            # the batch axis inside the shard_map'd step) — the reference's
            # single-GPU batch-128 semantics at any dp. Per-replica BN
            # (sync_bn=False) is the torch-DDP-style alternative.
            model = model.clone(bn_axis=BATCH_AXIS)
        self.model = model
        self.tx = make_optimizer(config.weight_decay)
        try:
            key = (model, self.mesh) + _trace_key(config, loss_mode)
            cached = _TRAIN_STEP_CACHE.get(key)
        except TypeError:  # unhashable model config
            key, cached = None, None
        if cached is None:
            cached = self._build_train_step()
            if key is not None:
                _TRAIN_STEP_CACHE[key] = cached
        self._train_step = cached

    # -- state ---------------------------------------------------------------

    def init_state(self, rng, sample_images) -> TrainState:
        from fenet.models.generator import init_variables

        variables = init_variables(self.model, sample_images, rng=rng)
        return self.state_from_variables(variables)

    def state_from_variables(self, variables) -> TrainState:
        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        # Commit the state to the mesh NOW: the jitted step returns
        # mesh-committed outputs, so an uncommitted initial state would make
        # call #2 retrace (new input shardings) — a full second compile of
        # an identical program.  On a tensor-parallel mesh the Megatron
        # leaves (params AND their Adam mu/nu mirrors) go in model-sharded;
        # everything else is replicated.
        from fenet.parallel.tp import is_tp_mesh, shard_tree

        if is_tp_mesh(self.mesh):
            return shard_tree(state, self.mesh)
        return jax.device_put(state, replicate(self.mesh))

    # -- the hot step ----------------------------------------------------------

    def _build_train_step(self):
        cfg = self.config
        model = self.model
        tx = self.tx

        def local_step(state: TrainState, images, points, epoch, lr):
            """Per-device shard step; grads/stats pmean'd over the mesh."""
            # Free on-device upcast: lets the input pipeline ship raw uint8
            # pixels (4x less host->HBM traffic, data/shapenet.py
            # image_dtype) — value-identical, the convention is raw 0..255.
            images = images.astype(jnp.float32)

            def loss_fn(params):
                (_, _, pc3), mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images,
                    train=True,
                    mutable=["batch_stats"],
                )
                cd = chamfer_loss(pc3, points)
                if cfg.emd_impl == "sinkhorn":
                    from fenet.losses.sinkhorn import sinkhorn_emd_loss

                    emd = sinkhorn_emd_loss(
                        pc3, points, cfg.sinkhorn_blur, cfg.sinkhorn_iters
                    )
                else:
                    emd = emd_loss(
                        pc3, points, cfg.emd_eps, cfg.emd_iters,
                        cfg.emd_scale_phases, cfg.emd_early_exit,
                        cfg.emd_scale_thresh,
                    )
                if self.loss_mode == "finetune":
                    from fenet.geometry.projection import project_silhouettes
                    from fenet.losses.projection import get_loss_proj

                    proj_pred, proj_gt = project_silhouettes(
                        pc3, points, cfg.grid_h, cfg.grid_w, cfg.sigma_sq,
                        squash=cfg.proj_squash,
                    )
                    bce, _, _ = get_loss_proj(proj_pred, proj_gt, "bce_prob")
                    total = (
                        cfg.lambda_bce * bce
                        + cfg.lambda_cd * cd
                        + cfg.lambda_emd * emd
                    )
                else:
                    use_emd_only = epoch > 30  # train.py:162-171
                    total = jnp.where(
                        use_emd_only,
                        cfg.lambda_emd * emd,
                        cfg.lambda_cd * cd + cfg.lambda_emd * emd,
                    )
                return total, (cd, emd, mut["batch_stats"])

            (total, (cd, emd, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            if self.mesh.shape[BATCH_AXIS] > 1:
                grads = jax.lax.pmean(grads, BATCH_AXIS)
                total = jax.lax.pmean(total, BATCH_AXIS)
                cd = jax.lax.pmean(cd, BATCH_AXIS)
                emd = jax.lax.pmean(emd, BATCH_AXIS)
                new_bs = jax.lax.pmean(new_bs, BATCH_AXIS)
            # dp=1 (pure tensor parallelism): the batch-axis pmean is a
            # mathematical no-op, and XLA's SPMD partitioner rejects a
            # size-1 cross-partition allreduce inside the partial-manual
            # region ("must be in (partial) manual partitioning mode").

            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params,
                batch_stats=new_bs,
                opt_state=new_opt,
                step=state.step + 1,
            )
            return new_state, {
                "total_loss": total, "chamfer_loss": cd, "emd_loss": emd
            }

        sharded = shard_map_batch(
            local_step,
            self.mesh,
            in_batch_args={1, 2},
            n_args=5,
            out_specs=(P(), P()),
        )
        # No buffer donation: states stay reusable (eval/checkpoint mid-epoch);
        # at this model scale (~25M params) the copy cost is negligible.
        return jax.jit(
            sharded, compiler_options=collective_compiler_options(self.mesh)
        )

    def train_step(
        self, state: TrainState, images, points, epoch: int, lr: float
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        return self._train_step(
            state,
            images,
            points,
            jnp.asarray(epoch, jnp.int32),
            jnp.asarray(lr, jnp.float32),
        )

    # -- epoch driver ----------------------------------------------------------

    def fit_epoch(
        self,
        state: TrainState,
        dataloader,
        epoch: int,
        logger=None,
        metric_writer=None,
        category: str = "",
    ) -> Tuple[TrainState, Dict[str, float]]:
        """One epoch over a DataLoader, with the reference's per-batch logging
        shape (train.py:137-189)."""
        from fenet.utils.average_meter import AverageMeter

        batch_time = AverageMeter()
        data_time = AverageMeter()
        losses = AverageMeter(["chamfer_loss", "emd_loss"])
        lr = reference_lr_schedule(self.config.lr, epoch)
        n_batches = len(dataloader)
        end = time.time()
        for i, batch in enumerate(dataloader, start=1):
            data_time.update(time.time() - end)
            sharded = shard_batch(
                {"image": batch["image"], "points": batch["points"]}, self.mesh
            )
            state, stats = self.train_step(
                state, sharded["image"], sharded["points"], epoch, lr
            )
            losses.update(
                [float(stats["chamfer_loss"]) * 100,
                 float(stats["emd_loss"]) * 100]
            )
            if metric_writer is not None:
                step = (epoch - 1) * n_batches + i
                metric_writer.add_scalar("scalar/total_loss",
                                         float(stats["total_loss"]), step)
                metric_writer.add_scalar("scalar/chamfer_loss",
                                         float(stats["chamfer_loss"]), step)
                metric_writer.add_scalar("scalar/emd_loss",
                                         float(stats["emd_loss"]), step)
            batch_time.update(time.time() - end)
            end = time.time()
            if logger is not None:
                logger.info(
                    "[Category %s] [Epoch %d/%d][Batch %d/%d] BatchTime = "
                    "%.3f (s) DataTime = %.3f (s) Losses = %s",
                    category, epoch, self.config.nepoch, i, n_batches,
                    batch_time.val(), data_time.val(),
                    ["%.4f" % l for l in losses.val()],
                )
        return state, {
            "chamfer_loss": losses.avg(0),
            "emd_loss": losses.avg(1),
        }
