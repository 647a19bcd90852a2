"""RepVGG in Flax, with structural reparameterization as a pure weight fold.

TPU-native rebuild of the reference's torch RepVGG
(models/repvgg_edge_nose_NEW_cmlp.py:26-209, models/se_block.py:7-22):

- NHWC layout throughout (XLA's native conv layout on TPU), bfloat16-friendly;
- train-time block = conv3x3+BN || conv1x1+BN || identity-BN, summed, then
  optional SE and ReLU (…_cmlp.py:64-73);
- deploy-time block = a single fused 3x3 conv with bias. Unlike the torch
  version, which mutates modules in place (``switch_to_deploy``,
  …_cmlp.py:141-158), the fold here is a *pure function on the params pytree*
  (:func:`fold_repvgg_params`) applied at load/jit time; the module is simply
  constructed with ``deploy=True``. The fold math mirrors
  ``get_equivalent_kernel_bias`` (…_cmlp.py:101-139): BN fused into each
  branch, 1x1 padded to 3x3, identity as a dirac kernel.
- all 14 named configs of the reference factory registry (…_cmlp.py:342-418).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_BN_EPS = 1e-5  # torch BatchNorm2d default
_BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum (0.1)


class SEBlock(nn.Module):
    """Squeeze-and-excite gate (se_block.py:7-22)."""

    channels: int
    internal: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = jnp.mean(x, axis=(1, 2))  # global average pool, (B, C)
        w = nn.relu(nn.Dense(self.internal, name="down")(w))
        w = nn.sigmoid(nn.Dense(self.channels, name="up")(w))
        return x * w[:, None, None, :]


def _conv(out, kernel, stride, padding, groups, name):
    return nn.Conv(
        out,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        feature_group_count=groups,
        use_bias=False,
        name=name,
    )


def _bn(name, train, axis_name=None):
    """``axis_name`` enables sync-BN: batch statistics psum'd over that
    mapped mesh axis, so a sharded train step normalizes with the GLOBAL
    batch's statistics — the reference's single-GPU batch-128 semantics
    (train.py:36) — instead of per-replica ones. Only legal where the axis
    is bound (inside the trainer's shard_map); eval/init run
    use_running_average and never touch it."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=_BN_MOMENTUM,
        epsilon=_BN_EPS,
        axis_name=axis_name,
        name=name,
    )


class RepVGGBlock(nn.Module):
    """One RepVGG block; 3x3 stride-s conv unit with reparam branches."""

    out_channels: int
    stride: int = 1
    groups: int = 1
    use_se: bool = False
    deploy: bool = False
    bn_axis: Optional[str] = None  # sync-BN mesh axis (see _bn)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_channels = x.shape[-1]
        if self.deploy:
            out = nn.Conv(
                self.out_channels,
                (3, 3),
                strides=(self.stride, self.stride),
                padding=[(1, 1), (1, 1)],
                feature_group_count=self.groups,
                use_bias=True,
                name="rbr_reparam",
            )(x)
        else:
            dense = _bn("rbr_dense_bn", train, self.bn_axis)(
                _conv(self.out_channels, 3, self.stride, 1, self.groups,
                      "rbr_dense_conv")(x)
            )
            one = _bn("rbr_1x1_bn", train, self.bn_axis)(
                _conv(self.out_channels, 1, self.stride, 0, self.groups,
                      "rbr_1x1_conv")(x)
            )
            out = dense + one
            if in_channels == self.out_channels and self.stride == 1:
                out = out + _bn("rbr_identity", train, self.bn_axis)(x)
        if self.use_se:
            out = SEBlock(
                self.out_channels, self.out_channels // 16, name="se"
            )(out)
        return nn.relu(out)


@dataclasses.dataclass(frozen=True)
class RepVGGConfig:
    num_blocks: Sequence[int]
    width_multiplier: Sequence[float]
    override_groups_map: Mapping[int, int] = dataclasses.field(
        default_factory=dict
    )
    use_se: bool = False
    num_classes: int = 1000


_G_LAYERS = (2, 4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26)
_G2 = {layer: 2 for layer in _G_LAYERS}
_G4 = {layer: 4 for layer in _G_LAYERS}

# All factory configs from …_cmlp.py:342-418.
REPVGG_CONFIGS: Dict[str, RepVGGConfig] = {
    "RepVGG-A0": RepVGGConfig([2, 4, 14, 1], [0.75, 0.75, 0.75, 2.5]),
    "RepVGG-A1": RepVGGConfig([2, 4, 14, 1], [1, 1, 1, 2.5]),
    "RepVGG-A2": RepVGGConfig([2, 4, 14, 1], [1.5, 1.5, 1.5, 2.75]),
    "RepVGG-B0": RepVGGConfig([4, 6, 16, 1], [1, 1, 1, 2.5]),
    "RepVGG-B1": RepVGGConfig([4, 6, 16, 1], [2, 2, 2, 4]),
    "RepVGG-B1g2": RepVGGConfig([4, 6, 16, 1], [2, 2, 2, 4], _G2),
    "RepVGG-B1g4": RepVGGConfig([4, 6, 16, 1], [2, 2, 2, 4], _G4),
    "RepVGG-B2": RepVGGConfig([4, 6, 16, 1], [2.5, 2.5, 2.5, 5]),
    "RepVGG-B2g2": RepVGGConfig([4, 6, 16, 1], [2.5, 2.5, 2.5, 5], _G2),
    "RepVGG-B2g4": RepVGGConfig([4, 6, 16, 1], [2.5, 2.5, 2.5, 5], _G4),
    "RepVGG-B3": RepVGGConfig([4, 6, 16, 1], [3, 3, 3, 5]),
    "RepVGG-B3g2": RepVGGConfig([4, 6, 16, 1], [3, 3, 3, 5], _G2),
    "RepVGG-B3g4": RepVGGConfig([4, 6, 16, 1], [3, 3, 3, 5], _G4),
    "RepVGG-D2se": RepVGGConfig(
        [8, 14, 24, 1], [2.5, 2.5, 2.5, 5], use_se=True
    ),
    # fenet addition: a miniature config for fast CPU tests / CI.
    "RepVGG-TEST": RepVGGConfig([1, 1, 1, 1], [0.25, 0.25, 0.25, 0.25]),
}


class RepVGG(nn.Module):
    """RepVGG backbone: stage0 + 4 stages + GAP + classifier head.

    ``__call__`` mirrors the torch forward (…_cmlp.py:198-208); the generator
    additionally taps the per-stage feature maps via :meth:`stages`.
    """

    config: RepVGGConfig
    deploy: bool = False
    bn_axis: Optional[str] = None  # sync-BN mesh axis (see _bn)

    def _stage_plan(self):
        """(name, out_channels, stride, groups) for every block, in order."""
        cfg = self.config
        wm = cfg.width_multiplier
        in_planes = min(64, int(64 * wm[0]))
        plan = [("stage0", in_planes, 2, 1)]
        layer_idx = 1
        widths = [int(64 * wm[0]), int(128 * wm[1]), int(256 * wm[2]),
                  int(512 * wm[3])]
        for stage_i, (planes, blocks) in enumerate(
            zip(widths, cfg.num_blocks), start=1
        ):
            strides = [2] + [1] * (blocks - 1)
            for block_i, stride in enumerate(strides):
                groups = cfg.override_groups_map.get(layer_idx, 1)
                plan.append((f"stage{stage_i}_{block_i}", planes, stride, groups))
                layer_idx += 1
        return plan

    def setup(self):
        cfg = self.config
        self.blocks = [
            RepVGGBlock(
                planes,
                stride=stride,
                groups=groups,
                use_se=cfg.use_se,
                deploy=self.deploy,
                bn_axis=self.bn_axis,
                name=name,
            )
            for name, planes, stride, groups in self._stage_plan()
        ]
        self.linear = nn.Dense(cfg.num_classes, name="linear")

    def forward_features(self, x: jnp.ndarray, train: bool = False):
        """Conv stages only -> final (B, H, W, C) feature map. Separated out
        for Grad-CAM-style introspection (models/heatmap.py equivalent)."""
        for block in self.blocks:
            x = block(x, train=train)
            self.sow("intermediates", f"{block.name}_out", x)
        return x

    def block_names(self):
        """Ordered block names — the valid Grad-CAM ``layer`` targets
        (draw_CAM's user-chosen module, models/heatmap.py:43-80)."""
        return [name for name, _, _, _ in self._stage_plan()]

    def resolve_block(self, layer: str) -> str:
        """Resolve a layer spec to a block name: an exact block name, or a
        stage prefix ('stage2') meaning that stage's LAST block."""
        names = self.block_names()
        if layer in names:
            return layer
        in_stage = [n for n in names if n.startswith(layer + "_")]
        if in_stage:
            return in_stage[-1]
        raise ValueError(
            f"unknown layer {layer!r}; valid: {names} or a stage prefix"
        )

    def features_up_to(self, x: jnp.ndarray, layer: str,
                       train: bool = False) -> jnp.ndarray:
        """Conv stages through block ``layer`` inclusive — the feature map
        Grad-CAM differentiates against."""
        layer = self.resolve_block(layer)
        for block in self.blocks:
            x = block(x, train=train)
            if block.name == layer:
                return x
        raise AssertionError(layer)  # unreachable after resolve_block

    def features_from(self, x: jnp.ndarray, layer: str,
                      train: bool = False) -> jnp.ndarray:
        """Remaining conv stages AFTER block ``layer`` -> final feature map
        (the decode-path re-entry point for a mid-network CAM)."""
        layer = self.resolve_block(layer)
        seen = False
        for block in self.blocks:
            if seen:
                x = block(x, train=train)
            if block.name == layer:
                seen = True
        return x

    def head(self, feature_map: jnp.ndarray) -> jnp.ndarray:
        """GAP + classifier (…_cmlp.py:183, AdaptiveAvgPool(1) + Linear)."""
        return self.linear(jnp.mean(feature_map, axis=(1, 2)))

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.head(self.forward_features(x, train=train))


def create_repvgg(name: str, deploy: bool = False) -> RepVGG:
    """Factory registry lookup (get_RepVGG_func_by_name, …_cmlp.py:419-420)."""
    return RepVGG(config=REPVGG_CONFIGS[name], deploy=deploy)


# ---------------------------------------------------------------------------
# Structural reparameterization as a pure weight transform
# ---------------------------------------------------------------------------


def _fuse_conv_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var):
    """Fold BN stats into a conv kernel/bias; kernel is (kh, kw, I, O)."""
    std = jnp.sqrt(bn_var + _BN_EPS)
    t = bn_scale / std  # (O,)
    return kernel * t[None, None, None, :], bn_bias - bn_mean * t


def _dirac_kernel(channels: int, groups: int) -> jnp.ndarray:
    """3x3 identity kernel in (kh, kw, I/groups, O) layout (…_cmlp.py:125-130)."""
    input_dim = channels // groups
    k = jnp.zeros((3, 3, input_dim, channels), jnp.float32)
    o = jnp.arange(channels)
    return k.at[1, 1, o % input_dim, o].set(1.0)


def fold_block(
    params: Mapping[str, Any],
    batch_stats: Mapping[str, Any],
    groups: int = 1,
) -> Dict[str, Any]:
    """Fold one RepVGGBlock's branched params into {'rbr_reparam': ...}.

    Equivalent of get_equivalent_kernel_bias (…_cmlp.py:101-139), in flax
    (kh, kw, I, O) layout.
    """
    k3, b3 = _fuse_conv_bn(
        params["rbr_dense_conv"]["kernel"],
        params["rbr_dense_bn"]["scale"],
        params["rbr_dense_bn"]["bias"],
        batch_stats["rbr_dense_bn"]["mean"],
        batch_stats["rbr_dense_bn"]["var"],
    )
    k1, b1 = _fuse_conv_bn(
        params["rbr_1x1_conv"]["kernel"],
        params["rbr_1x1_bn"]["scale"],
        params["rbr_1x1_bn"]["bias"],
        batch_stats["rbr_1x1_bn"]["mean"],
        batch_stats["rbr_1x1_bn"]["var"],
    )
    kernel = k3 + jnp.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))
    bias = b3 + b1
    if "rbr_identity" in params:
        channels = kernel.shape[-1]
        kid, bid = _fuse_conv_bn(
            _dirac_kernel(channels, groups),
            params["rbr_identity"]["scale"],
            params["rbr_identity"]["bias"],
            batch_stats["rbr_identity"]["mean"],
            batch_stats["rbr_identity"]["var"],
        )
        kernel = kernel + kid
        bias = bias + bid
    folded = {"rbr_reparam": {"kernel": kernel, "bias": bias}}
    if "se" in params:
        folded["se"] = params["se"]
    return folded


def _is_repvgg_block(subtree) -> bool:
    return isinstance(subtree, Mapping) and "rbr_dense_conv" in subtree


def block_custom_l2(params: Mapping[str, Any],
                    batch_stats: Mapping[str, Any]) -> jnp.ndarray:
    """The RepVGG custom weight-decay term for one block
    (get_custom_L2, …_cmlp.py:84-93): regular L2 on the 3x3 kernel's ring,
    plus L2 of the BN-equivalent fused center normalized by t3^2 + t1^2.
    Flax layout (kh, kw, I, O); BN factors are stop-gradiented like the
    torch .detach().
    """
    k3 = params["rbr_dense_conv"]["kernel"]
    k1 = params["rbr_1x1_conv"]["kernel"]
    t3 = jax.lax.stop_gradient(
        params["rbr_dense_bn"]["scale"]
        / jnp.sqrt(batch_stats["rbr_dense_bn"]["var"] + _BN_EPS)
    )
    t1 = jax.lax.stop_gradient(
        params["rbr_1x1_bn"]["scale"]
        / jnp.sqrt(batch_stats["rbr_1x1_bn"]["var"] + _BN_EPS)
    )
    l2_ring = jnp.sum(k3**2) - jnp.sum(k3[1:2, 1:2] ** 2)
    eq_center = k3[1:2, 1:2] * t3 + k1 * t1
    l2_center = jnp.sum(eq_center**2 / (t3**2 + t1**2))
    return l2_center + l2_ring


def model_custom_l2(params: Mapping[str, Any],
                    batch_stats: Mapping[str, Any]) -> jnp.ndarray:
    """Sum of block_custom_l2 over every RepVGG block in a model tree."""
    if _is_repvgg_block(params):
        return block_custom_l2(params, batch_stats)
    total = jnp.float32(0.0)
    for key, sub in params.items():
        if _is_repvgg_block(sub):
            total = total + block_custom_l2(sub, batch_stats[key])
        elif isinstance(sub, Mapping):
            total = total + model_custom_l2(sub, batch_stats.get(key, {}))
    return total


def fold_repvgg_params(
    params: Mapping[str, Any],
    batch_stats: Mapping[str, Any],
    groups_of: Optional[Mapping[str, int]] = None,
    _path: str = "",
) -> Dict[str, Any]:
    """Recursively fold every RepVGG block in a model's variables.

    Returns a params pytree for the ``deploy=True`` module (repvgg_model_convert,
    …_cmlp.py:440-448, as a pure function). ``groups_of`` maps block path
    (e.g. 'RepVGG/stage2_1') to its group count when grouped convs are used.
    """
    if _is_repvgg_block(params):  # called directly on one block's params
        return fold_block(params, batch_stats, (groups_of or {}).get(_path, 1))
    out: Dict[str, Any] = {}
    for key, sub in params.items():
        path = f"{_path}/{key}" if _path else key
        if _is_repvgg_block(sub):
            groups = (groups_of or {}).get(path, 1)
            out[key] = fold_block(sub, batch_stats[key], groups)
        elif isinstance(sub, Mapping):
            out[key] = fold_repvgg_params(
                sub, batch_stats.get(key, {}), groups_of, path
            )
        else:
            out[key] = sub
    return out
