"""Image -> point-cloud generators: RepVGG backbone + edge branch + decoders.

TPU-native rebuild of ``generator`` (models/repvgg_edge_nose_NEW_cmlp.py:210-336)
and the older single-head variant (models/repvgg_edge_nose_NEW.py:223-281).

Design changes vs the reference, all documented divergences:

- NHWC layout (XLA-native on TPU); inputs are (B, 128, 128, 3) float32 with
  the reference's raw 0..255 value convention (datasets_old.py:30-35 does no
  normalization).
- The fixed Sobel/Laplacian edge kernel is a constant depthwise-summed conv
  baked at trace time, instead of constructing a fresh nn.Conv2d inside every
  forward pass (…_cmlp.py:8-24).
- The cascaded decoder is parameterized by ``num_points``; the reference
  hardcodes 1024 in the fine head (…_cmlp.py:250 ``int((1024*3)/256)``) even
  when run with --num_points 2048.
- Clouds are returned (B, N, 3); the reference transposes to (B, 3, N)
  (…_cmlp.py:332-335). Use ``transpose_clouds`` for reference-shaped outputs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from fenet.models.repvgg import RepVGG, REPVGG_CONFIGS, _bn

# The reference's 3x3 edge kernel: [[-1,-1,-1],[-1,8,-1],[-1,-1,-1]] / 3,
# identical for every (in, out) channel pair (…_cmlp.py:13-19). A host
# numpy constant on purpose: a module-level device array would force
# backend init at import time (even `--help` would block on a TPU probe).
import numpy as _np

_EDGE_KERNEL = (
    _np.array(
        [[-1.0, -1.0, -1.0], [-1.0, 8.0, -1.0], [-1.0, -1.0, -1.0]],
        _np.float32,
    )
    / 3.0
)


def edge_conv2d(x: jnp.ndarray) -> jnp.ndarray:
    """Fixed, non-learnable edge-detection conv; (B, H, W, 3) -> (B, H, W, 3).

    Every output channel is the same sum of the per-channel edge responses
    (the torch kernel is the 3x3 filter repeated over all in/out channels).
    """
    import jax.lax as lax

    # The constant kernel follows FLOATING input dtypes: under a bf16
    # serving fold (to_deploy dtype=bfloat16) an fp32 kernel would silently
    # promote the whole edge path (and everything concatenated after it)
    # back to fp32, forfeiting the MXU bf16 rate the fold exists to buy.
    # Integer inputs keep the fp32 kernel — casting [-1/3, 8/3] to int
    # would truncate to [0, 2] and corrupt the edge map silently, whereas
    # the fp32-kernel/int-input mismatch fails loudly in lax.conv.
    kdtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    kernel = jnp.broadcast_to(
        _EDGE_KERNEL.astype(kdtype)[:, :, None, None], (3, 3, 3, 3)
    )
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _flatten_chw(x: jnp.ndarray) -> jnp.ndarray:
    """Flatten (B, H, W, C) in the reference's (C, H, W) channel-major order
    so converted torch Linear weights apply unchanged (…_cmlp.py:261)."""
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)


class EdgeBranch(nn.Module):
    """Edge feature path: fixed edge conv -> two strided convs -> 1000-d.

    ``deploy=True`` expects BN folded into conv biases
    (:func:`fold_generator_params`), mirroring the RepVGG deploy fold.
    """

    deploy: bool = False
    bn_axis: Optional[str] = None  # sync-BN mesh axis (see repvgg._bn)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        img = edge_conv2d(x)

        def conv(features, name, inp):
            out = nn.Conv(
                features, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                use_bias=self.deploy, name=f"{name}_conv",
            )(inp)
            if not self.deploy:
                out = _bn(f"{name}_bn", train, self.bn_axis)(out)
            return nn.relu(out)

        e = conv(16, "edge0", img)  # (B, 64, 64, 16)
        e = conv(3, "edge2", e)  # (B, 32, 32, 3)
        return nn.Dense(1000, name="linear")(_flatten_chw(e))


class CascadedDecoder(nn.Module):
    """Coarse-to-fine point decoder (…_cmlp.py:240-336).

    128 coarse points; 2x per-point offsets -> 256; (num_points/256)x offsets
    -> num_points. Conv1d(k=1) layers become Dense over the channel axis of
    (B, L, C) tensors (identical math, MXU-friendly layout).

    ``fine_width`` / ``mid_width`` scale the per-point channel widths of the
    fine and mid heads.  The reference hardcodes 512/128 (…_cmlp.py:247-254);
    the defaults reproduce that exactly, smaller values give a
    structure-identical model for width studies and for cheap multi-device
    dry runs (the default fine head is a 134M-param Dense — the bulk of the
    whole generator).
    """

    num_points: int = 1024
    fine_width: int = 512
    mid_width: int = 128

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        if self.num_points % 256 != 0:
            raise ValueError("num_points must be a multiple of 256")
        b = feat.shape[0]
        x1 = nn.relu(nn.Dense(1024, name="fc1")(feat))
        x2 = nn.relu(nn.Dense(512, name="fc2")(x1))
        x3 = nn.relu(nn.Dense(256, name="fc3")(x2))

        # Coarse head: 128 points.
        pc1 = nn.Dense(128 * 3, name="fc3_1")(x3).reshape(b, 128, 3)

        # Mid head: (B, 128*mw) -> torch-order (C=mw, L=128) -> (B, L, C).
        mw = self.mid_width
        pc2_feat = nn.relu(nn.Dense(128 * mw, name="fc2_1")(x2))
        pc2_feat = pc2_feat.reshape(b, mw, 128).transpose(0, 2, 1)
        pc2_off = nn.Dense(6, name="conv2_1")(pc2_feat)  # (B, 128, 6)
        pc2 = (pc1[:, :, None, :] + pc2_off.reshape(b, 128, 2, 3)).reshape(
            b, 256, 3
        )

        # Fine head: (B, 256*fw) -> (C=fw, L=256) -> (B, 256, fw).
        k = self.num_points // 256
        fw = self.fine_width
        pc3_feat = nn.relu(nn.Dense(256 * fw, name="fc1_1")(x1))
        pc3_feat = pc3_feat.reshape(b, fw, 256).transpose(0, 2, 1)
        pc3_feat = nn.relu(nn.Dense(fw, name="conv1_1")(pc3_feat))
        pc3_feat = nn.relu(nn.Dense(256, name="conv1_2")(pc3_feat))
        pc3_off = nn.Dense(3 * k, name="conv1_3")(pc3_feat)  # (B, 256, 3k)
        pc3 = (pc2[:, :, None, :] + pc3_off.reshape(b, 256, k, 3)).reshape(
            b, self.num_points, 3
        )
        return pc1, pc2, pc3


class Generator(nn.Module):
    """Flagship model: cmlp cascaded generator (…_cmlp.py:210-336).

    Returns ``(pc1, pc2, pc3)`` = (B,128,3), (B,256,3), (B,num_points,3).
    setup()-style so bound submodules (``.backbone``, ``.edge``, ``.decoder``)
    are addressable for Grad-CAM and feature taps.
    """

    num_points: int = 1024
    backbone: str = "RepVGG-A2"
    deploy: bool = False
    fine_width: int = 512
    mid_width: int = 128
    # Sync-BN mesh axis (repvgg._bn): set by the Trainer on dp>1 meshes so
    # train-mode BN normalizes with GLOBAL batch statistics (the
    # reference's single-GPU batch-128 semantics); None = per-replica BN.
    bn_axis: Optional[str] = None

    def setup(self):
        self.edge = EdgeBranch(deploy=self.deploy, bn_axis=self.bn_axis,
                               name="edge")
        self.backbone_net = RepVGG(
            config=REPVGG_CONFIGS[self.backbone],
            deploy=self.deploy,
            bn_axis=self.bn_axis,
            name="RepVGG",
        )
        self.decoder = CascadedDecoder(
            self.num_points, fine_width=self.fine_width,
            mid_width=self.mid_width, name="decoder",
        )

    def decode(self, feature_map: jnp.ndarray, x: jnp.ndarray,
               train: bool = False):
        """Decoder path from a backbone feature map (Grad-CAM re-entry)."""
        feat = self.backbone_net.head(feature_map)
        edge = self.edge(x, train=train)
        return self.decoder(jnp.concatenate([feat, edge], axis=1))

    def __call__(self, x: jnp.ndarray, train: bool = False):
        feature_map = self.backbone_net.forward_features(x, train=train)
        return self.decode(feature_map, x, train=train)


class SimpleGenerator(nn.Module):
    """Older single-head variant (models/repvgg_edge_nose_NEW.py:223-281):
    FC 2000 -> 512 -> 1024 -> num_points*3 with LeakyReLU + Tanh."""

    num_points: int = 1024
    backbone: str = "RepVGG-A2"
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        edge = EdgeBranch(name="edge")(x, train=train)
        feat = RepVGG(
            config=REPVGG_CONFIGS[self.backbone],
            deploy=self.deploy,
            name="RepVGG",
        )(x, train=train)
        h = jnp.concatenate([feat, edge], axis=1)
        h = nn.leaky_relu(nn.Dense(512, name="fc1")(h))
        h = nn.leaky_relu(nn.Dense(1024, name="fc2")(h))
        h = jnp.tanh(nn.Dense(self.num_points * 3, name="fc3")(h))
        return h.reshape(x.shape[0], self.num_points, 3)


def fold_generator_params(params, batch_stats):
    """Full deploy fold for a Generator: RepVGG blocks via
    :func:`fold_repvgg_params` plus the edge branch's plain conv+BN pairs.
    Returns params for ``Generator(deploy=True)`` (no batch_stats needed)."""
    from fenet.models.repvgg import _BN_EPS, fold_repvgg_params

    folded = fold_repvgg_params(params, batch_stats)
    edge = dict(folded["edge"])
    for name in ("edge0", "edge2"):
        conv = edge.pop(f"{name}_conv")
        bn = edge.pop(f"{name}_bn")
        stats = batch_stats["edge"][f"{name}_bn"]
        t = bn["scale"] / jnp.sqrt(stats["var"] + _BN_EPS)
        edge[f"{name}_conv"] = {
            "kernel": conv["kernel"] * t[None, None, None, :],
            "bias": bn["bias"] - stats["mean"] * t,
        }
    folded["edge"] = edge
    return folded


def to_deploy(model: Generator, variables, dtype=None):
    """Fold a trained Generator into its inference-serving form.

    The reference ships ``repvgg_model_convert`` (…_cmlp.py:440-448) but no
    driver ever invokes it; here the fold is a pure weight transform exposed
    to the eval/render CLIs (``--deploy``). Returns ``(deploy_model,
    deploy_variables)`` where the model runs single fused 3x3 convs (no BN,
    no branch adds) and the variables carry only ``params``. Numerically
    equivalent to the branched eval-mode forward (tests/test_deploy.py).

    ``dtype`` (e.g. ``jnp.bfloat16``) additionally casts the folded params
    so the serving forward runs at that precision end to end — on TPU the
    MXU's native bf16 rate is 2x fp32, and raw 0..255 pixel inputs are
    exact in bf16. Callers must feed inputs cast to the same dtype (mixed
    inputs re-promote to fp32 under jnp type promotion); outputs keep the
    compute dtype — cast to fp32 at the consumer if needed. Opt-in: bf16
    carries ~3 significant decimal digits, measured coordinate error vs
    the fp32 fold is at the 1e-2 relative level (tests/test_deploy.py),
    fine for serving, below golden-parity precision.
    """
    import jax

    # One jitted program, not ~200 eager ops: on tunneled hosts each eager
    # dispatch pays ~100 ms of round-trip latency, which made the eager
    # fold cost ~57 s (measured round 4); jitted + persistently cached it
    # is a single dispatch.
    @jax.jit
    def _fold(params, batch_stats):
        folded = fold_generator_params(params, batch_stats)
        if dtype is not None:
            folded = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, dtype), folded
            )
        return folded

    folded = _fold(variables["params"], variables["batch_stats"])
    return model.clone(deploy=True), {"params": folded}


def init_variables(model, sample_images, rng=None, train: bool = False):
    """``model.init`` as ONE jitted program.

    Eager ``Module.init`` executes the whole forward op by op; on hosts
    that reach the chip through a high-latency tunnel (~100 ms per
    dispatch) initializing the A2 generator that way measured ~100 s
    (round 4). Jitted, it is a single cached executable — seconds warm.
    Every CLI/driver/bench init goes through here; semantics identical
    (same RNG stream, same variables pytree).
    """
    import jax

    if rng is None:
        rng = jax.random.PRNGKey(0)
    fn = jax.jit(lambda r, x: model.init(r, x, train=train))
    return fn(rng, jnp.asarray(sample_images))


def transpose_clouds(*clouds: jnp.ndarray):
    """(B, N, 3) -> (B, 3, N), the reference's output convention."""
    out = tuple(jnp.transpose(c, (0, 2, 1)) for c in clouds)
    return out if len(out) > 1 else out[0]
