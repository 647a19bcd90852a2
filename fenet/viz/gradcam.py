"""Grad-CAM over the generator backbone (models/heatmap.py:43-126,
utils/gradcam.py:9-54), as a pure JAX gradient computation.

The torch version registers forward/backward hooks on a module; here the
generator's decode path is re-entered from the backbone feature map, and
``jax.grad`` w.r.t. that feature map gives the CAM weights directly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def grad_cam(
    model,
    variables,
    image: np.ndarray,
    target_fn=None,
    upsample_to: Optional[int] = 128,
    layer: Optional[str] = None,
) -> np.ndarray:
    """Compute a (H, W) heatmap for one image (1, 128, 128, 3).

    ``target_fn(pc3) -> scalar`` defaults to the output L2 norm, the torch
    driver's choice of scalar target (heatmap.py:73-80).

    ``layer`` picks the backbone feature map to differentiate against —
    the torch ``draw_CAM``'s user-chosen module (heatmap.py:43-80): a block
    name ('stage2_3'), a stage prefix ('stage2' = that stage's last block),
    or None for the final feature map. The decode path re-enters from the
    remaining blocks so the CAM weights are exact, not approximated.
    """
    if target_fn is None:
        target_fn = lambda pc3: jnp.sqrt(jnp.sum(pc3**2))

    image = jnp.asarray(image, jnp.float32)
    bound = model.bind(variables)
    if layer is None:
        feature_map = bound.backbone_net.forward_features(image, train=False)

        def from_features(fmap):
            _, _, pc3 = bound.decode(fmap, image, train=False)
            return target_fn(pc3)

    else:
        feature_map = bound.backbone_net.features_up_to(
            image, layer, train=False
        )

        def from_features(fmap):
            final = bound.backbone_net.features_from(fmap, layer,
                                                     train=False)
            _, _, pc3 = bound.decode(final, image, train=False)
            return target_fn(pc3)

    grads = jax.grad(from_features)(feature_map)  # (1, h, w, c)
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)  # GAP of grads
    cam = jnp.maximum(jnp.sum(weights * feature_map, axis=-1), 0.0)[0]
    cam = cam / (jnp.max(cam) + 1e-8)
    cam_np = np.asarray(cam)
    if upsample_to is not None and cam_np.shape[0] != upsample_to:
        try:
            import cv2

            cam_np = cv2.resize(cam_np, (upsample_to, upsample_to))
        except ImportError:
            cam_np = np.kron(
                cam_np, np.ones((upsample_to // cam_np.shape[0],) * 2)
            )
    return cam_np


def overlay_heatmap(image: np.ndarray, cam: np.ndarray,
                    alpha: float = 0.4) -> np.ndarray:
    """Blend a heatmap onto the source image (heatmap.py:110-121)."""
    import cv2

    heat = cv2.applyColorMap(np.uint8(255 * cam), cv2.COLORMAP_JET)
    heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB).astype(np.float32)
    return np.clip(alpha * heat + (1 - alpha) * image, 0, 255).astype(np.uint8)


def save_cam_overlay(
    model,
    variables,
    image: np.ndarray,
    path: str,
    alpha: float = 0.4,
    target_fn=None,
    layer: Optional[str] = None,
) -> np.ndarray:
    """Compute the CAM, blend it onto the input image and write a PNG —
    the draw_CAM save path (heatmap.py:43-126, overlay at :110-121).

    ``image`` is (1, H, W, 3) or (H, W, 3) float32 in 0..255 (the raw
    dataset convention). Returns the blended uint8 RGB array.
    ``layer`` as in :func:`grad_cam`.
    """
    import cv2

    img = np.asarray(image, np.float32)
    batched = img[None] if img.ndim == 3 else img
    cam = grad_cam(model, variables, batched, target_fn=target_fn,
                   upsample_to=batched.shape[1], layer=layer)
    blended = overlay_heatmap(batched[0], cam, alpha=alpha)
    cv2.imwrite(path, cv2.cvtColor(blended, cv2.COLOR_RGB2BGR))
    return blended
