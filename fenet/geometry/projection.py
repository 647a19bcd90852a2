"""Differentiable silhouette projection, end to end on device.

jnp rebuild of utils/projection.py + the transform() driver (utils/utils.py:
180-243). Two deliberate fixes, both documented in SURVEY.md §3.4:

- genuinely differentiable: the reference detaches both inputs before
  projecting (utils/utils.py:199,209), so its projection loss contributed no
  generator gradients (hence the spurious requires_grad_ patch at
  finetune.py:163). Here gradients flow.
- no host round-trip: the reference bounces the splat to CPU mid-pipeline
  (utils/utils.py:232 passes device='cpu'); everything here stays on device
  and fuses under jit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Blender-derived intrinsics for the 64x64 projection grid
# (utils/projection.py:126-129).
_K = np.array([[120.0, 0.0, -32.0], [0.0, 120.0, -32.0], [0.0, 0.0, 1.0]],
              np.float32)
_CAMERA_DISTANCE = 2.5  # projection.py:164


def apply_kernel(x: jnp.ndarray, sigma_sq: float = 0.5) -> jnp.ndarray:
    """Unnormalized gaussian kernel exp(-x^2 / 2 sigma^2) (projection.py:97-108)."""
    return jnp.exp(-(x**2) / (2.0 * sigma_sq))


def cont_proj(
    pcl: jnp.ndarray, grid_h: int, grid_w: int, sigma_sq: float = 0.5,
    squash: bool = False,
) -> jnp.ndarray:
    """Continuous (gaussian-splat) orthographic silhouette (projection.py:4-67).

    pcl: (B, N, 3) with x/y in (-1, 1). Returns (B, H, W) soft silhouettes.

    The reference materializes a (B, N, H, W, 2) kernel tensor; here the x and
    y gaussians are splatted separately and combined with one batched matmul
    (MXU), so peak memory is O(B*N*(H+W)) instead of O(B*N*H*W*2).

    ``squash=True`` applies tanh to the kernel sum — the CAPNet composition
    the reference's projection omits — mapping the silhouette into [0, 1) so
    BCE on it is a proper (bounded-below) loss. The reference never noticed
    the omission because it detaches the projection (no gradient flows);
    measured on chip (docs/finetune_onchip_convergence.json), the raw-sum
    bce_prob direction degrades CD/EMD reconstruction once genuinely
    differentiated. Default stays the faithful raw sum.
    """
    x = (pcl[..., 0] + 1.0) * grid_h / 2.0  # (B, N)
    y = (pcl[..., 1] + 1.0) * grid_w / 2.0
    gh = jnp.arange(grid_h, dtype=jnp.float32)
    gw = jnp.arange(grid_w, dtype=jnp.float32)
    kx = apply_kernel(x[..., None] - gh[None, None, :], sigma_sq)  # (B, N, H)
    ky = apply_kernel(y[..., None] - gw[None, None, :], sigma_sq)  # (B, N, W)
    # sum_n kx[b,n,h] * ky[b,n,w] == kx^T @ ky per batch.
    out = jnp.einsum("bnh,bnw->bhw", kx, ky,
                     preferred_element_type=jnp.float32)
    return jnp.tanh(out) if squash else out


def disc_proj(pcl: jnp.ndarray, grid_h: int, grid_w: int) -> jnp.ndarray:
    """Hard scatter silhouette (projection.py:69-95), batched."""
    ix = jnp.clip(pcl[..., 0].astype(jnp.int32), 0, grid_h - 1)
    iy = jnp.clip(pcl[..., 1].astype(jnp.int32), 0, grid_w - 1)
    b = pcl.shape[0]
    grid = jnp.zeros((b, grid_h, grid_w))
    bidx = jnp.arange(b)[:, None]
    return grid.at[bidx, ix, iy].max(1.0)


def world2cam(
    xyz: jnp.ndarray, az: jnp.ndarray, el: jnp.ndarray,
    d: float = _CAMERA_DISTANCE,
) -> jnp.ndarray:
    """World -> camera coordinates (projection.py:148-199).

    xyz: (B, N, 3); az/el: (B,) radians. Rotation = R_el @ R_az with the
    reference's exact (transposed-stack) matrix layout, then translate by
    R @ [0, 0, -d].
    """
    az = jnp.broadcast_to(jnp.asarray(az, jnp.float32), xyz.shape[:1])
    el = jnp.broadcast_to(jnp.asarray(el, jnp.float32), xyz.shape[:1])
    one, zero = jnp.ones_like(az), jnp.zeros_like(az)
    # The torch code stacks rows then permutes (2,0,1); written directly here.
    rot_az = jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, jnp.cos(az), -jnp.sin(az)], -1),
            jnp.stack([zero, jnp.sin(az), jnp.cos(az)], -1),
        ],
        axis=1,
    )  # (B, 3, 3)
    rot_el = jnp.stack(
        [
            jnp.stack([jnp.cos(el), zero, jnp.sin(el)], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-jnp.sin(el), zero, jnp.cos(el)], -1),
        ],
        axis=1,
    )
    rot = jnp.einsum("bij,bjk->bik", rot_el, rot_az)
    t = jnp.array([0.0, 0.0, -d], jnp.float32)
    out = jnp.einsum("bij,bnj->bni", rot, xyz - t[None, None, :])
    return out


def perspective_transform(xyz: jnp.ndarray) -> jnp.ndarray:
    """Camera -> image coordinates with the fixed K (projection.py:110-146).

    Divides x/y by |z| of the *input* and keeps |Kz| as the output z.
    """
    proj = jnp.einsum("ij,bnj->bni", jnp.asarray(_K), xyz)
    xy = proj[..., :2] / jnp.abs(xyz[..., 2:3])
    return jnp.concatenate([xy, jnp.abs(proj[..., 2:3])], axis=-1)


def project_silhouettes(
    pre_points: jnp.ndarray,
    points: jnp.ndarray,
    grid_h: int = 64,
    grid_w: int = 64,
    sigma_sq: float = 0.5,
    az: float = 0.0,
    el: float = 0.0,
    squash: bool = False,
):
    """End-to-end transform() (utils/utils.py:180-243): project both the
    predicted and GT clouds to soft silhouettes.

    Args:
      pre_points: (B, N, 3) predicted cloud — gradients flow (fix of the
        reference's detach).
      points: (B, N, 3) ground-truth cloud.

    Returns:
      (proj_pred, proj_gt): (B, H, W) each.
    """
    from fenet.geometry.pointcloud import average_pcl, outlier, scale2one

    def pipeline(p):
        azv = jnp.full(p.shape[:1], az, jnp.float32)
        elv = jnp.full(p.shape[:1], el, jnp.float32)
        p = world2cam(p, azv, elv)
        p = perspective_transform(p)
        p, xm, ym, zm = average_pcl(p)
        p = outlier(p, xm, ym, zm)
        p = scale2one(p)
        return cont_proj(p, grid_h, grid_w, sigma_sq, squash=squash)

    return pipeline(pre_points), pipeline(points)
