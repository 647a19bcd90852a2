"""Point-cloud visualization (matplotlib 3D scatter).

Rebuild of the reference viz scripts' shared rendering core: per-cloud scatter
PNGs (shapenet_img.py:43-91, shapenet_img_edge.py:16-98, save_pix3d_img.py:
75-133) and the figure -> ndarray helper (utils/common.py analog
get_ptcloud_img).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _fig_to_array(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())
    return buf[..., :3].copy()


def get_ptcloud_img(ptcloud: np.ndarray, elev: float = 30.0,
                    azim: float = -45.0) -> np.ndarray:
    """Render an (N, 3) cloud to an RGB ndarray."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(4, 4))
    ax = fig.add_subplot(111, projection="3d")
    x, y, z = ptcloud[:, 0], ptcloud[:, 1], ptcloud[:, 2]
    ax.scatter(x, y, z, zdir="z", c=z, cmap="jet", s=2)
    ax.view_init(elev=elev, azim=azim)
    ax.axis("off")
    img = _fig_to_array(fig)
    plt.close(fig)
    return img


def save_cloud_png(ptcloud: np.ndarray, path: str, **kw):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = get_ptcloud_img(np.asarray(ptcloud), **kw)
    plt.imsave(path, img)


def save_pix3d_cloud_png(
    ptcloud: np.ndarray,
    path: str,
    scale: float = 0.45,
    azim: float = -45.0,
    elev: float = -165.0,
    color: str = "r",
) -> None:
    """One cloud in the save_pix3d_img.py style (:101-126): fixed +-scale
    axes, red points, (y, z, x) axis order, azim=-45 elev=-165 view."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    p = np.asarray(ptcloud)
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    ax.set_xlim(-scale, scale)
    ax.set_ylim(-scale, scale)
    ax.set_zlim(-scale, scale)
    ax.scatter(p[:, 1], p[:, 2], p[:, 0], c=color, s=5, depthshade=True)
    ax.axis("off")
    ax.view_init(azim=azim, elev=elev)
    fig.savefig(path)
    plt.close(fig)


def render_clouds(clouds: Dict[str, np.ndarray], path: Optional[str] = None,
                  image: Optional[np.ndarray] = None) -> np.ndarray:
    """Side-by-side comparison render (GT vs multi-resolution predictions),
    the shapenet_img.py layout. ``image`` optionally prepends the input view."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(clouds) + (1 if image is not None else 0)
    fig = plt.figure(figsize=(4 * n, 4))
    col = 1
    if image is not None:
        ax = fig.add_subplot(1, n, col)
        ax.imshow(np.asarray(image, np.float32) / 255.0)
        ax.set_title("input")
        ax.axis("off")
        col += 1
    for name, cloud in clouds.items():
        ax = fig.add_subplot(1, n, col, projection="3d")
        cloud = np.asarray(cloud)
        ax.scatter(cloud[:, 0], cloud[:, 1], cloud[:, 2], c=cloud[:, 2],
                   cmap="jet", s=2)
        ax.set_title(name)
        ax.axis("off")
        col += 1
    img = _fig_to_array(fig)
    if path is not None:
        plt.imsave(path, img)
    plt.close(fig)
    return img
