"""PLY point-cloud I/O, dependency-free (plyfile is not in this image).

Equivalent of utils/common.py:42-60 (export_pointcloud/load_pointcloud) for
float32 x/y/z vertex clouds, supporting both ascii and binary_little_endian.
"""

from __future__ import annotations

import numpy as np

_HEADER = """ply
format {fmt} 1.0
element vertex {n}
property float x
property float y
property float z
end_header
"""


def export_pointcloud(vertices: np.ndarray, out_file: str, as_text: bool = True):
    vertices = np.ascontiguousarray(vertices, np.float32)
    assert vertices.ndim == 2 and vertices.shape[1] == 3
    fmt = "ascii" if as_text else "binary_little_endian"
    header = _HEADER.format(fmt=fmt, n=len(vertices))
    if as_text:
        with open(out_file, "w") as f:
            f.write(header)
            np.savetxt(f, vertices, fmt="%.6g")
    else:
        with open(out_file, "wb") as f:
            f.write(header.encode())
            f.write(vertices.astype("<f4").tobytes())


def load_pointcloud(in_file: str) -> np.ndarray:
    with open(in_file, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        n = int(next(l.split()[2] for l in header if l.startswith("element vertex")))
        n_props = sum(1 for l in header if l.startswith("property"))
        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n, dtype=np.float32)
        else:
            data = np.frombuffer(
                f.read(4 * n_props * n), dtype="<f4"
            ).reshape(n, n_props)
    return np.asarray(data[:, :3], np.float32)
