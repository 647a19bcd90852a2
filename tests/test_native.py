"""Native C++ loader: build, decode parity vs cv2, batch integration."""

import numpy as np
import pytest

from fenet.data.loader import DataLoader
from fenet.data.shapenet import ShapeNetDataset, load_split
from fenet.data.synthetic import write_synthetic_shapenet

native = pytest.importorskip("fenet.native")

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain / libpng"
)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native"))
    write_synthetic_shapenet(root, cats=("02691156",), models_per_cat=2)
    return root


def _dataset(root, **kw):
    splits = load_split(root + "/splits", "train_models.json")
    return ShapeNetDataset(
        root + "/ShapeNetRendering/", root + "/ShapeNet_pointclouds/",
        splits, ["02691156"], **kw,
    )


def test_decode_parity_with_cv2(tree):
    ds = _dataset(tree)
    python_sample = ds[3]  # cv2 path
    batch = ds.load_batch([3])
    assert batch is not None
    np.testing.assert_array_equal(batch["image"][0], python_sample["image"])
    np.testing.assert_allclose(batch["points"][0], python_sample["points"],
                               rtol=1e-6)


def test_batch_loader_uses_native(tree):
    ds = _dataset(tree, variety=True, multi_resolution=True)
    dl = DataLoader(ds, batch_size=8, shuffle=True, seed=1)
    batch = next(iter(dl))
    assert batch["image"].shape == (8, 128, 128, 3)
    assert batch["points_128"].shape == (8, 128, 3)
    assert batch["xangle"].shape == (8,)
    # identical content to the python path
    dl2 = DataLoader(ds, batch_size=8, shuffle=True, seed=1)
    ds2 = _dataset(tree, variety=True, multi_resolution=True)
    ds2.load_batch = lambda idxs: None  # force python path
    dl2.dataset = ds2
    batch2 = next(iter(dl2))
    np.testing.assert_array_equal(batch["image"], batch2["image"])
    np.testing.assert_allclose(batch["xangle"], batch2["xangle"], rtol=1e-6)


def test_native_rejects_missing_files(tree):
    with pytest.raises(IOError):
        native.load_images(["/nonexistent/path.png"])
