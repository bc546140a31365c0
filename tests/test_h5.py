"""HDF5 dataset pipeline: write -> merge -> load -> batches round trip."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from sdf_nmpc_tpu.data.h5 import merge_h5, train_dataset_from_h5
from sdf_nmpc_tpu.data.h5 import test_dataset_from_h5 as load_test_dataset  # avoid pytest collection


def _write_source(path, n, H=30, W=50, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(0.2, 5.0, size=(n, 1, H, W)).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.create_dataset("images", data=imgs)
        f.attrs["hfov"] = 0.7592
        f.attrs["vfov"] = 0.4903
        f.attrs["aspect_ratio"] = 1.778
        f.attrs["is_depth"] = True
        f.attrs["is_spherical"] = False
    return imgs


def test_merge_and_load(tmp_path):
    a = _write_source(tmp_path / "a.h5", 10, seed=1)
    b = _write_source(tmp_path / "b.h5", 6, seed=2)
    out = merge_h5([tmp_path / "a.h5", tmp_path / "b.h5"], tmp_path / "m.h5", ratio_test=0.25)

    with h5py.File(out, "r") as f:
        n_train = f["train"]["images"].shape[0]
        n_test = f["test"]["images"].shape[0]
        assert n_train + n_test == 16
        assert n_test == round(10 * 0.25) + round(6 * 0.25)
        assert f.attrs["is_depth"]

    (train_ds, valid_ds), meta = train_dataset_from_h5(
        str(tmp_path), "m.h5", dmax=5.0, train_valid_ratio=0.8
    )
    assert meta["hfov"] == pytest.approx(0.7592)
    assert len(train_ds) + len(valid_ds) == n_train
    img, label = train_ds[0]
    assert img.shape == (1, 30, 50)
    assert float(np.asarray(img).max()) <= 1.0  # clipped + normalized

    import jax

    batches = list(train_ds.batches(4, key=jax.random.PRNGKey(0), shuffle=True))
    assert sum(b[0].shape[0] for b in batches) == len(train_ds)

    test_ds, _ = load_test_dataset(str(tmp_path), "m.h5", dmax=5.0)
    assert len(test_ds) == n_test


def test_merge_attr_mismatch_rejected(tmp_path):
    _write_source(tmp_path / "a.h5", 4, seed=1)
    _write_source(tmp_path / "b.h5", 4, H=20, W=50, seed=2)  # same attrs ok
    with h5py.File(tmp_path / "c.h5", "w") as f:  # mismatched attrs
        f.create_dataset("images", data=np.zeros((2, 1, 30, 50), np.float32))
        f.attrs["hfov"] = 0.5
        f.attrs["vfov"] = 0.4903
        f.attrs["aspect_ratio"] = 1.778
        f.attrs["is_depth"] = True
        f.attrs["is_spherical"] = False
    with pytest.raises(AssertionError):
        merge_h5([tmp_path / "a.h5", tmp_path / "c.h5"], tmp_path / "m.h5")
