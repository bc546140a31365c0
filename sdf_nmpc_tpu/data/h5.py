"""HDF5 image dataset pipeline.

Parity with reference sdf_nmpc/utils/data.py dataset helpers + the
scripts/neural_nets/create_h5.py merger:

  * ``ImageDataset``: h5-backed images, preprocessing, optional augmentation,
    optional collision mapping (erosion) on the label image
  * ``train/test_dataset_from_h5``: metadata extraction, seeded train/valid
    split (seed-pinned for resume reproducibility, reference data.py:216-218)
  * ``merge_h5``: merge multiple h5 sources into one file with per-source
    train/test split and attr consistency asserts (create_h5.py:34-89)

Host-side numpy/h5py feeding jnp batches (the grain-style input stage of
SURVEY.md §2.3 N9).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

from ..perception.preprocessing import clip_distance, depth2range, disk_kernel, erode
from .augment import ImageAugmenter


class ImageDataset:
    """Index-addressable dataset of (augmented image, label image) pairs."""

    def __init__(self, data, idx, preprocess, augment: Optional[ImageAugmenter] = None,
                 col_mapping=None, seed=0):
        self.imgs = data
        self.idx = list(idx)
        self.preprocess = preprocess
        self.augment = augment
        self.augment_idx = set(self.idx)
        self.col_mapping = col_mapping
        self._key = jax.random.PRNGKey(seed)

    def set_augment_idx(self, augment_idx):
        self.augment_idx = set(int(i) for i in augment_idx)

    def __len__(self):
        return len(self.idx)

    def __getitem__(self, i):
        img_np = np.asarray(self.imgs[self.idx[i]], dtype=np.float32)
        img = self.preprocess(img_np)

        if self.augment is not None and i in self.augment_idx:
            self._key, sub = jax.random.split(self._key)
            img, label = self.augment(sub, img)
        else:
            label = img

        if self.col_mapping is not None:
            label = self.col_mapping(label)
        label = jnp.where(img > 0, label, 0.0)
        return img, label

    def _batched_fn(self):
        """One jitted (preprocess -> augment -> col_map -> mask) pass for a
        whole batch.  The per-item __getitem__ path issues ~10 small device
        ops per image — fine locally, but through a remote-device tunnel the
        dispatch latency dominates an epoch; this path is one dispatch per
        batch with identical per-item semantics."""
        fn = getattr(self, "_batched_jit", None)
        if fn is not None:
            return fn

        def run(raw, keys, aug_mask):
            img = jax.vmap(self.preprocess)(raw)
            label = img
            if self.augment is not None:
                a_img, a_label = jax.vmap(self.augment)(keys, img)
                m = aug_mask[:, None, None, None]
                img = jnp.where(m, a_img, img)
                label = jnp.where(m, a_label, label)
            if self.col_mapping is not None:
                label = jax.vmap(self.col_mapping)(label)
            label = jnp.where(img > 0, label, 0.0)
            return img, label

        fn = jax.jit(run)
        self._batched_jit = fn
        return fn

    def batches(self, batch_size, key=None, shuffle=False):
        order = np.arange(len(self))
        if shuffle:
            assert key is not None
            order = np.asarray(jax.random.permutation(key, len(self)))
        fn = self._batched_fn()
        for i in range(0, len(order), batch_size):
            sel = order[i : i + batch_size]
            raw = np.stack(
                [np.asarray(self.imgs[self.idx[int(j)]], np.float32) for j in sel]
            )
            keys = []
            for j in sel:
                if self.augment is not None and int(j) in self.augment_idx:
                    self._key, sub = jax.random.split(self._key)
                    keys.append(sub)
                else:
                    keys.append(self._key)  # unused lane (masked out)
            aug_mask = np.array(
                [self.augment is not None and int(j) in self.augment_idx for j in sel]
            )
            yield fn(jnp.asarray(raw), jnp.stack(keys), jnp.asarray(aug_mask))


def _prepare_dataset(h5file, train, dmax, vae, col_map):
    """(data, metadata, preprocess, augment, col_mapping) —
    reference data.py:153-189."""
    data = h5file["train" if train else "test"]["images"]
    metadata = {
        "dmax": dmax,
        "hfov": float(h5file.attrs["hfov"]),
        "vfov": float(h5file.attrs["vfov"]),
        "aspect_ratio": float(h5file.attrs["aspect_ratio"]),
        "is_spherical": bool(h5file.attrs["is_spherical"]),
        "is_depth": False,  # converted to range by preprocessing
        "nb_imgs": data.shape[0],
        "shape_imgs": list(data.shape[1:]),
    }

    if vae:
        augment = ImageAugmenter(metadata["shape_imgs"], noise=True, flip=True,
                                 translate=True, rotate=True, erase=True, outlier_rm=True)
    else:
        augment = ImageAugmenter(metadata["shape_imgs"], noise=True, flip=True,
                                 translate=True, rotate=False, erase=True, outlier_rm=False)

    is_depth = bool(h5file.attrs["is_depth"])
    hfov, vfov = metadata["hfov"], metadata["vfov"]

    def preprocess(img):
        x = clip_distance(jnp.asarray(img, jnp.float32), dmax, mm_resolution=1)
        if is_depth:
            x = depth2range(x, hfov, vfov)
        return x

    col_mapping = None
    if col_map:
        kernel = disk_kernel(10)  # 10-px disk (reference data.py:181-185)
        col_mapping = lambda img: erode(img, kernel, ignore_zeros=True)

    return data, metadata, preprocess, augment, col_mapping


def test_dataset_from_h5(path_to_data, dataset, dmax, vae=False, col_map=False):
    h5file = h5py.File(os.path.join(path_to_data, dataset), "r")
    data, metadata, preprocess, _, col_mapping = _prepare_dataset(h5file, False, dmax, vae, col_map)
    ds = ImageDataset(data, range(metadata["nb_imgs"]), preprocess, None, col_mapping)
    return ds, metadata


def train_dataset_from_h5(path_to_data, dataset, dmax, train_valid_ratio=0.8,
                          vae=False, col_map=False, seed=42):
    """(train_ds, valid_ds), metadata — split seed pinned for resume."""
    h5file = h5py.File(os.path.join(path_to_data, dataset), "r")
    data, metadata, preprocess, augment, col_mapping = _prepare_dataset(h5file, True, dmax, vae, col_map)
    n = metadata["nb_imgs"]
    perm = np.random.default_rng(seed).permutation(n)
    n_train = int(round(train_valid_ratio * n))
    train_ds = ImageDataset(data, perm[:n_train].tolist(), preprocess, augment, col_mapping, seed=seed)
    valid_ds = (
        ImageDataset(data, perm[n_train:].tolist(), preprocess, None, col_mapping)
        if n_train < n
        else None
    )
    return (train_ds, valid_ds), metadata


def merge_h5(sources, out_path, ratio_test=0.1, seed=0):
    """Merge several image h5 files into one with train/test groups
    (reference create_h5.py behavior; eager copy instead of virtual datasets
    for portability)."""
    assert h5py is not None
    attrs_ref = None
    train_parts, test_parts = [], []
    rng = np.random.default_rng(seed)
    for src in sources:
        with h5py.File(src, "r") as f:
            imgs = np.asarray(f["images"] if "images" in f else f["train"]["images"])
            a = {k: f.attrs[k] for k in ("hfov", "vfov", "aspect_ratio", "is_depth", "is_spherical")}
            if attrs_ref is None:
                attrs_ref = a
            else:
                for k in attrs_ref:
                    assert np.all(attrs_ref[k] == a[k]), f"attr mismatch on {k} in {src}"
            n_test = int(round(len(imgs) * ratio_test))
            perm = rng.permutation(len(imgs))
            test_parts.append(imgs[perm[:n_test]])
            train_parts.append(imgs[perm[n_test:]])
    with h5py.File(out_path, "w") as out:
        out.create_group("train").create_dataset("images", data=np.concatenate(train_parts))
        out.create_group("test").create_dataset("images", data=np.concatenate(test_parts))
        for k, v in attrs_ref.items():
            out.attrs[k] = v
    return out_path
