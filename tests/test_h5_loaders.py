"""ShapeNet/PartNet HDF5 loaders against fabricated files."""

import h5py
import numpy as np

from gspn_tpu.data.partnet import PartNetParts
from gspn_tpu.data.shapenet import ShapeNetObjects


def _write_shapenet_h5(path, rng, b=20, n=128):
    data = rng.standard_normal((b, n, 3)).astype(np.float32) * 3
    label = rng.integers(0, 4, b).astype(np.int64)
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data)
        f.create_dataset("label", data=label)
    return data, label


def test_shapenet_loader(tmp_path, rng):
    data, label = _write_shapenet_h5(tmp_path / "train0.h5", rng)
    ds = ShapeNetObjects(str(tmp_path), num_points=64, category=None)
    assert len(ds) == 20
    # normalized: centered, max |coord| == 1
    assert np.abs(ds.data.mean(axis=1)).max() < 1e-5
    assert np.isclose(np.abs(ds.data).max(axis=(1, 2)), 1.0).all()
    batch = ds.sample_batch(rng, 4)
    assert batch["xyz"].shape == (4, 64, 3)
    assert batch["valid"].all()
    assert (batch["inst_label"] == 1).all()  # whole object = one instance

    cat = int(label[0])
    ds_cat = ShapeNetObjects(str(tmp_path), num_points=64, category=cat)
    assert len(ds_cat) == int((label == cat).sum())


def test_partnet_loader(tmp_path, rng):
    b, n = 10, 96
    pts = rng.standard_normal((b, n, 3)).astype(np.float32)
    sem = rng.integers(0, 5, (b, n)).astype(np.int64)
    ins = rng.integers(-1, 6, (b, n)).astype(np.int64)  # -1 = unassigned
    with h5py.File(tmp_path / "p0.h5", "w") as f:
        f.create_dataset("pts", data=pts)
        f.create_dataset("label", data=sem)
        f.create_dataset("ins_label", data=ins)
    ds = PartNetParts(str(tmp_path), num_points=48)
    batch = ds.sample_batch(rng, 3)
    assert batch["xyz"].shape == (3, 48, 3)
    assert batch["inst_label"].min() >= 0  # -1 remapped to 0
    assert batch["sem_label"].min() >= 0
    assert batch["valid"].all()
