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
    ds = ShapeNetObjects(str(tmp_path), num_points=128, category=None)
    assert len(ds) == 20
    batch = ds.sample_batch(rng, 4)
    assert batch["xyz"].shape == (4, 128, 3)
    assert batch["valid"].all()
    assert (batch["inst_label"] == 1).all()  # whole object = one instance
    # sampled objects are normalized: max |coord| == 1 (subsampling keeps
    # the bound only when num_points == n, hence 128 here)
    assert np.isclose(np.abs(batch["xyz"]).max(axis=(1, 2)), 1.0).all()
    # streamed rows are the raw file content (normalize is sample-time)
    obj = ds._read_rows(np.asarray([7]))[0]
    np.testing.assert_allclose(obj, data[7], rtol=1e-6)
    # and sample-time normalization matches the hand computation exactly:
    # replay the rng draws (object pick, column shuffle) next to the loader
    picked = ds.sample_batch(np.random.default_rng(11), 1)
    replay = np.random.default_rng(11)
    i0 = int(replay.integers(0, len(ds), 1)[0])
    want = data[i0] - data[i0].mean(axis=0, keepdims=True)
    want = want / np.maximum(np.abs(want).max(), 1e-9)
    cols = replay.choice(128, 128, replace=False)
    np.testing.assert_allclose(
        picked["xyz"][0], want[cols].astype(np.float32), rtol=1e-6
    )

    cat = int(label[0])
    ds_cat = ShapeNetObjects(str(tmp_path), num_points=64, category=cat)
    assert len(ds_cat) == int((label == cat).sum())

    # duplicate draws within a batch must stream correctly (h5py requires
    # strictly-increasing indices; the loader dedupes then scatters back)
    big = ds.sample_batch(np.random.default_rng(3), 40)
    assert big["xyz"].shape == (40, 128, 3)
    dup = ds._read_rows(np.asarray([5, 5, 2, 5]))
    np.testing.assert_array_equal(dup[0], dup[1])
    np.testing.assert_array_equal(dup[0], dup[3])


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
    # 0-based part classes shift to 1..C (0 = void for the eval protocol):
    # labeled points are >= 1; source label 4 (max of 0..4) becomes 5
    assert batch["sem_label"].min() >= 0
    assert batch["sem_label"].max() <= 6
    assert (batch["sem_label"][batch["inst_label"] > 0] >= 1).all()
    assert batch["valid"].all()
