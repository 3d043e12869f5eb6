"""Data layer: datasets, loaders, transforms (reference ppsci/data tests)."""

import numpy as np
import pytest

import paddlescience_tpu as psci
from paddlescience_tpu import data as data_mod


def test_named_array_dataset_loader():
    ds = data_mod.NamedArrayDataset(
        {"x": np.arange(20).reshape(20, 1).astype(np.float32)},
        {"u": np.arange(20).reshape(20, 1).astype(np.float32) * 2},
    )
    loader = data_mod.BatchLoader(ds, batch_size=8, shuffle=True, drop_last=True, num_replicas=1, rank=0)
    it = iter(loader)
    inp, lab, wgt = next(it)
    assert inp["x"].shape == (8, 1)
    np.testing.assert_allclose(lab["u"], inp["x"] * 2)


def test_rank_sharding():
    ds = data_mod.NamedArrayDataset({"x": np.arange(16).reshape(16, 1).astype(np.float32)})
    got = []
    for rank in range(2):
        loader = data_mod.BatchLoader(ds, batch_size=8, shuffle=False, num_replicas=2, rank=rank)
        inp, _, _ = next(iter(loader))
        got.append(inp["x"].flatten())
    all_vals = np.sort(np.concatenate(got))
    np.testing.assert_allclose(all_vals, np.arange(16))


def test_iterable_dataset_full_batch():
    ds = data_mod.IterableNamedArrayDataset({"x": np.ones((10, 1), np.float32)}, {"u": np.zeros((10, 1), np.float32)})
    loader = data_mod.BatchLoader(ds)
    inp, lab, _ = next(iter(loader))
    assert inp["x"].shape == (10, 1)


def test_continuous_dataset():
    ds = data_mod.ContinuousNamedArrayDataset(
        lambda: {"x": np.random.rand(4, 1).astype(np.float32)},
        lambda inp: {"u": inp["x"] * 2},
    )
    it = iter(data_mod.BatchLoader(ds))
    a, la, _ = next(it)
    b, lb, _ = next(it)
    assert not np.allclose(a["x"], b["x"])  # fresh batch each step
    np.testing.assert_allclose(la["u"], a["x"] * 2)


def test_transforms():
    from paddlescience_tpu.data.process.transform import Compose, Normalize, Scale, Translate

    t = Compose([Translate({"x": 1.0}), Scale({"x": 2.0})])
    inp, lab, wgt = t({"x": np.zeros((3, 1))}, {}, {})
    np.testing.assert_allclose(inp["x"], 2.0)
    n = Normalize(mean=1.0, std=2.0, apply_keys=("input",))
    inp, _, _ = n({"x": np.ones((3, 1)) * 3}, {}, {})
    np.testing.assert_allclose(inp["x"], 1.0)


def test_build_dataset_with_transforms():
    ds = data_mod.build_dataset(
        {
            "name": "NamedArrayDataset",
            "input": {"x": np.ones((4, 1), np.float32)},
            "label": {"u": np.ones((4, 1), np.float32)},
            "transforms": [{"name": "Scale", "scale": {"x": 3.0}}],
        }
    )
    inp, lab, _ = ds[np.array([0, 1])]
    np.testing.assert_allclose(inp["x"], 3.0)


def test_readers(tmp_path):
    import scipy.io as sio

    from paddlescience_tpu.utils import reader

    # csv
    p = tmp_path / "d.csv"
    p.write_text("a,b\n1,2\n3,4\n")
    out = reader.load_csv_file(str(p), ("a", "b"))
    np.testing.assert_allclose(out["a"].flatten(), [1, 3])
    # mat
    p2 = tmp_path / "d.mat"
    sio.savemat(str(p2), {"u": np.arange(6).reshape(2, 3)})
    out = reader.load_mat_file(str(p2), ("u",))
    assert out["u"].shape == (2, 3)
    # npz
    p3 = tmp_path / "d.npz"
    np.savez(str(p3), v=np.ones(5))
    out = reader.load_npz_file(str(p3), ("v",))
    assert out["v"].shape == (5,)


def test_batch_transforms_and_collate():
    """FunctionalBatchTransform + default_collate_fn (reference
    process/batch_transform/__init__.py:43-139)."""
    import numpy as np
    from paddlescience_tpu import data as data_mod

    ds = data_mod.build_dataset({
        "name": "NamedArrayDataset",
        "input": {"x": np.arange(8, dtype=np.float32).reshape(-1, 1)},
        "label": {"y": np.arange(8, dtype=np.float32).reshape(-1, 1) * 2},
    })

    def double_labels(inp, lab, wgt):
        return inp, {k: v * 2 for k, v in lab.items()}, wgt

    loader = data_mod.build_dataloader(ds, {
        "batch_size": 4,
        "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": True},
        "batch_transforms": [{"FunctionalBatchTransform": {"transform_func": double_labels}}],
    })
    inp, lab, wgt = next(iter(loader))
    np.testing.assert_allclose(lab["y"], inp["x"] * 4)

    # collate a list of per-sample dicts
    samples = [({"x": np.float32(i)}, {"y": np.float32(2 * i)}, {}) for i in range(3)]
    cin, clab, cwgt = data_mod.default_collate_fn(samples)
    assert cin["x"].shape == (3,)
    np.testing.assert_allclose(clab["y"], [0, 2, 4])


def test_enso_real_cmip_dir_layout(tmp_path):
    """Real CMIP archive parsing (reference enso_dataset.py:100-165): lon
    selection, per-model fold, windows never crossing model boundaries."""
    import h5py
    import numpy as np

    from paddlescience_tpu.data.dataset.domain_dataset import ENSODataset, _cmip_fold

    lat, nlon = 4, 6
    lon = np.array([80.0, 100.0, 150.0, 200.0, 300.0, 340.0])  # 4 in [95,330]
    # 2 cmip6 rows (1 model x 2 years) + 2 cmip5 rows (1 model x 2 years);
    # consecutive year-windows overlap by 24 months with identical values
    def model_series(base, years):
        T = (years - 1) * 12 + 36
        series = base + np.arange(T, dtype=np.float32)[:, None, None] * np.ones(
            (lat, nlon), np.float32
        )
        return np.stack([series[i * 12 : i * 12 + 36] for i in range(years)])

    sst = np.concatenate([model_series(0.0, 2), model_series(1000.0, 2)])
    with h5py.File(tmp_path / "CMIP_train.nc", "w") as f:
        f["sst"] = sst
        f["lon"] = lon
    with h5py.File(tmp_path / "CMIP_label.nc", "w") as f:
        f["nino"] = sst[..., 0, 0]

    ds = ENSODataset(
        ("sst",), ("sst_target",), file_path=str(tmp_path),
        in_len=12, out_len=12, stride=12,
        cmip6_rows=2, years6=2, years5=2,
    )
    x = ds.input["sst"]
    assert x.shape[-3:] == (lat, 4, 1)  # lon selected 6 -> 4
    # each model series is 48 months; windows of 24 with stride 12 -> 3/model
    assert x.shape[0] == 6
    # no window mixes the base-0 and base-1000 models
    for w in x[..., 0]:
        assert (w < 500).all() or (w > 500).all()
    # folding reconstructs the monthly series exactly
    folded = _cmip_fold(model_series(0.0, 2))
    assert folded.shape[0] == 48
    np.testing.assert_array_equal(folded[12:36], model_series(0.0, 2)[1][:24])
