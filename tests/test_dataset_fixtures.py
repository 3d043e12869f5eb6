"""Real-format dataset parsing against handcrafted fixture files
(VERDICT r1 item 7: real layouts round-trip; synthetic only when path=None;
a supplied-but-missing path raises)."""

import numpy as np
import pytest

import paddlescience_tpu.data.dataset as D


def test_sevir_h5_fixture(tmp_path):
    """2-event SEVIR HDF5 fixture: key 'vil' of shape (N, H, W, T=49)."""
    import h5py

    raw = (np.random.default_rng(0).uniform(0, 255, (2, 32, 32, 49))).astype(np.uint8)
    with h5py.File(tmp_path / "SEVIR_VIL_STORMEVENTS.h5", "w") as f:
        f.create_dataset("vil", data=raw)
    ds = D.SEVIRDataset(("input",), ("output",), data_dir=str(tmp_path),
                        in_len=13, out_len=12, stride=24, img_height=32, img_width=32)
    inp, lab, _ = ds[0]
    assert inp["input"].shape == (13, 32, 32, 1)
    assert lab["output"].shape == (12, 32, 32, 1)
    assert inp["input"].dtype == np.float32
    # preprocess: scale * (x + offset), offset=-33.44, scale=1/47.54
    expect = (raw[0, :, :, 0].astype(np.float32) - 33.44) / 47.54
    np.testing.assert_allclose(inp["input"][0, :, :, 0], expect, rtol=1e-5)
    # events windowed independently: 2 events x 2 windows (49 // 25 with stride 24)
    assert len(ds) == 4


def test_mrms_h5_fixture(tmp_path):
    import h5py

    for date in ("20230101", "20230102"):
        with h5py.File(tmp_path / f"mrms_{date}.h5", "w") as f:
            f.create_dataset("dataset", data=np.random.rand(6, 16, 16).astype(np.float32))
    ds = D.MRMSDataset(("input",), ("output",), file_path=str(tmp_path),
                       date_period=("20230101", "20230102"),
                       num_input_timestamps=2, num_label_timestamps=1, stride=3)
    inp, lab, _ = ds[0]
    assert inp["input"].shape == (2, 16, 16, 1)
    assert lab["output"].shape == (1, 16, 16, 1)
    assert len(ds) == 4  # 2 days x 2 windows of 3 frames from 6

    with pytest.raises(FileNotFoundError):
        D.MRMSDataset(("input",), ("output",), file_path=str(tmp_path),
                      date_period=("20230101", "20230103"))


def test_pems_npy_fixture(tmp_path):
    series = np.random.default_rng(1).uniform(50, 400, (40, 5)).astype(np.float32)
    np.save(tmp_path / "train.npy", series)
    np.save(tmp_path / "mean.npy", series.mean(0, keepdims=True))
    np.save(tmp_path / "std.npy", series.std(0, keepdims=True))
    ds = D.PEMSDataset(("input",), ("label",), file_path=str(tmp_path),
                       split="train", input_len=4, label_len=2)
    inp, lab, _ = ds[0]
    assert inp["input"].shape == (4, 5)
    assert lab["label"].shape == (2, 5)
    # input standard-scaled, label raw
    np.testing.assert_allclose(
        inp["input"], (series[:4] - ds.mean) / ds.std, rtol=1e-5)
    np.testing.assert_allclose(lab["label"], series[4:6], rtol=1e-6)


def test_lorenz_h5_fixture(tmp_path):
    import h5py

    with h5py.File(tmp_path / "lorenz.h5", "w") as f:
        f.create_dataset("traj0", data=np.arange(60, dtype=np.float32).reshape(20, 3))
        f.create_dataset("traj1", data=-np.arange(60, dtype=np.float32).reshape(20, 3))
    ds = D.LorenzDataset(str(tmp_path / "lorenz.h5"), ("states",),
                         ("pred_states", "recover_states"), block_size=8, stride=8)
    inp, lab, _ = ds[0]
    assert inp["states"].shape == (8, 3)
    np.testing.assert_allclose(lab["pred_states"], inp["states"][1:])
    np.testing.assert_allclose(lab["recover_states"], inp["states"])
    assert len(ds) == 4  # 2 trajectories x 2 windows


def test_fwi_anno_fixture(tmp_path):
    data = np.random.rand(3, 1, 8, 8).astype(np.float32)
    label = np.random.rand(3, 1, 8, 8).astype(np.float32)
    np.save(tmp_path / "d0.npy", data)
    np.save(tmp_path / "l0.npy", label)
    anno = tmp_path / "anno.txt"
    anno.write_text(f"{tmp_path / 'd0.npy'} {tmp_path / 'l0.npy'}\n")
    ds = D.FWIDataset(("data",), ("label",), anno_file=str(anno))
    assert len(ds) == 3
    inp, lab, _ = ds[1]
    np.testing.assert_allclose(inp["data"], data[1])
    np.testing.assert_allclose(lab["label"], label[1])


def test_spherical_swe_npy_fixture(tmp_path):
    d = {"x": np.random.rand(3, 3, 8, 16).astype(np.float32),
         "y": np.random.rand(3, 3, 8, 16).astype(np.float32)}
    np.save(tmp_path / "train_SWE_8x16.npy", d, allow_pickle=True)
    ds = D.SphericalSWEDataset(("input",), ("output",), data_dir=str(tmp_path),
                               data_split="train", resolution="8x16")
    inp, lab, _ = ds[2]
    np.testing.assert_allclose(inp["input"], d["x"][2])
    np.testing.assert_allclose(lab["output"], d["y"][2])


def test_era5_sampled_fixture(tmp_path):
    import h5py

    for i in range(2):
        with h5py.File(tmp_path / f"s{i}.h5", "w") as f:
            f.create_dataset("input", data=np.full((2, 4, 8), i, np.float32))
            f.create_dataset("label", data=np.full((2, 4, 8), i + 10, np.float32))
    ds = D.ERA5SampledDataset(str(tmp_path), ("input",), ("output",))
    inp, lab, _ = ds[1]
    assert inp["input"].shape == (2, 4, 8) and inp["input"][0, 0, 0] == 1
    assert lab["output"][0, 0, 0] == 11


def test_moflow_npz_fixture(tmp_path):
    nodes = np.random.rand(4, 9, 5).astype(np.float32)
    edges = np.random.rand(4, 4, 9, 9).astype(np.float32)
    np.savez(tmp_path / "qm9.npz", nodes=nodes, edges=edges)
    ds = D.MOlFLOWDataset(file_path=str(tmp_path / "qm9.npz"))
    assert len(ds) == 4
    inp, _, _ = ds[0]
    np.testing.assert_allclose(inp["nodes"], nodes[0])
    np.testing.assert_allclose(inp["edges"], edges[0])
    with pytest.raises(NotImplementedError):
        csv = tmp_path / "qm9.csv"
        csv.write_text("smiles\nCCO\n")
        D.MOlFLOWDataset(file_path=str(csv))


def test_missing_path_raises_not_synthesizes():
    for cls, kw in [
        (D.SEVIRDataset, dict(data_dir="/nonexistent/sevir")),
        (D.ENSODataset, dict(file_path="/nonexistent/enso.npz")),
        (D.PEMSDataset, dict(file_path="/nonexistent/pems")),
        (D.RadarDataset, dict(dataset_path="/nonexistent/radar")),
    ]:
        with pytest.raises(FileNotFoundError):
            cls(("input",), ("output",), **kw)


def test_radar_dir_fixture(tmp_path):
    case = tmp_path / "case0"
    case.mkdir()
    for t in range(6):
        np.save(case / f"frame_{t:03d}.npy", np.full((8, 8), 10.0 * t, np.float32))
    ds = D.RadarDataset(("input",), ("output",), dataset_path=str(tmp_path),
                        image_width=8, image_height=8, total_length=6, input_length=2)
    inp, lab, _ = ds[0]
    assert inp["input"].shape == (2, 8, 8, 1)
    assert lab["output"].shape == (4, 8, 8, 1)
    # rescale x/10 - 3: frame t has value t - 3
    np.testing.assert_allclose(inp["input"][1, 0, 0, 0], 1.0 - 3.0)


def test_era5_multistep_labels(tmp_path):
    """ERA5Dataset num_label_timestamps: label_keys[i] = frame t+(i+1)*stride
    (the FourCastNet finetune rollout contract, reference train_finetune.py)."""
    import h5py

    data = np.arange(10 * 2 * 4 * 4, dtype=np.float32).reshape(10, 2, 4, 4)
    p = tmp_path / "era5.h5"
    with h5py.File(p, "w") as f:
        f["fields"] = data
    ds = D.ERA5Dataset(str(p), ("input",), ("output_0", "output_1"),
                       num_label_timestamps=2)
    inp, lab, _ = ds[0]
    np.testing.assert_array_equal(inp["input"], data[0])
    np.testing.assert_array_equal(lab["output_0"], data[1])
    np.testing.assert_array_equal(lab["output_1"], data[2])
    assert len(ds) == 8  # T - stride * num_label_timestamps
    with pytest.raises(ValueError):
        D.ERA5Dataset(str(p), ("input",), ("output",), num_label_timestamps=2)


def test_sevir_skill_scores_oracle():
    """examples/earthformer_sevir.py skill scores vs a plain-numpy oracle
    (reference sevir_metric.py:36-228 semantics, mode '0')."""
    import sys
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from earthformer_sevir import sevir_skill_scores, THRESHOLDS, _VIL_SCALE, _VIL_OFFSET

    rng = np.random.default_rng(3)
    raw_t = rng.uniform(0, 255, (2, 3, 8, 8, 1))
    raw_p = rng.uniform(0, 255, (2, 3, 8, 8, 1))
    norm = lambda x: (_VIL_SCALE * (x + _VIL_OFFSET)).astype(np.float32)
    out = sevir_skill_scores({"vil": norm(raw_p)}, {"vil": norm(raw_t)})
    eps = 1e-4
    for i, th in enumerate(THRESHOLDS):
        t = (raw_t >= th).astype(np.float64)
        p = (raw_p >= th).astype(np.float64)
        hits, misses, fas = (t * p).sum(), (t * (1 - p)).sum(), ((1 - t) * p).sum()
        np.testing.assert_allclose(float(out[f"csi_{th}"]),
                                   hits / (hits + misses + fas + eps), rtol=1e-3)
        np.testing.assert_allclose(float(out[f"pod_{th}"]),
                                   hits / (hits + misses + eps), rtol=1e-3)
        np.testing.assert_allclose(float(out[f"sucr_{th}"]),
                                   hits / (hits + fas + eps), rtol=1e-3)
