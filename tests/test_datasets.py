"""Domain datasets + config builders (SURVEY.md §2: dataset zoo contracts —
each returns (input, label, weight) dicts with static shapes)."""

import numpy as np
import pytest

import paddlescience_tpu as psci
import paddlescience_tpu.data.dataset as D


@pytest.mark.parametrize(
    "cls,kw,inkey,rank",
    [
        (D.LorenzDataset, dict(file_path=None, input_keys=("states",), label_keys=("pred_states", "recover_states"), block_size=16, stride=32, ndata=4), "states", 2),
        (D.RosslerDataset, dict(file_path=None, input_keys=("states",), label_keys=("pred_states", "recover_states"), block_size=16, stride=32, ndata=4), "states", 2),
        (D.ENSODataset, dict(input_keys=("sst",), label_keys=("target",), in_len=4, out_len=6), "sst", 4),
        (D.DGMRDataset, dict(input_keys=("input",), label_keys=("output",), number=2), "input", 4),
        (D.RadarDataset, dict(input_keys=("input",), label_keys=("output",), total_length=12, input_length=4), "input", 4),
        (D.SEVIRDataset, dict(input_keys=("input",), label_keys=("output",), in_len=5, out_len=4, img_height=32, img_width=32), "input", 4),
        (D.FWIDataset, dict(input_keys=("data",), label_keys=("label",), num_samples=3), "data", 3),
        (D.PEMSDataset, dict(input_keys=("input",), label_keys=("label",), num_nodes=8), "input", 2),
        (D.SphericalSWEDataset, dict(input_keys=("input",), label_keys=("output",), num_samples=3, H=16, W=32), "input", 3),
        (D.MOlFLOWDataset, dict(num_samples=4), "nodes", 2),
    ],
)
def test_dataset_contract(cls, kw, inkey, rank):
    ds = cls(**kw)
    assert len(ds) > 0
    inp, label, _ = ds[0]
    assert np.asarray(inp[inkey]).ndim == rank
    assert all(np.isfinite(np.asarray(v)).all() for v in inp.values())
    if cls is not D.MOlFLOWDataset:  # flow training is unsupervised
        assert label


def test_graph_datasets():
    for cls in (D.MeshAirfoilDataset, D.MeshCylinderDataset):
        ds = cls(input_keys=("input",), label_keys=("label",), num_samples=2)
        (inp, label, _) = ds[0]
        nf, ef, s, r = inp["input"]
        assert nf.ndim == 2 and ef.ndim == 2 and len(s) == len(r) == len(ef)
        assert s.max() < len(nf)


def test_chip_heat_product_indexing():
    ds = D.ChipHeatDataset(
        input={"x": np.arange(3, dtype=np.float32).reshape(-1, 1),
               "y": np.arange(3, dtype=np.float32).reshape(-1, 1) + 10,
               "u": np.arange(2, dtype=np.float32).reshape(-1, 1) + 100,
               "u_one": np.arange(6, dtype=np.float32).reshape(-1, 1) + 1000},
        label={"T": np.zeros((1, 1), np.float32)}, index=("x", "u"), data_type="u")
    assert len(ds) == 6
    inp, _, _ = ds[5]  # x idx 5%3=2, u idx 5//3%2=1
    assert inp["x"][0] == 2 and inp["u"][0] == 101
    assert inp["y"][0] == 12  # y rides x index
    assert inp["u_one"][0] == 1000 + 2 * 2 + 1  # (len(u)*ix + iu)


def test_build_constraint_and_validator():
    geom_dict = {"rect": psci.geometry.Rectangle((0, 0), (1, 1))}
    eq_dict = {"laplace": psci.equation.Laplace(2)}
    cons = psci.constraint.build_constraint(
        {"dataloader": {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": 2},
         "content": [{"InteriorConstraint": {
             "output_expr": "laplace", "label_dict": {"laplace": 0}, "geom": "rect",
             "dataloader": {"batch_size": 32}, "loss": {"name": "MSELoss"}, "name": "EQ"}}]},
        eq_dict, geom_dict)
    assert type(cons["EQ"]).__name__ == "InteriorConstraint"

    vals = psci.validate.build_validator(
        {"dataloader": {"batch_size": 8},
         "content": [{"SupervisedValidator": {
             "dataloader": {"dataset": {"name": "NamedArrayDataset",
                 "input": {"x": np.random.rand(16, 1).astype(np.float32)},
                 "label": {"u": np.random.rand(16, 1).astype(np.float32)}}},
             "loss": {"name": "MSELoss"}, "metric": {"L2Rel": {"name": "L2Rel"}},
             "name": "sup"}}]},
        eq_dict, geom_dict)
    assert type(vals["sup"]).__name__ == "SupervisedValidator"


def test_visualizers(tmp_path):
    vw = psci.visualize.VisualizerWeather(
        {"x": np.zeros((1, 8, 8), np.float32)},
        {"pred": lambda d: d["pred"], "target": lambda d: d["target"]})
    vw.save(str(tmp_path / "w"), {"pred": np.random.rand(1, 8, 8), "target": np.random.rand(1, 8, 8)})
    vr = psci.visualize.VisualizerRadar({"x": np.zeros((4, 8, 8), np.float32)},
                                        {"frames": lambda d: d["frames"]})
    vr.save(str(tmp_path / "r"), {"frames": np.random.rand(4, 8, 8)})
    files = sorted(p.name for p in tmp_path.iterdir())
    assert files == ["r_frames.png", "w_t0.png"]


def test_sevir_real_catalog_layout(tmp_path):
    """SEVIR real multi-event layout (reference sevir_dataset.py:173-415):
    CATALOG.csv + data/*.h5 rasters indexed by file_index, pct_missing
    filtering, colocated-type grouping. Hand-built fixture, no network."""
    import h5py
    import numpy as np

    root = tmp_path / "sevir"
    (root / "data").mkdir(parents=True)
    H = W = 16
    T = 25
    rng = np.random.default_rng(0)
    # two files, three events (one filtered out by pct_missing)
    raw1 = (rng.random((2, H, W, T)) * 255).astype(np.uint8)
    raw2 = (rng.random((1, H, W, T)) * 255).astype(np.uint8)
    with h5py.File(root / "data" / "f1.h5", "w") as f:
        f.create_dataset("vil", data=raw1)
    with h5py.File(root / "data" / "f2.h5", "w") as f:
        f.create_dataset("vil", data=raw2)
    with open(root / "CATALOG.csv", "w") as f:
        f.write("id,img_type,file_name,file_index,time_utc,pct_missing\n")
        f.write("S1,vil,f1.h5,0,2019-01-01 00:00:00,0.0\n")
        f.write("S2,vil,f1.h5,1,2019-01-02 00:00:00,0.5\n")  # filtered out
        f.write("S3,vil,f2.h5,0,2019-01-03 00:00:00,0.0\n")

    from paddlescience_tpu.data.dataset.domain_dataset import SEVIRDataset

    ds = SEVIRDataset(("input",), ("target",), data_dir=str(root),
                      in_len=13, out_len=12, img_height=H, img_width=W)
    # 2 kept events, each yielding one (13 -> 12) window at T=25
    x = ds.input["input"]
    y = ds.label["target"]
    assert x.shape == (2, 13, H, W, 1) and y.shape == (2, 12, H, W, 1)
    # preprocess = scale * (raw + offset) with vil scale 1/47.54, offset -33.44
    expect = (1 / 47.54) * (np.transpose(raw1[0], (2, 0, 1))[:13].astype(np.float32) - 33.44)
    np.testing.assert_allclose(x[0, :, :, :, 0], expect, rtol=1e-5)
    # missing colocated type raises, not synthesizes
    import pytest
    with pytest.raises(FileNotFoundError):
        SEVIRDataset(("input",), ("target",), data_dir=str(root), data_types=("ir069",),
                     in_len=13, out_len=12, img_height=H, img_width=W)
