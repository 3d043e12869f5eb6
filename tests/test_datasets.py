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
