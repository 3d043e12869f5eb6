"""One-shot conversion of the example suite to the YAML-config +
mode={train,eval,export,infer} contract (VERDICT r1 item 1). Rewrites each
example's __main__ tail and generates conf/<case>.yaml from the builder
signature. Intended to be run once and deleted-or-kept as a dev tool."""

import importlib
import inspect
import os
import re
import sys

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EX = os.path.join(REPO, "examples")
sys.path.insert(0, REPO)
sys.path.insert(0, EX)

# case -> (category, report_body or None)
#   A: standard solver; B: solver + custom post-train report; C: custom main(steps)
CASES = {
    "laplace2d": ("A", None),
    "cylinder2d_unsteady": ("A", None),
    "darcy2d": ("A", None),
    "darcy_tfno": ("A", None),
    "deepcfd_unetex": ("A", None),
    "deeponet": ("A", None),
    "earthformer_enso": ("A", None),
    "epnn_elastoplastic": ("A", None),
    "euler_beam": ("A", None),
    "heat_exchanger": ("A", None),
    "ldc2d_steady": ("A", None),
    "lorenz_koopman": ("A", None),
    "physformer_lorenz": ("A", None),
    "sfno_swe": ("A", None),
    "spinn_helmholtz3d": ("A", None),
    "tgcn_pems": ("A", None),
    "volterra_ide": ("A", None),
    "viv": ("A", None),
    "fourcastnet": ("A", None),
    "aneurysm_flow": ("B", '''
    probe = {"x": np.zeros((16, 1), np.float32), "y": np.zeros((16, 1), np.float32),
             "z": np.linspace(0.2, L - 0.2, 16, dtype=np.float32).reshape(-1, 1)}
    pred = solver.predict(probe, return_numpy=True)
    print(f"centerline w: mean {pred['w'].mean():.3f} (inlet plug 0.5, expect positive axial flow)")
    return float(pred["w"].mean())
'''),
    "biharmonic2d": ("B", '''
    x, y = np.meshgrid(np.linspace(0, A, 32), np.linspace(0, A, 32), indexing="ij")
    pred = solver.predict({"x": x.reshape(-1, 1).astype(np.float32),
                           "y": y.reshape(-1, 1).astype(np.float32)}, return_numpy=True)["u"]
    truth = w_exact(x.reshape(-1, 1), y.reshape(-1, 1))
    l2 = float(np.linalg.norm(pred - truth) / np.linalg.norm(truth))
    print(f"biharmonic plate L2Rel vs Navier solution: {l2:.4f}")
    return l2
'''),
    "bracket_elasticity": ("B", '''
    pred = solver.predict(
        {"x": np.full((16, 1), 2.0, np.float32),
         "y": np.full((16, 1), 0.25, np.float32),
         "z": np.linspace(0, 0.5, 16, dtype=np.float32).reshape(-1, 1)},
        return_numpy=True,
    )
    print(f"tip w mean = {pred['w'].mean():.4e} (should be < 0 under downward load)")
    return float(pred["w"].mean())
'''),
    "burgers": ("B", '''
    t_ref, x_ref, u_ref = solve_burgers_spectral()
    T, X = np.meshgrid(t_ref, x_ref, indexing="ij")
    pred = solver.predict({"t": T.reshape(-1, 1).astype(np.float32),
                           "x": X.reshape(-1, 1).astype(np.float32)}, return_numpy=True)["u"]
    l2 = float(np.linalg.norm(pred.ravel() - u_ref.ravel()) / np.linalg.norm(u_ref))
    print(f"Burgers L2Rel vs spectral reference: {l2:.4f}")
    return l2
'''),
    "nlsmb_rogue_wave": ("B", '''
    t, x = np.meshgrid(np.linspace(-0.5, 0.5, 32), np.linspace(-0.5, 0.5, 64), indexing="ij")
    pred = solver.predict({"t": t.reshape(-1, 1).astype(np.float32),
                           "x": x.reshape(-1, 1).astype(np.float32)}, return_numpy=True)
    truth = _rogue(t.reshape(-1, 1), x.reshape(-1, 1))
    l2 = np.sqrt(sum(np.sum((pred[k] - truth[k]) ** 2) for k in truth)
                 / sum(np.sum(truth[k] ** 2) for k in truth))
    print(f"NLS-MB rogue wave combined L2Rel: {l2:.4f}")
    return float(l2)
'''),
    "nlsmb_soliton": ("B", '''
    t, x = np.meshgrid(np.linspace(-1, 1, 32), np.linspace(-1, 1, 64), indexing="ij")
    pred = solver.predict({"t": t.reshape(-1, 1).astype(np.float32),
                           "x": x.reshape(-1, 1).astype(np.float32)}, return_numpy=True)
    truth = _soliton(t.reshape(-1, 1), x.reshape(-1, 1))
    l2 = np.sqrt(sum(np.sum((pred[k] - truth[k]) ** 2) for k in truth)
                 / sum(np.sum(truth[k] ** 2) for k in truth))
    print(f"NLS-MB soliton combined L2Rel: {l2:.4f}")
    return float(l2)
'''),
    "poiseuille_flow": ("B", '''
    y = np.linspace(-R_CH, R_CH, 64, dtype=np.float32).reshape(-1, 1)
    pred = solver.predict({"x": np.full_like(y, L_CH / 2), "y": y}, return_numpy=True)["u"]
    truth = u_exact(y)
    l2 = float(np.linalg.norm(pred - truth) / np.linalg.norm(truth))
    print(f"Poiseuille u-profile L2Rel vs parabola: {l2:.4f} "
          f"(max u: pred {pred.max():.4f}, exact {truth.max():.4f})")
    return l2
'''),
    "shock_wave": ("B", '''
    x = np.linspace(0, 1, 64, dtype=np.float32).reshape(-1, 1)
    probe = {"x": x, "y": np.full_like(x, 0.125), "t": np.zeros_like(x)}
    rho0 = solver.predict(probe, return_numpy=True)["rho"]
    print(f"shock tube: rho(left)={rho0[:16].mean():.3f} (true 1.0), "
          f"rho(right)={rho0[-16:].mean():.3f} (true 0.125)")
    return float(rho0[:16].mean())
'''),
    "nowcastnet_radar": ("B", '''
    import os as _os
    ds = psci.data.build_dataset({"name": "RadarDataset", "input_keys": ("input",),
        "label_keys": ("output",), "image_width": W, "image_height": H,
        "total_length": TOTAL, "input_length": IN_LEN})
    x = ds.input["input"][:1]
    pred = solver.predict({"input": x}, return_numpy=True)["output"]
    vis = psci.visualize.VisualizerRadar({"input": x}, {"pred": lambda d: d["pred"]})
    vis.save(_os.path.join(solver.output_dir or ".", "nowcast"), {"pred": pred[0, :, :, :, 0]})
    print(f"nowcastnet: predicted {pred.shape[1]} frames, strip saved")
    return float(np.abs(pred).mean())
'''),
    # category C: bespoke loops — main(steps) wired as the train mode
    "amgnet_airfoil": ("C", None),
    "brusselator3d_lno": ("C", None),
    "cgcnn_property": ("C", None),
    "moflow_qm9": ("C", None),
    "phycrnet_burgers": ("C", None),
    "phylstm_seismic": ("C", None),
    "velocitygan_fwi": ("C", None),
    "hmc_bayes": ("C", None),
    "export_and_infer": ("C", None),
    "tempogan_lite": ("C2", None),  # train(epochs) instead of main(steps)
}

TAIL_A = '''

def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/{case}.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
'''

TAIL_B = '''

def _report(solver):{report}

def main_cli():
    import paddlescience_tpu as psci

    import _runner

    def _build(cfg):
        return _runner.build_from_cfg(cfg, build_solver)

    def _train(cfg):
        solver, _ = _runner._unwrap(_build(cfg))
        solver.train()
        return _report(solver)

    def _evaluate(cfg):
        solver, _ = _runner._unwrap(_build(cfg))
        path = cfg.get_path("EVAL.pretrained_model_path")
        if path:
            solver.load_pretrain(path)
        return _report(solver)

    @psci.utils.config.main("conf/{case}.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=_train, evaluate=_evaluate,
            export=lambda c: _runner.export(c, _build),
            inference=lambda c: _runner.inference(c, _build))

    return _main()


if __name__ == "__main__":
    main_cli()
'''

TAIL_C = '''

def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/{case}.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=lambda c: {entry}(c.TRAIN.{arg}))

    return _main()


if __name__ == "__main__":
    main_cli()
'''

YAML_HEAD = """# {case} (TPU-native PaddleScience example contract)
mode: train  # train | eval | export | infer
seed: 42
output_dir: null
log_freq: 100

TRAIN:
{train_block}  pretrained_model_path: null
  checkpoint_path: null

EVAL:
  pretrained_model_path: null
  compute_metric_by_batch: false

INFER:
  pretrained_model_path: null
  export_path: ./inference/{case}
  batch_size: 1024
"""


def yaml_value(v):
    if v is None:
        return "null"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, str):
        return v
    return repr(v)


def main():
    os.makedirs(os.path.join(EX, "conf"), exist_ok=True)
    for case, (cat, report) in CASES.items():
        path = os.path.join(EX, f"{case}.py")
        src = open(path).read()
        mod = importlib.import_module(case)

        if cat in ("A", "B"):
            builder = mod.build_solver
            sig = inspect.signature(builder)
            lines = []
            for name, p in sig.parameters.items():
                if name in ("output_dir", "with_validator"):
                    continue
                if p.default is inspect.Parameter.empty:
                    continue
                lines.append(f"  {name}: {yaml_value(p.default)}\n")
            train_block = "".join(lines)
        else:
            entry = "train" if cat == "C2" else "main"
            fn = getattr(mod, entry)
            sig = inspect.signature(fn)
            arg = next(iter(sig.parameters))
            default = sig.parameters[arg].default
            if default is inspect.Parameter.empty:
                default = 100
            train_block = f"  {arg}: {yaml_value(default)}\n"

        # strip the old __main__ tail
        m = re.search(r'\nif __name__ == .__main__.:', src)
        assert m, case
        src = src[: m.start()] + "\n"

        if cat == "A":
            tail = TAIL_A.format(case=case)
        elif cat == "B":
            body = report.rstrip("\n")
            tail = TAIL_B.format(case=case, report=body)
        else:
            entry = "train" if cat == "C2" else "main"
            sig = inspect.signature(getattr(mod, entry))
            arg = next(iter(sig.parameters))
            tail = TAIL_C.format(case=case, entry=entry, arg=arg)

        open(path, "w").write(src.rstrip("\n") + "\n" + tail.lstrip("\n"))
        open(os.path.join(EX, "conf", f"{case}.yaml"), "w").write(
            YAML_HEAD.format(case=case, train_block=train_block))
        print("converted", case, cat)


if __name__ == "__main__":
    main()
