"""2-process x 4-device CPU simulation of multi-host training + eval gather.

Validates the multi-process path (reference fleet collective mode,
``ppsci/solver/solver.py:299-412``) without a TPU pod: two host processes
connect through ``jax.distributed.initialize`` on localhost, each owning 4
virtual CPU devices; the solver trains one step over the global
mesh(data=8) and ``Solver.eval`` all-gathers rank-strided validator shards
before computing metrics (VERDICT r1 item 4).

Launcher:  python tools/multiprocess_sim.py
Worker:    python tools/multiprocess_sim.py worker <proc_id> <port>
"""

from __future__ import annotations

import os
import subprocess
import sys

N_PROC = 2
DEV_PER_PROC = 4


def worker(proc_id: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
    )
    os.environ["PSCI_DISABLE_COMPILE_CACHE"] = "1"  # CPU AOT cache is host-specific
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", None)
    from paddlescience_tpu.parallel import distributed

    distributed.init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=N_PROC,
        process_id=proc_id,
    )
    assert jax.process_count() == N_PROC
    assert jax.device_count() == N_PROC * DEV_PER_PROC

    import numpy as np

    import paddlescience_tpu as psci
    from paddlescience_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.make_mesh(data=N_PROC * DEV_PER_PROC, model=1)
    mesh_mod.set_default_mesh(mesh)

    psci.utils.set_random_seed(0)
    model = psci.arch.MLP(("x",), ("u",), 2, 16)
    n = 64
    xs = np.linspace(0, 1, n, dtype="float32").reshape(-1, 1)
    ys = np.sin(xs).astype("float32")
    sup = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "NamedArrayDataset", "input": {"x": xs}, "label": {"u": ys}},
         "batch_size": 32, "iters_per_epoch": 1,
         "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
        psci.loss.MSELoss("mean"), name="Sup")
    validator = {
        "val": psci.validate.SupervisedValidator(
            {"dataset": {"name": "NamedArrayDataset", "input": {"x": xs}, "label": {"u": ys}},
             "total_size": n, "batch_size": 16,
             "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
            psci.loss.MSELoss("mean"),
            metric={"L2Rel": psci.metric.L2Rel()},
            name="val",
        )
    }
    solver = psci.solver.Solver(
        model, {"Sup": sup}, f"/tmp/psci_mpsim_{proc_id}",
        psci.optimizer.Adam(1e-3)(model),
        epochs=2, iters_per_epoch=1, validator=validator, mesh=mesh,
    )
    solver.train()
    metric, group = solver.eval()
    # sharded predict: rank-strided shard + allgather + inverse permutation
    # must reproduce the single-process full forward exactly (the per-rank
    # shards evaluate disjoint rows of the same jitted fn; n=63 exercises
    # the pad-and-trim path)
    pred_in = {"x": xs[:63]}
    pred = solver.predict(pred_in, batch_size=16, return_numpy=True)["u"]
    with solver.model.bind(solver.state["params"], solver.state["rest"]):
        full = np.asarray(solver.model({"x": np.asarray(pred_in["x"])})["u"])
    predict_ok = pred.shape == (63, 1) and np.allclose(pred, full, atol=1e-6)
    # both processes must agree bit-for-bit (same global arrays + allgather)
    print(f"MPSIM proc={proc_id} metric={metric:.6f} predict_ok={predict_ok} "
          f"losses={[round(l, 6) for _, l in solver.loss_history]}", flush=True)


def launch() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = ""
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker", str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(N_PROC)
    ]
    outs = []
    code = 0
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
        code |= p.returncode
    lines = [ln for out in outs for ln in out.splitlines() if ln.startswith("MPSIM")]
    for ln in lines:
        print(ln)
    if code != 0 or len(lines) != N_PROC:
        print("\n".join(outs))
        return 1
    metrics = {ln.split("metric=")[1] for ln in lines}
    if len(metrics) != 1:
        print("processes disagree:", lines)
        return 1
    if any("predict_ok=True" not in ln for ln in lines):
        print("sharded predict mismatch:", lines)
        return 1
    print("multiprocess_sim OK: 2 processes x 4 devices, eval gather + "
          "sharded predict consistent")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        sys.exit(launch())
