"""Op-level TPU profile of a PINN residual train step: jet vs fallback.

Traces a few steps of the Allen-Cahn-style residual + grad on the chosen
arch, parses the xplane directly with jax.profiler.ProfileData, and prints
per-op-category self-time so layout/fusion regressions are visible without
tensorboard. Usage:

    python tools/profile_ops.py [--arch piratenet|mlp] [--no-jet] [--batch 4096]
"""

import argparse
import collections
import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_loss(arch, batch, blocks, hidden):
    from paddlescience_tpu.arch.mlp import MLP, PirateNet
    from paddlescience_tpu.autodiff import ad
    from paddlescience_tpu.nn import core as nn_core
    from paddlescience_tpu.nn.core import Param, Rngs

    if arch == "piratenet":
        model = PirateNet(("t", "x"), ("u",), num_blocks=blocks, hidden_size=hidden,
                          fourier={"dim": hidden, "scale": 2.0},
                          random_weight={"mean": 0.5, "std": 0.1}, rngs=Rngs(0))
        for b in model.blocks:
            b.alpha = Param(jnp.asarray([0.3]))
    else:
        model = MLP(("t", "x"), ("u",), 4, hidden, fourier={"dim": hidden, "scale": 2.0}, rngs=Rngs(0))

    from paddlescience_tpu.utils import expression

    key = jax.random.PRNGKey(0)
    inp = {
        "t": jax.random.uniform(key, (batch, 1)),
        "x": jax.random.uniform(jax.random.fold_in(key, 1), (batch, 1)) * 2 - 1,
    }
    exprs = {
        "res": lambda out: ad.jacobian(out["u"], out["t"])
        - 0.0001 * ad.hessian(out["u"], out["x"])
        + 5.0 * out["u"] ** 3
        - 5.0 * out["u"]
    }
    _, params, buffers = nn_core.split(model)

    def loss(p):
        with jax.default_matmul_precision("default"):
            return nn_core.merge_call(
                model, p, buffers,
                lambda m: jnp.mean(expression.evaluate_expressions([m], inp, exprs)["res"] ** 2),
            )

    return model, params, loss


CATEGORIES = (
    ("matmul", ("dot", "convolution")),
    ("copy", ("copy", "transpose", "concatenate", "slice", "dynamic-update", "reshape", "bitcast", "pad", "gather", "scatter")),
    ("loop_fusion", ("loop_fusion",)),
    ("other_fusion", ("fusion",)),
)


def categorize(name):
    base = name.split(".")[0]
    for cat, keys in CATEGORIES:
        if any(k in base for k in keys):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="piratenet")
    ap.add_argument("--no-jet", action="store_true")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--blocks", type=int, default=9)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    model, params, loss = build_loss(args.arch, args.batch, args.blocks, args.hidden)
    if args.no_jet:
        type(model).supports_jet = lambda self: False

    g = jax.jit(jax.grad(loss))
    r = g(params)
    jax.block_until_ready(r)

    tmp = tempfile.mkdtemp(prefix="psci_prof_")
    with jax.profiler.trace(tmp):
        for _ in range(8):
            r = g(params)
        jax.block_until_ready(r)

    pb = sorted(glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True))[-1]
    pd = jax.profiler.ProfileData.from_serialized_xspace(open(pb, "rb").read())
    ops = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" != line.name:
                continue
            for ev in line.events:
                ops[ev.name] += ev.duration_ns
    total = sum(ops.values())
    if not total:
        print("no device op events found; planes:", [p.name for p in pd.planes])
        return
    cats = collections.Counter()
    for name, ns in ops.items():
        cats[categorize(name)] += ns
    print(f"arch={args.arch} jet={not args.no_jet} batch={args.batch} total_ns={total}")
    for cat, ns in cats.most_common():
        print(f"  {cat:14s} {ns/total:6.1%}")
    print(f"top {args.top} ops:")
    for name, ns in ops.most_common(args.top):
        print(f"  {ns/total:6.1%}  {name}")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
