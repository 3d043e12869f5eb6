"""Transformer for symbolic regression (reference
``examples/transformer4sr/transformer4sr.py``).

Encoder-decoder transformer mapping observed (x, y) tables to the prefix
token sequence of the generating expression. The reference's SRSD/synthetic
formula corpus is replaced (when no corpus file is given) by sampled random
prefix expressions over the vocab {add, mul, sin, cos, x, c}; numeric
tables are quantized into source tokens (our Transformer arch embeds token
ids). Metrics: teacher-forced next-token accuracy — the reference's
inaccuracy metric inverted.
"""

from __future__ import annotations

import numpy as np

import paddlescience_tpu as psci

VOCAB = ["PAD", "SOS", "add", "mul", "sin", "cos", "x", "c"]
PAD, SOS = 0, 1
TGT_LEN = 8
N_POINTS = 24
N_BINS = 64


def sample_expr(rng):
    """Random prefix expression of depth <= 2; returns (tokens, fn)."""
    def leaf():
        if rng.random() < 0.7:
            return (["x"], lambda x, c: x)
        return (["c"], lambda x, c: np.full_like(x, c))

    def unary(sub):
        op = rng.choice(["sin", "cos"])
        t, f = sub
        g = np.sin if op == "sin" else np.cos
        return ([op] + t, lambda x, c, f=f, g=g: g(f(x, c)))

    def binary(a, b):
        op = rng.choice(["add", "mul"])
        ta, fa = a
        tb, fb = b
        h = (lambda u, v: u + v) if op == "add" else (lambda u, v: u * v)
        return ([op] + ta + tb, lambda x, c, fa=fa, fb=fb, h=h: h(fa(x, c), fb(x, c)))

    r = rng.random()
    if r < 0.3:
        e = unary(leaf())
    elif r < 0.7:
        e = binary(leaf(), leaf())
    else:
        e = binary(unary(leaf()), leaf())
    return e


def make_dataset(n, seed=0):
    rng = np.random.default_rng(seed)
    xs = np.linspace(-2, 2, N_POINTS).astype("float32")
    src, tgt = [], []
    for _ in range(n):
        tokens, fn = sample_expr(rng)
        cval = float(rng.uniform(-2, 2))
        y = fn(xs, cval)
        y = np.clip(y, -4, 4)
        # quantize the y-table into source tokens (x grid is fixed/shared)
        q = np.clip(((y + 4) / 8 * (N_BINS - 1)).astype(np.int64), 0, N_BINS - 1)
        src.append(q)
        ids = [VOCAB.index(t) for t in tokens][: TGT_LEN - 1]
        tgt.append([SOS] + ids + [PAD] * (TGT_LEN - 1 - len(ids)))
    return np.stack(src), np.asarray(tgt, np.int64)


def _xent(out, label, weight=None):
    import jax
    import jax.numpy as jnp

    logits = out["logits"][:, :-1]  # predict tokens 1..L from prefix
    targets = label["tokens"][:, 1:].astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != PAD).astype(jnp.float32)
    return {"xent": jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)}


def _token_acc(out, label):
    import jax.numpy as jnp

    pred = jnp.argmax(out["logits"][:, :-1], axis=-1)
    targets = label["tokens"][:, 1:].astype(jnp.int32)
    mask = (targets != PAD).astype(jnp.float32)
    acc = jnp.sum((pred == targets).astype(jnp.float32) * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return {"token_acc": acc}


def build_solver(epochs=50, iters_per_epoch=10, output_dir="./outputs_transformer4sr",
                 n_train=2048, n_test=256, batch_size=64, d_model=128,
                 num_heads=4, num_layers=2, learning_rate=5e-4):
    psci.utils.set_random_seed(42)
    src_tr, tgt_tr = make_dataset(n_train, seed=0)
    src_te, tgt_te = make_dataset(n_test, seed=1)
    model = psci.arch.Transformer(
        ("src", "tgt"), ("logits",),
        src_vocab_size=N_BINS, tgt_vocab_size=len(VOCAB),
        d_model=d_model, num_heads=num_heads, num_layers=num_layers,
        d_ff=4 * d_model, max_len=max(N_POINTS, TGT_LEN),
    )
    sup = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "NamedArrayDataset",
                     "input": {"src": src_tr, "tgt": tgt_tr},
                     "label": {"tokens": tgt_tr}},
         "batch_size": batch_size, "iters_per_epoch": iters_per_epoch,
         "sampler": {"name": "BatchSampler", "shuffle": True, "drop_last": True}},
        psci.loss.FunctionalLoss(_xent),
        {"logits": lambda out: out["logits"]},
        name="Sup",
    )
    validator = {
        "sr_valid": psci.validate.SupervisedValidator(
            {"dataset": {"name": "NamedArrayDataset",
                         "input": {"src": src_te, "tgt": tgt_te},
                         "label": {"tokens": tgt_te}},
             "total_size": n_test, "batch_size": n_test,
             "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
            psci.loss.FunctionalLoss(_xent),
            {"logits": lambda out: out["logits"]},
            metric={"Acc": psci.metric.FunctionalMetric(_token_acc)},
            name="sr_valid",
        )
    }
    # Noam-style warmup LR (reference transformer4sr.py lr_lambda)
    lr = psci.optimizer.lr_scheduler.Cosine(
        epochs=epochs, iters_per_epoch=iters_per_epoch,
        learning_rate=learning_rate, warmup_epoch=max(epochs // 10, 1))()
    return psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.Adam(lr)(model),
        epochs=epochs, iters_per_epoch=iters_per_epoch,
        eval_during_train=False, validator=validator,
    )


def main_cli():
    import _runner

    @psci.utils.config.main("conf/transformer4sr.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
