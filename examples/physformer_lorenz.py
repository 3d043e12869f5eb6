"""Transformer-PhysX on the Lorenz system (reference
``examples/transformer_physx/train_transformer.py``): stage 1 trains a
Koopman embedding (see ``examples/lorenz_koopman.py``), stage 2 trains a
GPT2-style decoder over embedded state sequences and evaluates an
autoregressive rollout.

LorenzDataset generates RK4 trajectories when the published HDF5 archive is
absent; the embedding model is trained briefly here (the reference loads
stage-1 weights).
"""

import sys

import numpy as np

import paddlescience_tpu as psci

EMBED, BLOCK = 32, 16


def _pretrain_embedding(steps=60):
    """Quick stage-1 Koopman embedding (reference trains this separately)."""
    import jax
    import jax.numpy as jnp
    import optax

    model = psci.arch.LorenzEmbedding(
        ("states",), ("pred_states", "recover_states"),
        input_size=3, hidden_size=64, embed_size=EMBED)
    ds = psci.data.build_dataset({"name": "LorenzDataset", "file_path": None,
        "input_keys": ("states",), "label_keys": ("pred_states", "recover_states"),
        "block_size": BLOCK, "stride": 8, "ndata": 8})
    data = jnp.asarray(ds.input["states"])
    params = model.param_tree()
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply(p, {"states": data})
            mse1 = jnp.mean((out["pred_states"] - data[:, 1:]) ** 2)
            mse2 = jnp.mean((out["recover_states"] - data) ** 2)
            return mse1 + 10.0 * mse2
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(steps):
        params, opt, loss = step(params, opt)
    model.load_param_tree(params)
    print(f"stage-1 embedding loss: {float(loss):.4f}")
    return model


def build_solver(epochs=4, output_dir="./output_physformer_lorenz", embedding_model=None):
    psci.utils.set_random_seed(0)
    if embedding_model is None:
        embedding_model = _pretrain_embedding()
    model = psci.arch.PhysformerGPT2(
        ("embeds",), ("pred_embeds",),
        num_layers=2, num_ctx=BLOCK, embed_size=EMBED, num_heads=4)
    dl = {
        "dataset": {"name": "LorenzDataset", "file_path": None,
                    "input_keys": ("embeds",), "label_keys": ("pred_embeds",),
                    "block_size": BLOCK, "stride": 8, "ndata": 8,
                    "embedding_model": embedding_model},
        "batch_size": 8,
        "sampler": {"name": "BatchSampler", "shuffle": True, "drop_last": True},
    }
    sup = psci.constraint.SupervisedConstraint(
        dl, psci.loss.MSELoss("mean"),
        {"pred_embeds": lambda out: out["pred_embeds"][:, :-1]}, name="Sup")
    validator = psci.validate.SupervisedValidator(
        {**dl, "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
        psci.loss.MSELoss("mean"),
        output_expr={"pred_embeds": lambda out: out["pred_embeds"][:, :-1]},
        metric={"MSE": psci.metric.MSE()}, name="lorenz_valid")
    lr = psci.optimizer.lr_scheduler.Cosine(
        epochs=epochs, iters_per_epoch=4, learning_rate=1e-3)()
    return psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.Adam(lr)(model),
        epochs=epochs, iters_per_epoch=4,
        validator={"lorenz_valid": validator}, eval_during_train=False, log_freq=4)
def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/physformer_lorenz.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
