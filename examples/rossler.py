"""Transformer-PhysX on the Rossler system (reference
``examples/rossler/train_enn.py`` + ``train_transformer.py``).

stage=enn trains the Koopman embedding network alone (reference
train_enn.py); stage=transformer (default) trains the embedding briefly and
then a GPT2-style decoder over embedded Rossler state sequences (reference
train_transformer.py). RosslerDataset integrates the a=0.2, b=0.2, c=5.7
attractor with RK4 when the published HDF5 archive is absent.
"""

from __future__ import annotations

import numpy as np

import paddlescience_tpu as psci

EMBED, BLOCK = 32, 16


def train_embedding(epochs=20, iters_per_epoch=4, output_dir="./outputs_rossler",
                    ndata=8, learning_rate=1e-3):
    psci.utils.set_random_seed(0)
    model = psci.arch.RosslerEmbedding(
        ("states",), ("pred_states", "recover_states"),
        input_size=3, hidden_size=64, embed_size=EMBED)
    dl = {
        "dataset": {"name": "RosslerDataset", "file_path": None,
                    "input_keys": ("states",), "label_keys": ("pred_states", "recover_states"),
                    "block_size": BLOCK, "stride": 8, "ndata": ndata},
        "batch_size": 8, "iters_per_epoch": iters_per_epoch,
        "sampler": {"name": "BatchSampler", "shuffle": True, "drop_last": True},
    }
    sup = psci.constraint.SupervisedConstraint(
        dl, psci.loss.MSELoss("mean"),
        {"pred_states": lambda out: out["pred_states"],
         "recover_states": lambda out: out["recover_states"]},
        name="Sup")
    validator = psci.validate.SupervisedValidator(
        {**dl, "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
        psci.loss.MSELoss("mean"),
        metric={"MSE": psci.metric.MSE()}, name="rossler_embed_valid")
    solver = psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.Adam(learning_rate)(model),
        epochs=epochs, iters_per_epoch=iters_per_epoch,
        validator={"rossler_embed_valid": validator},
        eval_during_train=False, log_freq=4)
    solver.train()  # train() syncs final params/buffers back into `model`
    metric, group = solver.eval()
    return model, metric, group


def build_transformer(embedding_model, epochs=20, iters_per_epoch=4,
                      output_dir="./outputs_rossler", ndata=8, learning_rate=1e-3):
    model = psci.arch.PhysformerGPT2(
        ("embeds",), ("pred_embeds",),
        num_layers=2, num_ctx=BLOCK, embed_size=EMBED, num_heads=4)
    dl = {
        "dataset": {"name": "RosslerDataset", "file_path": None,
                    "input_keys": ("embeds",), "label_keys": ("pred_embeds",),
                    "block_size": BLOCK, "stride": 8, "ndata": ndata,
                    "embedding_model": embedding_model},
        "batch_size": 8, "iters_per_epoch": iters_per_epoch,
        "sampler": {"name": "BatchSampler", "shuffle": True, "drop_last": True},
    }
    sup = psci.constraint.SupervisedConstraint(
        dl, psci.loss.MSELoss("mean"),
        {"pred_embeds": lambda out: out["pred_embeds"][:, :-1]}, name="Sup")
    validator = psci.validate.SupervisedValidator(
        {**dl, "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
        psci.loss.MSELoss("mean"),
        output_expr={"pred_embeds": lambda out: out["pred_embeds"][:, :-1]},
        metric={"MSE": psci.metric.MSE()}, name="rossler_valid")
    lr = psci.optimizer.lr_scheduler.Cosine(
        epochs=epochs, iters_per_epoch=iters_per_epoch, learning_rate=learning_rate)()
    return psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.Adam(lr)(model),
        epochs=epochs, iters_per_epoch=iters_per_epoch,
        validator={"rossler_valid": validator}, eval_during_train=False, log_freq=4)


def main_cli():
    import _runner

    @psci.utils.config.main("conf/rossler.yaml")
    def _main(cfg):
        def train(c):
            emb, metric, group = train_embedding(
                epochs=c.TRAIN.enn_epochs, iters_per_epoch=c.TRAIN.iters_per_epoch,
                output_dir=(c.get("output_dir") or "./outputs_rossler"),
                ndata=c.ndata, learning_rate=c.TRAIN.learning_rate)
            _runner._print_metrics("enn", metric, group)
            if c.stage == "enn":
                return metric
            solver = build_transformer(
                emb, epochs=c.TRAIN.epochs, iters_per_epoch=c.TRAIN.iters_per_epoch,
                output_dir=(c.get("output_dir") or "./outputs_rossler"),
                ndata=c.ndata, learning_rate=c.TRAIN.learning_rate)
            solver.train()
            metric, group = solver.eval()
            _runner._print_metrics("transformer", metric, group)
            return metric

        return psci.utils.config.dispatch(cfg, train=train)

    return _main()


if __name__ == "__main__":
    main_cli()
