"""DeepPhyLSTM: physics-informed LSTM for seismic structural response
(reference ``examples/phylstm/phylstm2.py`` / ``phylstm3.py`` via
``model_type``).

Model type 2: LSTM predicts (displacement eta, velocity eta_dot, restoring
force g) from ground acceleration; the physics loss couples them through
the equation of motion eta_tt + eta_dot + g = -ag using the spectral
differentiation matrix phi. Model type 3 adds the hysteresis consistency
term: a third LSTM predicts g_dot from (eta_dot, eta) and the loss drives
phi @ g - g_dot -> 0 (reference ``functions.py:train_loss_func3``).
Synthetic Bouc-Wen-like responses stand in for the (non-downloadable)
earthquake records.
"""

import sys

import numpy as np

import paddlescience_tpu as psci

T, N_SAMPLES = 32, 16


def _synthetic_records(n=N_SAMPLES, seed=0):
    """Damped SDOF responses to random pulse trains (linear proxy truth)."""
    rng = np.random.default_rng(seed)
    dt = 0.02
    ag = np.zeros((n, T, 1), np.float32)
    eta = np.zeros((n, T, 1), np.float32)
    for s in range(n):
        a = np.zeros(T)
        for _ in range(3):
            t0 = rng.integers(0, T - 4)
            a[t0 : t0 + 4] += rng.normal(0, 5)
        x = v = 0.0
        for t in range(T):
            acc = -a[t] - 2 * 0.05 * 2 * np.pi * v - (2 * np.pi) ** 2 * x
            v += dt * acc
            x += dt * v
            ag[s, t, 0] = a[t]
            eta[s, t, 0] = x
    # spectral differentiation matrix (reference builds it from FFT)
    k = np.fft.fftfreq(T, d=dt) * 2j * np.pi
    F = np.fft.fft(np.eye(T), axis=0)
    Finv = np.fft.ifft(np.eye(T), axis=0)
    phi = np.real(Finv @ np.diag(k) @ F).astype(np.float32)
    return ag, eta, phi[None]


def main(steps=80, model_type=2):
    import jax
    import jax.numpy as jnp
    import optax

    psci.utils.set_random_seed(0)
    ag, eta, phi = _synthetic_records()
    model = psci.arch.DeepPhyLSTM(input_size=1, output_size=1, hidden_size=32,
                                  model_type=model_type)
    inp = {"ag": jnp.asarray(ag), "ag_c": jnp.asarray(ag), "phi": jnp.asarray(phi)}
    eta_t = jnp.asarray(eta)
    params = model.param_tree()
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply(p, inp)
            data = jnp.mean((out["eta_pred"] - eta_t) ** 2)
            # physics: eta_t (from phi) must match predicted velocity
            phys = jnp.mean((out["eta_t_pred_c"] - out["eta_dot_pred_c"]) ** 2)
            if model_type == 3:
                # hysteresis: phi @ g must match the g-LSTM's g_dot
                # (the arch returns their difference; functions.py:94)
                phys = phys + jnp.mean(out["g_t_pred_c"] ** 2)
            return data + phys
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = last = None
    for it in range(steps):
        params, opt, loss = step(params, opt)
        if it == 0:
            first = float(loss)
        last = float(loss)
    print(f"DeepPhyLSTM loss: {first:.6f} -> {last:.6f} over {steps} steps")
    assert last < first
    return last
def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/phylstm_seismic.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=lambda c: main(c.TRAIN.steps,
                                      model_type=c.TRAIN.get("model_type", 2)))

    return _main()


if __name__ == "__main__":
    main_cli()
