"""Expression evaluator — the fused forward pass.

TPU-native counterpart of reference ``ppsci/utils/expression.py:60-212``
(``ExpressionSolver.train_forward/eval_forward/visu_forward``). Instead of a
``@jit.to_static``-decorated object walking a node list, this is a plain pure
function: model forwards, derivative stacks, expression evaluation and losses
all trace into the caller's single jitted program — the whole train step is
one XLA executable, the reference's per-constraint Python dispatch disappears.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp

from paddlescience_tpu.autodiff import ad

__all__ = ["forward_with_derivatives", "evaluate_expressions"]


def _raw_forward(model, feed):
    """Model forward with the registered output transform disabled."""
    saved = model._output_transform
    model._output_transform = None
    try:
        return model(feed)
    finally:
        model._output_transform = saved


def _forward_transform_on_tape(model, input_dict, tape: ad.Tape) -> Dict[str, jnp.ndarray]:
    """Forward for a model whose output transform itself differentiates (the
    stream-function transforms of reference ``bubble.py:96-104`` /
    ``fsi/viv.py``, or transforms that rename outputs): run the *raw* net as a
    derivative stack, hand the transform TapeArray views so array-level
    ``jacobian``/``hessian`` work inside it, then register the transformed
    outputs as a derived stack so downstream equations can differentiate them
    further. Everything stays one jit trace."""
    in_keys = tuple(model.input_keys)
    diff_keys = [k for k in in_keys if input_dict[k].ndim == 2 and input_dict[k].shape[-1] == 1]
    extra_keys = [k for k in in_keys if k not in diff_keys]
    if not diff_keys:
        raise ValueError(
            f"model {type(model).__name__} has a derivative-using output "
            "transform but no (N,1) coordinate inputs to differentiate against"
        )
    feed = {k: input_dict[k] for k in in_keys}
    raw_out = _raw_forward(model, feed)
    x = jnp.concatenate([input_dict[k] for k in diff_keys], axis=-1)
    extras = {k: input_dict[k] for k in extra_keys}
    key_index = {k: i for i, k in enumerate(diff_keys)}

    raw_keys = tuple(raw_out.keys())
    out_index, ofs = {}, 0
    for k in raw_keys:
        out_index[k] = ofs
        ofs += int(raw_out[k].shape[-1])

    def raw_pointwise(xvec, extras_pt, _m=model, _dk=tuple(diff_keys), _rk=raw_keys):
        feed_pt = {k: xvec[i : i + 1] for i, k in enumerate(_dk)}
        feed_pt.update(extras_pt)
        o = _raw_forward(_m, feed_pt)
        return jnp.concatenate([o[k] for k in _rk], axis=-1)

    stack = tape.add_stack(raw_pointwise, x, key_index, out_index, extras=extras, out_width=ofs)

    wrapped_out: Dict[str, object] = {}
    for k in raw_keys:
        arr = raw_out[k]
        tape.register_output(arr, stack, out_index[k])
        w = int(arr.shape[-1])

        def pf(xvec, ex, _c=out_index[k], _w=w):
            return raw_pointwise(xvec, ex)[_c : _c + _w]

        wrapped_out[k] = ad.TapeArray(arr, pf, stack)
    wrapped_in: Dict[str, object] = {}
    for k in in_keys:
        v = input_dict[k]
        if k in key_index:
            wrapped_in[k] = ad.TapeArray(v, (lambda xv, ex, _i=key_index[k]: xv[_i : _i + 1]), stack)
        else:
            wrapped_in[k] = v

    transformed = model._output_transform(wrapped_in, wrapped_out)

    result: Dict[str, jnp.ndarray] = {}
    tracked = [(k, v) for k, v in transformed.items()
               if isinstance(v, ad.TapeArray) and v.stack is stack]
    if tracked:
        t_index, ofs, pfs = {}, 0, []
        for k, v in tracked:
            t_index[k] = ofs
            ofs += int(v.value.shape[-1])
            pfs.append(v.pf)

        def t_fn(xvec, ex, _pfs=tuple(pfs)):
            return jnp.concatenate([p(xvec, ex) for p in _pfs], axis=-1)

        tstack = tape.add_stack(t_fn, x, key_index, t_index, extras=extras, out_width=ofs)
        for k, v in tracked:
            tape.register_output(v.value, tstack, t_index[k])
            result[k] = v.value
    for k, v in transformed.items():
        if k not in result:
            result[k] = ad.unwrap(v)
    return result


def forward_with_derivatives(
    models: Sequence,
    input_dict: Mapping[str, jnp.ndarray],
    tape: ad.Tape,
) -> Dict[str, jnp.ndarray]:
    """Run each model on the constraint inputs and register everything on the
    tape so array-level ``jacobian``/``hessian`` work on the results.

    Returns an ``out`` dict containing the input coordinates plus all model
    outputs. Order-0 values come from a single batched forward (one MXU
    matmul chain); derivative stacks are created lazily per model.
    """
    out: Dict[str, jnp.ndarray] = {}
    for k, v in input_dict.items():
        tape.register_coord(k, v)
        out[k] = v

    for model in models:
        in_keys = tuple(model.input_keys)
        missing = [k for k in in_keys if k not in input_dict]
        if missing:
            if getattr(model, "_input_transform", None) is not None:
                # the registered input transform maps constraint inputs to the
                # model's declared feature keys (reference deephpms
                # burgers.py:84-90): feed everything, differentiate w.r.t.
                # the constraint coordinates
                in_keys = tuple(k for k in input_dict if k not in ("area", "sdf"))
            else:
                raise KeyError(
                    f"model inputs {missing} not found in constraint inputs {list(input_dict)}"
                )

        # batched forward for the values themselves; output transforms that
        # call jacobian/hessian (or rename outputs) are lifted to tape level
        feed = {k: input_dict[k] for k in in_keys}
        transform = getattr(model, "_output_transform", None)
        batched_out, tape_level = None, False
        has_coord_cols = any(
            input_dict[k].ndim == 2 and input_dict[k].shape[-1] == 1 for k in in_keys
        )
        if transform is not None:
            try:
                batched_out = model(feed)
                # renamed outputs of a coordinate model need re-registration
                # so downstream equations can differentiate them
                tape_level = has_coord_cols and set(batched_out) != set(model.output_keys)
            except (ValueError, RuntimeError) as e:
                if "tape" not in str(e).lower():
                    raise
                tape_level = True  # transform itself calls jacobian/hessian
        if tape_level:
            out.update(_forward_transform_on_tape(model, input_dict, tape))
            continue
        if batched_out is None:
            batched_out = model(feed)
        if transform is not None and set(batched_out) != set(model.output_keys):
            # non-coordinate model (CNN residual transform, reference
            # phygeonet heat_equation.py:53-85): values pass through untracked
            out.update(batched_out)
            continue

        # separable/product-grid models (SPINN): per-axis coordinate vectors
        # of different lengths produce grid-shaped outputs -> grid stack
        batch_sizes = {input_dict[k].shape[0] for k in in_keys}
        grid_keys = [k for k in in_keys if input_dict[k].ndim == 2 and input_dict[k].shape[-1] == 1]
        is_grid = bool(grid_keys) and (
            any(v.ndim > 2 for v in batched_out.values()) or len(batch_sizes) > 1
        )
        if is_grid:
            out_keys = tuple(model.output_keys)
            out_index, ofs = {}, 0
            for k in out_keys:
                out_index[k] = ofs
                ofs += int(batched_out[k].shape[-1])

            def grid_fn(*coord_arrays, _model=model, _gk=tuple(grid_keys), _ok=out_keys):
                feed_g = {k: c for k, c in zip(_gk, coord_arrays)}
                o = _model(feed_g)
                return jnp.concatenate([o[k] for k in _ok], axis=-1)

            key_index = {k: i for i, k in enumerate(grid_keys)}
            stack = tape.add_grid_stack(grid_fn, {k: input_dict[k] for k in grid_keys}, key_index, out_index)
            for k in out_keys:
                arr = batched_out[k]
                tape.register_output(arr, stack, out_index[k])
                out[k] = arr
            continue

        # differentiable coordinates: single-column inputs; everything else
        # (function samples, grids, ...) rides along as per-point extras
        diff_keys = [k for k in in_keys if input_dict[k].ndim == 2 and input_dict[k].shape[-1] == 1]
        extra_keys = [k for k in in_keys if k not in diff_keys]
        if diff_keys:
            x = jnp.concatenate([input_dict[k] for k in diff_keys], axis=-1)  # (N, d)
            extras = {k: input_dict[k] for k in extra_keys}
            key_index = {k: i for i, k in enumerate(diff_keys)}

            out_keys = tuple(model.output_keys)
            widths = [int(batched_out[k].shape[-1]) for k in out_keys]
            out_index, ofs = {}, 0
            for k, w in zip(out_keys, widths):
                out_index[k] = ofs
                ofs += w

            def pointwise(xvec, extras_pt, _model=model, _dk=tuple(diff_keys), _ok=out_keys):
                feed_pt = {k: xvec[i : i + 1] for i, k in enumerate(_dk)}
                feed_pt.update(extras_pt)
                o = _model(feed_pt)
                return jnp.concatenate([o[k] for k in _ok], axis=-1)

            # MLP-family archs expose a fused Taylor-jet forward: all
            # order<=2 components ride ONE batched pass (one matmul per
            # layer) instead of per-component nested-jvp chains. Only valid
            # when every model input is a differentiable coordinate column.
            jet_fn = None
            from paddlescience_tpu.autodiff import path as deriv_path

            if (
                deriv_path.flag("PSCI_JET", "1") == "1"
                and not extra_keys
                and getattr(model, "supports_jet", lambda: False)()
            ):
                def jet_fn(xb, dmultis, _model=model):
                    from paddlescience_tpu.autodiff import jet as jetmod

                    idx = jetmod.build_index(dmultis)
                    jout = _model.forward_jet(jetmod.seed(xb, idx))
                    return {tuple(sorted(m)): jout.component(m) for m in dmultis}

            stack = tape.add_stack(
                pointwise, x, key_index, out_index, extras=extras, jet_fn=jet_fn,
                out_width=ofs,
            )
            for k in out_keys:
                arr = batched_out[k]
                tape.register_output(arr, stack, out_index[k])
                out[k] = arr
        else:
            out.update(batched_out)

    return out


def _collect_jet_requests(models, input_dict, output_exprs, extra_values):
    """Discover which derivative components the expressions will ask for,
    WITHOUT adding any ops to the caller's trace: replay the whole evaluation
    under ``jax.eval_shape`` (purely abstract) and read each dense stack's
    ``requested`` log. Returns one ordered request-set per dense stack (in
    stack-creation order), or None when no model has a jet forward / the
    abstract replay fails (then everything stays on the lazy nested-jvp
    path, which is always correct)."""
    if not any(getattr(m, "supports_jet", lambda: False)() for m in models):
        return None
    collected: list = []

    def run(inp):
        with ad.tape_context() as tape:
            tape.collecting = True
            out = forward_with_derivatives(models, inp, tape)
            if extra_values:
                out.update(extra_values)
            wrapped = ad.wrap_tape_outputs(tape, out)
            for expr in output_exprs.values():
                if callable(expr):
                    expr(wrapped)
            collected.extend(
                tuple(s.requested) for s in tape._stacks if isinstance(s, ad._DerivStack)
            )
        return jnp.zeros(())

    try:
        jax.eval_shape(run, dict(input_dict))
    except Exception:
        return None
    return collected


def evaluate_expressions(
    models: Sequence,
    input_dict: Mapping[str, jnp.ndarray],
    output_exprs: Mapping[str, Callable],
    extra_values: Optional[Mapping[str, jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    """Evaluate named output expressions (python closures over ``out`` or
    lambdified sympy) against model forwards + derivative tape.

    This is the body of the reference's ``ExpressionSolver.train_forward``
    (expression.py:60-131) for one constraint; losses are applied by the
    caller so the whole step stays one traced function.
    """
    jet_requests = _collect_jet_requests(models, input_dict, output_exprs, extra_values)
    with ad.tape_context() as tape:
        out = forward_with_derivatives(models, input_dict, tape)
        if jet_requests is not None:
            dense = [s for s in tape._stacks if isinstance(s, ad._DerivStack)]
            if len(dense) == len(jet_requests):
                for stack, reqs in zip(dense, jet_requests):
                    stack.precompute(reqs)
        if extra_values:
            out.update(extra_values)
        # TapeArray view: composed expressions (rho * u, lam-weighted
        # residuals, ...) stay differentiable inside equation closures
        wrapped = ad.wrap_tape_outputs(tape, out)
        results: Dict[str, jnp.ndarray] = {}
        for name, expr in output_exprs.items():
            if not callable(expr):
                raise TypeError(
                    f"output expression '{name}' must be callable (python closure "
                    f"or ppsci.lambdify(sympy_expr)), got {type(expr)}"
                )
            results[name] = ad.unwrap(expr(wrapped))
        # carry area/weight columns through for integral-type losses
        for aux in ("area", "sdf"):
            if aux in out and aux not in results:
                results[aux] = out[aux]
    return results
