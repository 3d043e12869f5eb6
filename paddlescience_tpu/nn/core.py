"""paddlescience_tpu.nn — the framework's own module system.

Why not flax: in the pinned jax/flax versions, both linen and NNX module
calls inside nested forward-mode AD (vmap∘jacfwd∘jacfwd under value_and_grad
— the PINN hot path) blow up XLA lowering from ~1 s to minutes, while the
identical math as plain functions over plain pytrees compiles in ~1 s
(measured; see repo history). PINN frameworks live inside that pattern, so
this framework owns a minimal module system with **zero machinery between
user code and jaxprs**:

  * a ``Module`` stores ``Param``/``Buffer`` leaves and child modules by
    plain attribute assignment (reference-style mutable ergonomics:
    ``model.register_input_transform(fn)`` just works);
  * ``module.param_tree()`` / ``buffer_tree()`` give nested plain-dict
    pytrees; ``module.bind(params, buffers)`` is a context manager that
    overlays traced values during a call — so ``apply(params, x)`` is a pure
    function of plain dicts, and jax transforms see nothing but jnp ops.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Any, Callable, Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Param",
    "Buffer",
    "Module",
    "ModuleList",
    "ModuleDict",
    "Rngs",
    "Lambda",
    "Sequential",
    "split",
    "merge_call",
]


class Param:
    """Marks an array as trainable when assigned to a Module attribute."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = jnp.asarray(value)


class Buffer:
    """Marks an array as non-trainable state (period freqs, running stats)."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = jnp.asarray(value)


class Rngs:
    """Deterministic PRNG key stream for parameter init."""

    def __init__(self, seed: Union[int, jax.Array] = 0):
        if isinstance(seed, int):
            self._key = jax.random.PRNGKey(seed)
        else:
            self._key = seed
        self._count = 0

    def params(self) -> jax.Array:
        self._count += 1
        return jax.random.fold_in(self._key, self._count)

    __call__ = params


class Module:
    """Base module. Subclasses assign Params/Buffers/child Modules as plain
    attributes; everything else is static Python state."""

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)

    def __new__(cls, *args, **kwargs):
        obj = object.__new__(cls)
        object.__setattr__(obj, "_params", {})
        object.__setattr__(obj, "_buffers", {})
        object.__setattr__(obj, "_children", {})
        object.__setattr__(obj, "_overlay", [])  # bind() stack: (params, buffers)
        return obj

    # -- attribute plumbing ----------------------------------------------------
    def __setattr__(self, name: str, value: Any):
        if isinstance(value, Param):
            self._params[name] = value.value
            self._buffers.pop(name, None)
            self._children.pop(name, None)
            self.__dict__.pop(name, None)  # clear stale instance attribute
        elif isinstance(value, Buffer):
            self._buffers[name] = value.value
            self._params.pop(name, None)
            self._children.pop(name, None)
            self.__dict__.pop(name, None)
        elif isinstance(value, Module):
            self._children[name] = value
            self._params.pop(name, None)
            self._buffers.pop(name, None)
            object.__setattr__(self, name, value)
        elif isinstance(value, (list, tuple)) and value and all(isinstance(v, Module) for v in value):
            wrapped = ModuleList(value)
            self._children[name] = wrapped
            self._params.pop(name, None)
            self._buffers.pop(name, None)
            object.__setattr__(self, name, wrapped)
        elif isinstance(value, dict) and value and all(isinstance(v, Module) for v in value.values()):
            wrapped = ModuleDict(value)
            self._children[name] = wrapped
            self._params.pop(name, None)
            self._buffers.pop(name, None)
            object.__setattr__(self, name, wrapped)
        else:
            # plain attribute: clear any stale Param/Buffer/child registration
            # left by a previous assignment of a different kind
            if name in self._params or name in self._buffers or name in self._children:
                self._params.pop(name, None)
                self._buffers.pop(name, None)
                self._children.pop(name, None)
            object.__setattr__(self, name, value)

    def __getattr__(self, name: str):
        # only called when normal lookup fails: resolve Param/Buffer values,
        # respecting any bound overlay (innermost wins)
        try:
            params = object.__getattribute__(self, "_params")
            buffers = object.__getattribute__(self, "_buffers")
            overlay = object.__getattribute__(self, "_overlay")
        except AttributeError:
            raise AttributeError(name)
        for ov_params, ov_buffers in reversed(overlay):
            if ov_params is not None and name in ov_params and name in params:
                return ov_params[name]
            if ov_buffers is not None and name in ov_buffers and name in buffers:
                return ov_buffers[name]
        if name in params:
            return params[name]
        if name in buffers:
            return buffers[name]
        raise AttributeError(f"{type(self).__name__} has no attribute '{name}'")

    # -- pytree extraction -------------------------------------------------------
    def param_tree(self) -> Dict[str, Any]:
        tree = dict(self._params)
        for cname, child in self._children.items():
            sub = child.param_tree()
            if sub:
                tree[cname] = sub
        return tree

    def buffer_tree(self) -> Dict[str, Any]:
        tree = dict(self._buffers)
        for cname, child in self._children.items():
            sub = child.buffer_tree()
            if sub:
                tree[cname] = sub
        return tree

    def load_param_tree(self, tree: Dict[str, Any]) -> None:
        """Overwrite stored params in-place from a pytree (checkpoint load)."""
        for name in self._params:
            if name in tree:
                self._params[name] = jnp.asarray(tree[name])
        for cname, child in self._children.items():
            if cname in tree:
                child.load_param_tree(tree[cname])

    def load_buffer_tree(self, tree: Dict[str, Any]) -> None:
        """Overwrite stored (non-trainable) buffers in-place from a pytree."""
        for name in self._buffers:
            if name in tree:
                self._buffers[name] = jnp.asarray(tree[name])
        for cname, child in self._children.items():
            if cname in tree:
                child.load_buffer_tree(tree[cname])

    # -- binding -------------------------------------------------------------------
    @contextlib.contextmanager
    def bind(self, params: Optional[Dict] = None, buffers: Optional[Dict] = None):
        """Overlay traced param/buffer values for the duration of a call."""
        self._push(params, buffers)
        try:
            yield self
        finally:
            self._pop()

    def _push(self, params, buffers):
        self._overlay.append((params, buffers))
        for cname, child in self._children.items():
            child._push(
                params.get(cname) if params else None,
                buffers.get(cname) if buffers else None,
            )

    def _pop(self):
        self._overlay.pop()
        for child in self._children.values():
            child._pop()

    def apply(self, params: Dict, *args, buffers: Optional[Dict] = None, **kwargs):
        """Pure functional call: outputs depend only on (params, buffers, args)."""
        with self.bind(params, buffers):
            return self(*args, **kwargs)

    # -- info -----------------------------------------------------------------------
    @property
    def num_params(self) -> int:
        return int(sum(np.prod(x.shape) for x in jax.tree.leaves(self.param_tree())))

    def modules(self):
        yield self
        for child in self._children.values():
            yield from child.modules()


class ModuleList(Module):
    """List of child modules (children keyed by index as string)."""

    def __init__(self, mods: Sequence[Module] = ()):
        self._items = []
        for m in mods:
            self.append(m)

    def append(self, mod: Module):
        self._children[str(len(self._items))] = mod
        self._items.append(mod)

    def __iter__(self):
        return iter(self._items)

    def __len__(self):
        return len(self._items)

    def __getitem__(self, i):
        return self._items[i]


class ModuleDict(Module):
    """Dict of child modules."""

    def __init__(self, mods: Optional[Dict[str, Module]] = None):
        self._keys = []
        for k, v in (mods or {}).items():
            self[k] = v

    def __setitem__(self, k: str, v: Module):
        self._children[k] = v
        if k not in self._keys:
            self._keys.append(k)

    def __getitem__(self, k: str):
        return self._children[k]

    def items(self):
        return [(k, self._children[k]) for k in self._keys]

    def values(self):
        return [self._children[k] for k in self._keys]

    def __iter__(self):
        return iter(self._keys)

    def __contains__(self, k):
        return k in self._children


class Lambda(Module):
    """Wrap a plain function as a (parameterless) Module — lets mixed
    lists of functions and parametric modules live in one ModuleList."""

    def __init__(self, fn: Callable):
        self.fn = fn

    def __call__(self, *args, **kwargs):
        return self.fn(*args, **kwargs)


class Sequential(Module):
    """Chain of callables (modules or plain functions)."""

    def __init__(self, *layers):
        # bypass __setattr__: the seq{i} children below are the single
        # registration (a plain assignment would auto-wrap an all-Module
        # list into a second child and duplicate every parameter)
        object.__setattr__(self, "_layers", list(layers))
        for i, m in enumerate(l for l in layers if isinstance(l, Module)):
            self._children[f"seq{i}"] = m

    def __call__(self, x):
        for l in self._layers:
            x = l(x)
        return x


def split(module: Module):
    """(module, params, buffers) — the functionalization triple."""
    return module, module.param_tree(), module.buffer_tree()


def merge_call(module: Module, params, buffers, fn: Callable):
    """Run fn(module) with params/buffers bound (helper for jitted closures)."""
    with module.bind(params, buffers):
        return fn(module)
