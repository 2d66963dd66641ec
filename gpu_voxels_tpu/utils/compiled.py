"""Shared jit cache for public map methods.

Eagerly-dispatched jnp ops cost milliseconds to seconds EACH on relayed TPU
backends (every op is a separate dispatch, often a separate remote compile),
so a public method that issues ~30 ops takes ~minutes cold. Wrapping the
whole method in one `jax.jit` makes a public API call a single compiled
program dispatch — the same consolidation `maps/paged.py` applies to its
host-stateful pipeline, expressed as a decorator for the pure pytree
methods.

Methods stay pure pytree -> pytree functions, so the wrapper is semantically
transparent; calling a wrapped method inside an outer `jax.jit` simply
inlines the nested jit. The jit cache is keyed on the unbound function, so
all instances of a map class share one cache; recompiles happen per argument
shape/static-value combination exactly as with a hand-written jit.
"""
from __future__ import annotations

import functools
import inspect

import jax
import numpy as np


def compiled(*static_argnames):
    """Decorate a pytree method: run it as one jitted program.

    `static_argnames` are the Python-value parameters (meanings, thresholds,
    margins, offsets, flags) baked into the compiled program. List/ndarray
    values passed for a static parameter are canonicalized to tuples so
    callers may pass `offset=[1, 0, 0]` without tripping jit hashing.
    """

    def deco(fn):
        jfn = jax.jit(fn, static_argnames=static_argnames)
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            b = sig.bind(*args, **kwargs)
            b.apply_defaults()
            for name in static_argnames:
                v = b.arguments.get(name)
                if isinstance(v, (list, np.ndarray)):
                    b.arguments[name] = tuple(np.asarray(v).ravel().tolist())
            return jfn(*b.args, **b.kwargs)

        wrapper.__wrapped__ = fn
        return wrapper

    return deco
