"""Transition function contract.

The reference expresses this as a C++20 concept
(``StencilStream/Concepts.hpp:61-77``): a type with a ``Cell`` typedef,
``stencil_radius >= 1``, ``n_subiterations >= 1``, a pure
``operator()(Stencil) -> Cell`` and ``get_time_dependent_value(i)``.

Here a transition function is a Python object with:

* class attributes ``stencil_radius`` (int >= 1) and ``n_subiterations``
  (int >= 1),
* ``__call__(stencil) -> cell`` — pure, written with elementwise ``jnp``
  operations against the array-valued :class:`~stencilstream_tpu.core.stencil.Stencil`,
* ``get_time_dependent_value(i_iteration)`` — pure; defaults to ``None``
  (the reference's ``std::monostate``, ``BaseTransitionFunction.hpp:40-81``).

Declare runtime parameters with the :func:`transition_function` decorator: it
registers the dataclass as a pytree so numeric parameters are **traced
arguments** of the compiled update, not baked-in constants. Mutating a
parameter between calls (``update.params.transition_function.dt = ...``, the
pattern Convection uses every timestep, ``examples/convection/convection.cpp:452-457``)
therefore never triggers recompilation. Mark genuinely structural fields with
``static_field()`` — those become part of the compilation cache key.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

T = TypeVar("T")

__all__ = [
    "transition_function",
    "static_field",
    "BaseTransitionFunction",
    "validate_transition_function",
]

_STATIC_MARK = "stencilstream_static"


def static_field(default=dataclasses.MISSING, **kwargs):
    """A dataclass field treated as static (part of the jit cache key)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata[_STATIC_MARK] = True
    return dataclasses.field(default=default, metadata=metadata, **kwargs)


def transition_function(cls: type[T]) -> type[T]:
    """Register a transition-function dataclass as a pytree.

    All fields are data leaves unless declared with :func:`static_field`.
    """
    cls = dataclasses.dataclass(cls)
    data_fields, meta_fields = [], []
    for f in dataclasses.fields(cls):
        (meta_fields if f.metadata.get(_STATIC_MARK) else data_fields).append(f.name)
    jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)
    return cls


class BaseTransitionFunction:
    """Defaults that disable the advanced features, mirroring
    ``StencilStream/BaseTransitionFunction.hpp:40-81``:
    radius 1, one sub-iteration, no time-dependent value."""

    stencil_radius: int = 1
    n_subiterations: int = 1

    def get_time_dependent_value(self, i_iteration):
        return None


def validate_transition_function(tf: Any) -> None:
    """Runtime analog of the ``TransitionFunction`` concept checks
    (``Concepts.hpp:61-77``)."""
    radius = getattr(tf, "stencil_radius", None)
    if not isinstance(radius, int) or radius < 1:
        raise TypeError(
            f"transition function {type(tf).__name__} must define an integer "
            f"class attribute stencil_radius >= 1 (got {radius!r})"
        )
    n_sub = getattr(tf, "n_subiterations", None)
    if not isinstance(n_sub, int) or n_sub < 1:
        raise TypeError(
            f"transition function {type(tf).__name__} must define an integer "
            f"class attribute n_subiterations >= 1 (got {n_sub!r})"
        )
    if not callable(tf):
        raise TypeError(f"transition function {type(tf).__name__} must be callable")
    if not callable(getattr(tf, "get_time_dependent_value", None)):
        raise TypeError(
            f"transition function {type(tf).__name__} must define "
            f"get_time_dependent_value(i_iteration) (inherit BaseTransitionFunction "
            f"for the no-TDV default)"
        )
