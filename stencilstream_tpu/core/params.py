"""Update parameters — the runtime configuration surface.

Mirrors the ``Params`` struct every reference backend must define
(``StencilStream/Concepts.hpp:139-155``): the transition-function instance,
the halo value, the iteration offset (pause/resume support,
``cpu/StencilUpdate.hpp:64-70``), the iteration count, and blocking behavior.
Backend-specific performance knobs (the reference's template parameters,
``monotile/StencilUpdate.hpp:78-84``) live in per-backend subclasses.

``get_params()``-style mutation is supported: fields read at call time, and
numeric transition-function parameters are traced, so mutating them between
calls does not recompile (see :mod:`stencilstream_tpu.core.transition`).
"""

from __future__ import annotations

import dataclasses
from typing import Any

__all__ = ["Params"]


@dataclasses.dataclass
class Params:
    #: The transition function instance; runtime parameters live on it.
    transition_function: Any

    #: Cell value presented for neighbors outside the grid
    #: (``Concepts.hpp:144``). ``None`` means a zero cell of the grid's dtypes.
    halo_value: Any = None

    #: Added to the step index so a resumed simulation sees consistent
    #: ``stencil.iteration`` and TDV values (``Concepts.hpp:145``).
    iteration_offset: int = 0

    #: Number of logical iterations per call (each runs ``n_subiterations``
    #: sub-steps).
    n_iterations: int = 1

    #: Block until device completion before returning (for meaningful
    #: walltime measurements; ``cpu/StencilUpdate.hpp:83-91``).
    blocking: bool = False

    #: TDV strategy: "inline", "precompute_on_device", "precompute_on_host",
    #: or a :class:`stencilstream_tpu.tdv.TDVStrategy` instance.
    tdv_strategy: Any = "inline"
