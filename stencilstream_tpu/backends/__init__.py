"""Stencil update backends.

* ``reference`` — pure JAX/XLA oracle (the analog of the reference's CPU
  backend, ``StencilStream/cpu/StencilUpdate.hpp``). Runs anywhere.
* ``monotile`` — single fused Pallas kernel, whole grid resident in VMEM,
  all iterations of a call computed per HBM round-trip (the analog of the
  FPGA monotile temporal-blocking pipeline,
  ``StencilStream/monotile/internal/StencilUpdateKernel.hpp``).
* ``tiling`` — Pallas kernel over halo-padded tiles for grids larger than
  VMEM (the analog of ``StencilStream/tiling/StencilUpdate.hpp``).
* ``distributed`` — grid sharded over a TPU mesh with collective halo
  exchange (the analog of the multi-FPGA IO-pipe ring,
  ``StencilStream/monotile/internal/StencilUpdateDesign.hpp:221-348``).
"""

from . import reference

__all__ = ["reference"]
