"""Persistent grid checkpoints.

The reference gets pause/resume for free from pure ``update(grid, offset, n)``
semantics plus ``iteration_offset`` (``cpu/StencilUpdate.hpp:64-70``); this
module adds the durable half — serializing a grid (any cell pytree) plus its
iteration position to a single ``.npz`` file, so a simulation can resume
across process restarts:

    save_checkpoint("ckpt.npz", grid, iteration=i)
    grid, i = load_checkpoint("ckpt.npz", like=grid_prototype)
    update.get_params().iteration_offset = i

Field names are derived from the pytree paths, so any ``@cell_type`` dataclass
or plain-array grid round-trips exactly (dtypes included).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from ..core.grid import Grid

__all__ = ["save_checkpoint", "load_checkpoint"]


def _leaf_names(tree: Any) -> list[str]:
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [jax.tree_util.keystr(path) or "_" for path, _ in paths]


def save_checkpoint(path: str, grid: Grid, iteration: int = 0) -> None:
    arrays = grid.arrays if isinstance(grid, Grid) else grid
    names = _leaf_names(arrays)
    leaves = [np.asarray(l) for l in jax.tree.leaves(arrays)]
    np.savez(
        path,
        __iteration__=np.int64(iteration),
        **{f"leaf{i}:{n}": a for i, (n, a) in enumerate(zip(names, leaves))},
    )


def load_checkpoint(path: str, like: Any) -> tuple[Grid, int]:
    """Load a checkpoint; ``like`` provides the cell pytree structure (a Grid
    or cell pytree with the same fields, any shapes)."""
    data = np.load(path)
    iteration = int(data["__iteration__"])
    arrays = like.arrays if isinstance(like, Grid) else like
    treedef = jax.tree.structure(arrays)
    keys = sorted(
        (k for k in data.files if k.startswith("leaf")),
        key=lambda k: int(k.split(":")[0][4:]),
    )
    if len(keys) != treedef.num_leaves:
        raise ValueError(
            f"checkpoint has {len(keys)} fields, expected {treedef.num_leaves}"
        )
    return Grid(jax.tree.unflatten(treedef, [data[k] for k in keys])), iteration
