"""Filter-state checkpoint / resume.

The reference only checkpoints its map preprocessing (the xview_cache,
top_down_map.cpp:226-286) - filter state is never saved.  Because our
FilterState is a pytree of arrays, snapshots are trivial; this enables
crash-resume of a localization session mid-drive (new capability, noted
in SURVEY.md section 5).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from top_down_renderer_tpu.core.grids import FilterState


def save_filter_state(path: str, state: FilterState) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez_compressed(
        path,
        n_leaves=len(leaves),
        **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)},
    )


def load_filter_state(path: str, like: FilterState) -> FilterState:
    """Restore into the structure of `like` (shapes must match the
    running filter's static configuration)."""
    data = np.load(path)
    n = int(data["n_leaves"])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    _, treedef = jax.tree_util.tree_flatten(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)
