"""Static (hand-written) draft-tree support — the legacy EAGLE path.

Reference: EAGLE/eagle/model/utils.py:115-233 ``generate_tree_buffers``
builds tree_attn_mask/tree_indices/tree_position_ids/retrieve_indices from a
choices list; EAGLE/eagle/model/choices.py ships ``mc_sim_7b_63``. The
OPT-Tree dynamic path supersedes this, but the static layout is still useful
(zero per-step tree-construction cost) and completes API parity.

``tree_from_choices`` converts a choices list straight into the engine's
``Tree`` named tuple so static trees drop into the same verification code.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from msd_tpu.engine.tree import Tree

# the 63-node tree shipped with EAGLE for 7B models (choices.py:1-3):
# each entry is a path of top-k child indices from the root.
mc_sim_7b_63 = [
    [0], [1], [2], [3], [0, 0], [0, 1], [0, 2], [1, 0], [1, 1], [2, 0],
    [2, 1], [3, 0], [0, 0, 0], [0, 0, 1], [0, 0, 2], [0, 1, 0], [0, 1, 1],
    [0, 2, 0], [0, 2, 1], [1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1],
    [0, 0, 0, 2], [0, 0, 0, 0, 0], [0, 0, 0, 0, 1], [0, 0, 1, 0],
    [0, 0, 1, 1], [0, 1, 0, 0], [0, 0, 0, 0, 2], [0, 0, 0, 1, 0],
    [0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 1], [0, 1, 0, 1], [0, 0, 1, 0, 0],
    [0, 0, 0, 0, 0, 2], [0, 0, 0, 1, 1], [0, 0, 0, 0, 1, 0],
    [0, 0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0, 1], [0, 2, 0, 0],
    [0, 0, 0, 0, 0, 1, 0], [0, 0, 0, 0, 0, 0, 2], [0, 0, 0, 0, 2, 0],
    [1, 0, 0, 0], [0, 0, 0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0, 0, 1],
    [0, 0, 0, 0, 0, 0, 1, 0], [0, 1, 1, 0], [0, 0, 0, 0, 0, 0, 0, 2],
    [0, 0, 0, 0, 0, 2, 0], [0, 0, 0, 0, 0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, 1], [0, 0, 0, 2, 0],
    [0, 0, 0, 0, 0, 0, 0, 1, 0], [0, 0, 0, 0, 0, 0, 0, 0, 2],
    [0, 0, 2, 0], [0, 0, 0, 0, 0, 0, 0, 0, 0, 0], [0, 0, 1, 2],
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 0], [0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    [0, 1, 0, 2], [0, 0, 0, 0, 0, 0, 0, 0, 0, 2], [0, 0, 0, 0, 1, 1],
]


def choices_to_structure(choices: Sequence[Sequence[int]]
                         ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Sort paths (depth-major, then lexicographic) and derive parents.

    Returns (parents [N], depths [N], n) with node 0 the root; node i>0 is
    choices_sorted[i-1]'s endpoint (generate_tree_buffers:121-150 semantics).
    """
    sorted_choices = sorted(choices, key=lambda p: (len(p), tuple(p)))
    index_of = {(): 0}
    parents = [0]
    depths = [0]
    for path in sorted_choices:
        parent = index_of[tuple(path[:-1])]
        index_of[tuple(path)] = len(parents)
        parents.append(parent)
        depths.append(len(path))
    return (np.asarray(parents, np.int32), np.asarray(depths, np.int32),
            len(parents))


def static_layout(choices: Sequence[Sequence[int]], max_path_len: int
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(parents, depths, ancestor_mask [N,N], retrieve [N, max_path_len])."""
    parents, depths, n = choices_to_structure(choices)
    mask = np.eye(n, dtype=bool)
    retrieve = np.full((n, max_path_len), -1, np.int32)
    retrieve[0, 0] = 0
    for i in range(1, n):
        mask[i] |= mask[parents[i]]
        retrieve[i] = retrieve[parents[i]]
        retrieve[i, depths[i]] = i
    return parents, depths, mask, retrieve


def tree_from_tokens(choices: Sequence[Sequence[int]],
                     root_token: jnp.ndarray, child_tokens: jnp.ndarray,
                     max_path_len: int) -> Tree:
    """Instantiate a static tree with drafted tokens.

    child_tokens: [N-1] draft tokens in the sorted-choices node order (node i
    corresponds to sorted path i-1).
    """
    parents, depths, mask, retrieve = static_layout(choices, max_path_len)
    n = len(parents)
    tokens = jnp.concatenate([root_token[None].astype(jnp.int32),
                              child_tokens[:n - 1].astype(jnp.int32)])
    return Tree(tokens=tokens,
                parents=jnp.asarray(parents),
                mask=jnp.asarray(mask),
                positions=jnp.asarray(depths),
                retrieve=jnp.asarray(retrieve),
                valid=jnp.ones((n,), jnp.bool_),
                node_depth=jnp.asarray(depths),
                node_weight=jnp.ones((n,), jnp.float32),
                extras={})


def per_depth_structure(choices: Sequence[Sequence[int]]):
    """Static per-depth frontier structure for legacy-tree DRAFTING.

    Returns (parents, depths, n, levels) where levels[d] (d >= 1) is a list
    of (node_id, parent_id, child_slot) for the nodes at depth d, in tree
    order. child_slot is the top-k index the node takes from its parent's
    distribution (the last element of its choices path).
    """
    sorted_choices = sorted(choices, key=lambda p: (len(p), tuple(p)))
    parents, depths, n = choices_to_structure(choices)
    levels = {}
    for i, path in enumerate(sorted_choices, start=1):
        d = len(path)
        levels.setdefault(d, []).append((i, int(parents[i]), int(path[-1])))
    return parents, depths, n, levels
