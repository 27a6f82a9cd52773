"""Checkpoint/resume for long batched sweeps.

The reference has no checkpointing (SURVEY.md section 5: the only persisted
artifacts are policy weights and recorded signals). Pod-scale scenario
sweeps (configs[4]) need restartability, so sweep state (scenario batches,
partial results, controller states, RNG keys) round-trips through Orbax.
"""

import jax
import orbax.checkpoint as ocp


def save_pytree(path, tree, force=True):
    """Save any pytree (NamedTuples flattened to leaves + treedef-stable
    ordering) to ``path`` (a directory)."""
    ckptr = ocp.StandardCheckpointer()
    leaves, _ = jax.tree.flatten(tree)
    ckptr.save(str(path), {f"leaf_{i}": l for i, l in enumerate(leaves)},
               force=force)
    ckptr.wait_until_finished()


def restore_pytree(path, like):
    """Restore into the structure of ``like`` (same pytree shape/dtypes)."""
    ckptr = ocp.StandardCheckpointer()
    leaves, treedef = jax.tree.flatten(like)
    template = {f"leaf_{i}": l for i, l in enumerate(leaves)}
    restored = ckptr.restore(str(path), template)
    return jax.tree.unflatten(
        treedef, [restored[f"leaf_{i}"] for i in range(len(leaves))])
