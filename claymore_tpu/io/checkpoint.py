"""Checkpoint / resume.

The reference has NO checkpointing (SURVEY.md section 5: output-only .bgeo
streaming; positions alone cannot restart a run).  Here the full SimState —
grid pool, partition, every particle field, step/time scalars — is a pytree
of dense arrays, so save/restore is exact and trivial: the simulation
continues bit-for-bit from where it stopped.
"""

from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import SimState

_FORMAT_VERSION = 2  # v2: SimState gained the mig_dropped counter leaf


def save_state(path: str, state: SimState) -> None:
    """Serialize a SimState to a single .npz file."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    # field names per model for structural validation on load
    field_names = [",".join(sorted(m.fields.keys())) for m in state.models]
    np.savez_compressed(
        path,
        __version__=np.int64(_FORMAT_VERSION),
        __num_models__=np.int64(len(state.models)),
        __fields__=np.array(field_names),
        **arrays,
    )


def load_state(path: str, like: SimState) -> SimState:
    """Restore a SimState saved by save_state.  ``like`` provides the pytree
    structure (build it with engine.init_state on the same config/materials);
    shapes must match exactly."""
    with np.load(path, allow_pickle=False) as data:
        assert int(data["__version__"]) == _FORMAT_VERSION
        assert int(data["__num_models__"]) == len(like.models)
        leaves, treedef = jax.tree_util.tree_flatten(like)
        out = []
        for i, ref in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            assert arr.shape == ref.shape, (
                f"checkpoint shape mismatch at leaf {i}: {arr.shape} vs "
                f"{ref.shape} — config/materials differ from the saved run"
            )
            out.append(jnp.asarray(arr.astype(np.asarray(ref).dtype)))
        return jax.tree_util.tree_unflatten(treedef, out)


def save_frame_bgeo(path: str, engine, state: SimState, model_idx: int = 0,
                    asynchronous: bool = True) -> None:
    """Dump one model's particle cloud to .bgeo (reference output_model,
    gmpm_simulator.cuh:594-634: retrieve_particle_buffer + IO::insert_job)."""
    from . import bgeo

    pos = engine.get_positions(state, model_idx)
    bgeo.write_bgeo(path, pos, asynchronous=asynchronous)


def flush_io() -> None:
    from .. import native
    from . import async_io

    native.flush_native()
    async_io.flush()
