"""Orbax checkpointing for model bundles and training state.

Two serialization tiers (both = one artifact is a complete deployable
one-class model, mirroring the reference's buffer-carrying ``state_dict``,
SURVEY.md section 5.4):

- ``ocm_tpu.models.bundle.save_bundle``/``load_bundle`` — single msgpack
  file, dependency-light, used by the examples;
- this module — Orbax checkpoints with async save, versioned step
  directories and automatic garbage collection, for long sweeps and
  mid-training state (params + batch stats + optimizer state + epoch),
  which the msgpack path does not cover.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_pytree(path: str, tree: Any) -> str:
    """Save any pytree (bundle, TrainResult fields, opt state) with Orbax."""
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.tree.map(lambda x: x, tree), force=True)
    return path


def load_pytree(path: str, template: Any) -> Any:
    """Restore a pytree saved by ``save_pytree``; ``template`` supplies
    structure and dtypes (an untrained object of the same shape)."""
    import orbax.checkpoint as ocp

    return _checkpointer().restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(item=template)) if hasattr(
            ocp.args, "PyTreeRestore") else _checkpointer().restore(
                os.path.abspath(path), item=template)


class TrainCheckpointer:
    """Versioned training checkpoints: params/batch_stats/opt_state/epoch.

    Enables true mid-training resume across process restarts (the reference
    only reloads best weights for evaluation).  Keeps the newest
    ``max_to_keep`` steps.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, epoch: int, params, batch_stats, opt_state) -> None:
        import orbax.checkpoint as ocp

        state = {"params": params, "batch_stats": batch_stats,
                 "opt_state": opt_state}
        self.manager.save(epoch, args=ocp.args.PyTreeSave(state))

    def latest_epoch(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, template_params, template_batch_stats,
                template_opt_state, epoch: Optional[int] = None):
        import orbax.checkpoint as ocp

        step = self.latest_epoch() if epoch is None else epoch
        if step is None:
            return None
        template = {"params": template_params,
                    "batch_stats": template_batch_stats,
                    "opt_state": template_opt_state}
        state = self.manager.restore(step,
                                     args=ocp.args.PyTreeRestore(template))
        return (state["params"], state["batch_stats"], state["opt_state"],
                step)

    def close(self):
        self.manager.close()
