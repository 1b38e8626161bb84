"""Checkpoint management.

Two backends over the same model-document content:
  * pickle documents (reference-envelope, coati_tpu/models/io.py) — the
    interchange format;
  * orbax CheckpointManager — async, retention-managed, multi-host-safe
    checkpoints for long pretraining runs (the reference has no elastic
    recovery; restart-from-latest replaces it, SURVEY.md §5.3).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    HAS_ORBAX = True
except ImportError:
    HAS_ORBAX = False

from coati_tpu.common.util import makedir


class CheckpointManager:
    """Thin orbax wrapper: save(step, state), restore_latest(template)."""

    def __init__(self, directory: str, max_to_keep: int = 3, async_save: bool = True):
        if not HAS_ORBAX:
            raise ImportError("orbax-checkpoint is required for CheckpointManager")
        makedir(directory)
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, step: int, state: Any, metadata: Optional[dict] = None) -> None:
        latest = self._mgr.latest_step()
        if latest is not None and step < latest:
            return  # stale re-save from a resumed run; keep the newer step
        if latest is not None and step == latest:
            # end-of-run checkpoint at the last cadence step: write it as
            # the next step instead of delete-then-rewrite — a crash
            # between a delete and the (async) re-save would otherwise
            # lose the only checkpoint. Orbax steps are labels; the true
            # counters live inside the state.
            step = latest + 1
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **(
                {"metadata": ocp.args.JsonSave(metadata)}
                if metadata is not None
                else {}
            ),
        )
        self._mgr.save(step, args=args)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, template: Any):
        """Restore (state, metadata) at the latest step; None if empty."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(template)),
        )
        return restored["state"]

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
