"""Mid-run checkpoint / resume via orbax.

The reference has no in-flight checkpointing — a killed run loses everything
(SURVEY §5).  Here every stored snapshot is checkpointed: the dense device
state (q, and the phonon field when present) at each stored step *is* the
snapshot data, so one orbax step per stored index makes any snapshot a
resume point.  A resumed run rebuilds the host-side history (times, frames,
energy frames, mass, phonon history) from the checkpoints and continues the
time loop from the latest one, producing results identical to an
uninterrupted run.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

__all__ = ["SimulationCheckpointer"]


class SimulationCheckpointer:
    """One orbax step per stored snapshot: {q, ph?, step, time}."""

    def __init__(self, directory: str | Path):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = Path(directory).resolve()
        self._mgr = ocp.CheckpointManager(
            str(self.directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=None),
        )

    def save_step(
        self,
        stored_idx: int,
        *,
        step: int,
        time_ns: float,
        q: np.ndarray,
        ph: np.ndarray | None = None,
    ) -> None:
        payload: dict[str, Any] = {
            "step": np.asarray(step, dtype=np.int64),
            "time_ns": np.asarray(time_ns, dtype=np.float64),
            "q": np.asarray(q),
        }
        if ph is not None:
            payload["ph"] = np.asarray(ph)
        self._mgr.save(int(stored_idx), args=self._ocp.args.StandardSave(payload))

    def finalize(self) -> None:
        self._mgr.wait_until_finished()

    def all_steps(self) -> list[int]:
        return sorted(self._mgr.all_steps())

    def restore(self, stored_idx: int) -> dict[str, Any]:
        payload = self._mgr.restore(int(stored_idx), args=self._ocp.args.StandardRestore())
        payload["stored_idx"] = int(stored_idx)
        payload["step"] = int(np.asarray(payload["step"]))
        payload["time_ns"] = float(np.asarray(payload["time_ns"]))
        return payload

    def latest(self) -> dict[str, Any] | None:
        steps = self.all_steps()
        if not steps:
            return None
        return self.restore(steps[-1])

    def discard_from(self, stored_idx: int) -> None:
        """Delete checkpoints at indices >= stored_idx.

        Used on resume to drop snapshots the current segment plan will
        restore differently (e.g. a shorter interrupted horizon's forced
        final-step store) — the continuing run re-saves those indices.
        """
        for s in self.all_steps():
            if s >= int(stored_idx):
                self._mgr.delete(s)

    def load_through(self, stored_idx: int) -> list[dict[str, Any]]:
        return [self.restore(i) for i in self.all_steps() if i <= stored_idx]
