"""Tk-independent viewer logic: playback state and frame rendering.

All drawing targets a matplotlib ``Axes`` so the same code backs the Tk
viewers (TkAgg) and headless tests (Agg).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..io.storage import frame_from_jsonable
from ..models.params import SimulationResultData, TestCaseResultData

__all__ = ["PlaybackState", "render_heatmap", "render_line1d", "render_timeseries", "result_frames"]


@dataclass
class PlaybackState:
    """Frame index bookkeeping for play/pause/scrub controls."""

    num_frames: int
    index: int = 0
    playing: bool = False
    loop: bool = True

    def step(self, delta: int = 1) -> int:
        if self.num_frames <= 0:
            return 0
        nxt = self.index + delta
        if self.loop:
            self.index = nxt % self.num_frames
        else:
            self.index = min(max(nxt, 0), self.num_frames - 1)
            if self.index == self.num_frames - 1:
                self.playing = False
        return self.index

    def seek(self, index: int) -> int:
        self.index = min(max(int(index), 0), max(0, self.num_frames - 1))
        return self.index

    def toggle(self) -> bool:
        self.playing = not self.playing
        return self.playing


def result_frames(result: SimulationResultData) -> list[np.ndarray]:
    """Decode a result's NaN-encoded frames into numpy arrays."""
    return [frame_from_jsonable(f) for f in result.frames]


def render_heatmap(ax, frame: np.ndarray, *, clim=None, title: str = "", cmap="inferno"):
    """Draw one NaN-masked 2D frame; returns the image artist."""
    ax.clear()
    img = ax.imshow(frame, origin="lower", cmap=cmap, interpolation="nearest")
    if clim is not None:
        img.set_clim(*clim)
    ax.set_title(title)
    ax.set_xticks([])
    ax.set_yticks([])
    return img


def render_line1d(ax, case: TestCaseResultData, frame_idx: int):
    """Strip test case: simulated vs analytic profiles at one stored time."""
    ax.clear()
    x = np.asarray(case.x)
    sim = np.asarray(case.simulated[frame_idx], dtype=np.float64)
    ana = np.asarray(case.analytic[frame_idx], dtype=np.float64)
    ax.plot(x, ana, "-", lw=2, label="analytic")
    ax.plot(x, sim, "--", lw=1.5, label="simulated")
    ax.set_xlabel("x [µm]")
    ax.set_ylabel("density")
    ax.set_title(f"{case.title} — t = {case.times[frame_idx]:.4g} ns")
    ax.legend(loc="best")
    return ax


def render_timeseries(ax, case: TestCaseResultData):
    """Collision ODE case: simulated vs analytic n(t)."""
    ax.clear()
    t = np.asarray(case.x)  # timeseries cases store times in x
    sim = np.asarray(case.simulated[0], dtype=np.float64)
    ana = np.asarray(case.analytic[0], dtype=np.float64)
    ax.plot(t, ana, "-", lw=2, label="analytic")
    ax.plot(t, sim, "--", lw=1.5, label="simulated")
    ax.set_xlabel("t [ns]")
    ax.set_ylabel("n")
    ax.set_title(case.title)
    ax.legend(loc="best")
    return ax
