"""Terminal progress reporting: iteration spinner and histograms.

Behavioral equivalent of the reference (python/mfv2d/progress.py): an ANSI
spinner with an iteration bar and a log-scaled residual position bar, plus a
text histogram renderer used for error/order distributions.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import numpy as np
import numpy.typing as npt

_ANSI_RESET = "\033[0m"
_ANSI_RED = "\033[31m"
_ANSI_YELLOW = "\033[33m"
_ANSI_GREEN = "\033[32m"

_SPINNERS = ("|", "/", "-", "\\")


@dataclass
class ProgressTracker:
    """Tracks nonlinear iteration progress for terminal display."""

    err_tol: float
    err_initial: float
    err_cur: float
    iter_max: int
    iter_cur: int = 0
    iter_width: int = 10
    err_width: int = 10

    def update_iteration(self, new_err: float) -> None:
        self.err_cur = new_err
        if self.iter_cur < self.iter_max:
            self.iter_cur += 1

    @property
    def iter_progress(self) -> str:
        frac = int(self.iter_width * self.iter_cur / self.iter_max)
        return "#" * frac + " " * (self.iter_width - frac)

    @property
    def err_indicator(self) -> str:
        """Position of the current error on a log scale between start and tol."""
        chars = list(" |" + " " * self.err_width + "| ")
        if self.err_cur >= self.err_initial:
            chars = [_ANSI_RED + "*" + _ANSI_RESET] + chars[1:]
        elif self.err_cur <= self.err_tol:
            chars = chars[:-1] + [_ANSI_GREEN + "*" + _ANSI_RESET]
        else:
            pos = int(
                (np.log(self.err_initial) - np.log(self.err_cur))
                / (np.log(self.err_initial) - np.log(self.err_tol))
                * self.err_width
            )
            pos = min(max(pos, 0), self.err_width - 1)
            chars[pos + 2] = _ANSI_YELLOW + "*" + _ANSI_RESET
        return "".join(chars)

    def state_str(self, format_string: str) -> str:
        iter_str = (
            "Iteration "
            + str(self.iter_cur).rjust(len(str(self.iter_max)))
            + f" out of {self.iter_max}[{self.iter_progress}]"
        )
        err_str = (
            f"Error at {self.err_cur:.3e} / {self.err_tol:.3e} ["
            + self.err_indicator
            + "]"
        )
        return format_string.format(
            _SPINNERS[self.iter_cur % len(_SPINNERS)], iter_str, err_str
        )


@dataclass(frozen=True)
class HistogramFormat:
    """Renders a text histogram of an array to the terminal."""

    rows: int
    cols: int
    tick_count: int = 2
    label_format: Callable[[float], str] = str

    def format(self, a: npt.ArrayLike) -> str:
        hist, bin_edges = np.histogram(np.asarray(a), bins=self.cols)
        max_val = hist.max()
        scaled = (
            np.zeros_like(hist)
            if max_val == 0
            else np.round((hist / max_val) * (self.rows - 1)).astype(int)
        )
        lines = []
        for r in reversed(range(self.rows)):
            lines.append(
                "".join("#" if scaled[b] >= r else " " for b in range(self.cols))
            )
        tick_positions = np.linspace(0, self.cols - 1, self.tick_count, dtype=int)
        tick_row = [" "] * self.cols
        for pos in tick_positions:
            tick_row[pos] = "|"
        lines.append("".join(tick_row))

        label_row = [" "] * self.cols
        for i, pos in enumerate(tick_positions):
            label = self.label_format(float(bin_edges[pos]))
            if i == 0:
                start = pos
            elif i == len(tick_positions) - 1:
                start = pos - len(label) + 1
            else:
                start = pos - len(label) // 2
            start = max(start, 0)
            end = min(start + len(label), self.cols)
            for j, ch in enumerate(label[: end - start]):
                label_row[start + j] = ch
        lines.append("".join(label_row))
        return "\n".join(lines)

    def __call__(self, a: npt.ArrayLike) -> str:
        return self.format(a)
