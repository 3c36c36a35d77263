"""TensorBoard scalar logging hook (gated optional dependency).

The reference logs only JSON lines to log.txt (main.py:528-531); this adds
the standard experiment-tracking surface users expect on top of the same
data. Backend resolution order: torch.utils.tensorboard (baked into the
torch wheel in this image) -> tensorboardX -> disabled no-op. Every write
is scalars-only so the event files stay tiny and host-side cost is
negligible next to the device step.
"""

from __future__ import annotations

import numbers
from typing import Dict, Optional


def _make_summary_writer(log_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(log_dir)
    except Exception:
        pass
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(log_dir)
    except Exception:
        return None


class ScalarWriter:
    """Write a dict of scalars per step; silently no-ops when disabled or
    when no tensorboard backend is importable (never a hard dependency)."""

    def __init__(self, log_dir: Optional[str], enabled: bool = True):
        self._w = _make_summary_writer(log_dir) if (enabled and log_dir) else None

    @property
    def active(self) -> bool:
        return self._w is not None

    def write(self, step: int, scalars: Dict[str, object],
              prefix: str = "") -> None:
        if self._w is None:
            return
        for k, v in scalars.items():
            if isinstance(v, numbers.Number):
                self._w.add_scalar(prefix + k, float(v), global_step=step)
        self._w.flush()

    def close(self) -> None:
        if self._w is not None:
            self._w.close()
            self._w = None
