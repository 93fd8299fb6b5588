"""Pre-checkpoint plan capture for the audit tool.

``localCheckpoint`` cuts lineage: the returned frame explains as a
``Scan ExistingRDD``, so every window/join/exchange executed BEFORE
the checkpoint is invisible to ``tools/plan_audit.py`` — the audit's
documented blind spot (r11 verdict item 5; c26/c27/c28 were audited
by dev-time narration only). The fix is mechanical: every operator
that checkpoints routes the frame through :func:`note_subtree` first.
Outside an audit run the hook is a zero-cost identity; during one
(``tools/plan_audit.py`` calls :func:`start_capture`), the
pre-checkpoint DataFrame is recorded under a stable label and the
audit explains the REAL subtree alongside the top-level plan,
applying the same global-window tripwire.

This is a debug surface, not an execution feature: nothing in the
data path reads the captured frames, and capture holds references
only between ``start_capture`` and ``drain``.
"""

from __future__ import annotations

from typing import Any

#: None → capture off (production); list → capture on (audit run)
_capture: list[tuple[str, Any]] | None = None


def start_capture() -> None:
    global _capture
    _capture = []


def drain() -> list[tuple[str, Any]]:
    """Return and clear everything captured since ``start_capture``
    (capture stays ON so one audit loop can drain per query)."""
    global _capture
    out, _capture = _capture or [], []
    return out


def stop_capture() -> None:
    global _capture
    _capture = None


def note_subtree(label: str, df):
    """Record ``df``'s pre-checkpoint plan for the audit; returns
    ``df`` unchanged so call sites stay one expression:
    ``note_subtree("x.y", frame).localCheckpoint(eager=True)``."""
    if _capture is not None:
        _capture.append((label, df))
    return df
