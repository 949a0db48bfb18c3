"""Native (C) components. Optional at runtime; every caller has a pure
Python fallback."""
from __future__ import annotations

_fastx = None
_tried = False


def fastx_module():
    """The compiled ntlink_fastx module, or None if unavailable."""
    global _fastx, _tried
    if not _tried:
        _tried = True
        try:
            from . import build

            _fastx = build.load()
        except Exception:
            _fastx = None
    return _fastx
