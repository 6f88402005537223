"""Typed pipeline errors — parity with the reference's
``InputBlobTriggerException`` discipline (utils.py:5-6: every defensive check
raises a typed error the entry point catches and logs,
__init__.py:21-28)."""

from __future__ import annotations


class IceNetInputError(Exception):
    """Input file cannot be processed: unparseable content or unresolvable
    metadata (reference processor.py:149-150, 186-190)."""


class HemisphereUnresolvedError(IceNetInputError):
    """Neither geospatial attrs nor keywords identify the hemisphere."""
