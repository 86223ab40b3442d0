"""Engine error types.

Mirrors the reference's error surface (/root/reference/lib/errors.js:4-31):
``SchemaError`` for invalid view definitions, ``SourceNotFoundError`` for
a source that cannot be read (the reference's ArchiveNotFoundError), and
``ViewNotFoundError`` for queries against undefined views (the reference
throws a plain Error at lib/view.js lookup sites).
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for all engine errors."""


class SchemaError(EngineError):
    """Invalid view definition (reference: lib/errors.js:14-19)."""


class SourceNotFoundError(EngineError):
    """Source path/URL cannot be read (reference: lib/errors.js:21-26)."""


class ViewNotFoundError(EngineError):
    """Query against a view name that was never defined."""
