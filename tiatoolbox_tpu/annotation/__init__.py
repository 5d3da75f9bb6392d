"""Spatially-indexed annotation storage (host plane).

Reference: ``tiatoolbox/annotation/``. Geometry is provided by the
in-package ``geometry`` module (WKB/WKT/GeoJSON codecs + predicates)
instead of Shapely, and the SQLite backend uses the stdlib sqlite3
with its compiled-in R*Tree extension.
"""

from tiatoolbox_tpu.annotation.storage import (  # noqa: F401
    Annotation,
    AnnotationStore,
    DictionaryStore,
    SQLiteStore,
)
