from .tables import (  # noqa: F401
    read_table,
    derive_xy,
    X_SQL,
    Y_SQL,
    DOC_X_SQL,
    DOC_Y_SQL,
    derive_doc_xy,
)
