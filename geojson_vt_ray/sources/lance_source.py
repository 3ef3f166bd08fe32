"""Lance-table doc source (BASELINE.json north_rule: "features
referenced from a Lance table of interleaved text + media documents").

`ray.data.read_lance` gives zero-copy Arrow batches with column
projection and fragment-parallel reads — the same streaming contract as
`read_parquet`, so every downstream stage is format-agnostic. The
``lance`` package is NOT installed in this container, so the reader is
gated behind an import-try and the parquet path (what the committed
testdata uses) is the tested fallback; on a cluster with lance
installed, `read_docs("s3://corpus.lance")` is the switch.
"""

from __future__ import annotations

import os

DOC_COLUMNS = ["doc_id", "seq", "spans"]


def lance_available() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


def read_docs(path: str, columns: list[str] | None = None):
    """Doc-table Dataset from a Lance dataset dir (``*.lance``) or a
    parquet file/dir, with column projection pushed into the read."""
    import ray.data
    cols = columns or DOC_COLUMNS
    if path.rstrip("/").endswith(".lance") or os.path.isdir(
            os.path.join(path, "_versions")):
        if not lance_available():
            raise ImportError(
                f"{path} looks like a Lance dataset but the `lance` "
                "package is not installed; install pylance or convert "
                "to parquet")
        return ray.data.read_lance(path, columns=cols)
    return ray.data.read_parquet(path, columns=cols)
