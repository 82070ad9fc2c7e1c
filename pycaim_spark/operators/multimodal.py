"""Multimodal column support (SURVEY.md §2.C mm_column; task north star).

Design: a modality payload is an opaque ``binary`` column packed with typed
metadata (mime, uri, byte size) in sibling columns / a struct — the layout
a 100 TB multimodal lakehouse table uses (parquet stores the blob column
contiguously; metadata predicates prune row groups without touching bytes).

Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so each
task streams record batches (bounded memory even with large blobs). The
actual image/audio codecs are NOT available in this environment, so the
decoder is a deterministic STUB that parses our fake 8-byte header; the
Spark-side plumbing — schema, batch iteration, partition behavior — is real
and tested. Swap ``_decode_fake_header`` for PIL/ffmpeg in production.
"""

from __future__ import annotations

import sys as _sys
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

try:
    from pyspark import cloudpickle as _cloudpickle
except ImportError:  # pragma: no cover
    import cloudpickle as _cloudpickle

#: Fake modality header: magic 'MM' + 1-byte kind + 1-byte channels +
#: 2-byte width + 2-byte height (big-endian). Deterministically derived
#: from text fixtures by pack_demo_payload.
_MAGIC = b"MM"

DECODED_SCHEMA = (
    "doc_id long, mime string, payload_bytes long, "
    "kind int, channels int, width int, height int, valid boolean"
)


def pack_expr(payload: bytes | None = None):
    """Build the multimodal struct column from a binary payload column."""
    return F.struct(
        F.col("payload").alias("data"),
        F.col("mime").alias("mime"),
        F.col("uri").alias("uri"),
        F.length(F.col("payload")).cast("long").alias("nbytes"),
    )


def _decode_fake_header(blob: bytes):
    """STUB decoder: parse the fake header; a real build calls the codec
    here (PIL.Image.open / soundfile / pyav) — deliberately the only line
    that changes."""
    if blob is None or len(blob) < 8 or blob[:2] != _MAGIC:
        return None
    return {
        "kind": blob[2],
        "channels": blob[3],
        "width": int.from_bytes(blob[4:6], "big"),
        "height": int.from_bytes(blob[6:8], "big"),
    }


def decode_metadata(packed: DataFrame) -> DataFrame:
    """mapInPandas decode: binary payloads → typed modality metadata.

    Real Arrow plumbing: the function receives an iterator of record
    batches and yields transformed batches — constant memory per task no
    matter the table size.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_fake_header(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "payload_bytes": [
                        len(b) if b is not None else 0 for b in pdf["payload"]
                    ],
                    "kind": [m["kind"] if m else -1 for m in metas],
                    "channels": [m["channels"] if m else -1 for m in metas],
                    "width": [m["width"] if m else -1 for m in metas],
                    "height": [m["height"] if m else -1 for m in metas],
                    "valid": [m is not None for m in metas],
                }
            )

    return packed.mapInPandas(decode_batches, DECODED_SCHEMA)


def pack_demo_payload(docs: DataFrame) -> DataFrame:
    """Deterministically derive a fake binary modality payload per document
    (header + utf-8 text bytes) — the fixture for decode plumbing tests."""
    header = F.concat(
        F.lit(_MAGIC),
        # kind=1 (image-like), channels=3
        F.lit(bytes([1, 3])),
        # width/height from doc_id — deterministic, parseable
        F.expr("CAST(unhex(lpad(hex((doc_id % 512) + 16), 4, '0')) AS BINARY)"),
        F.expr("CAST(unhex(lpad(hex((doc_id % 256) + 16), 4, '0')) AS BINARY)"),
    )
    return docs.select(
        "doc_id",
        F.concat(header, F.encode("text", "utf-8")).alias("payload"),
        F.lit("image/fake").alias("mime"),
        F.concat(F.lit("mem://documents/"), F.col("doc_id")).alias("uri"),
    )


_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
