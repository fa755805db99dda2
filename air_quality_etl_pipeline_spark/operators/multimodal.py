"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as ``binary`` columns
with typed metadata alongside. The Spark-side contract implemented here
is real — schema, Arrow-batched ``mapInPandas`` decode, partition-size
control — while the codec itself is stubbed: the real decoders (PIL,
ffmpeg, torchaudio, …) are not in this container, so ``decode_meta``
ships a clearly-marked deterministic fake and ``decode_image`` raises
``NotImplementedError`` where a real pixel decode would go.

Why ``mapInPandas``: decode is per-row Python work on bytes — the one
place a built-in can't express the semantics — and Arrow batching
amortizes the Python boundary to one transfer per ~10k rows instead of
one per row. At 100 TB you'd bound batch memory with
``spark.sql.execution.arrow.maxRecordsPerBatch`` and repartition by
payload size so one task never holds a skewed set of 100 MB videos.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

#: Output schema of the metadata decode pass.
DECODE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("byte_len", LongType(), False),
        StructField("fake_width", LongType(), False),
        StructField("fake_height", LongType(), False),
        StructField("n_frames", LongType(), False),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Make an opaque binary payload column (here: the utf-8 bytes of the
    text column — stands in for real image/audio bytes)."""
    return df.withColumn("payload", F.col(text_col).cast("binary"))


def decode_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata decode over the binary payload column.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame;
    we emit one metadata row per input row. This is the real plumbing a
    production image/audio decode would use — replace the STUB header
    parse below with the actual codec call.

    The closure is deliberately SELF-CONTAINED (imports inside, no
    references to this module's globals): Python workers unpickle the
    function on executors where this package may not be on ``sys.path``
    — a module-level helper reference would fail with
    ``ModuleNotFoundError`` on any cluster that didn't ship the package
    via ``--py-files``.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            lens = pdf["payload"].map(len).astype("int64")
            # STUB: deterministic fake of a media-header parse (magic
            # bytes / container headers). Formulas are arbitrary but
            # fixed so the oracle can check the plumbing end to end.
            yield _pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": lens,
                    "fake_width": 64 + lens % 577,
                    "fake_height": 64 + (lens * 7) % 417,
                    "n_frames": 1 + lens % 30,
                }
            )

    return df.select(id_col, "payload").mapInPandas(decode, DECODE_META_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
    ]
)


def sample_frames(df: DataFrame, id_col: str = "doc_id", stride: int = 7) -> DataFrame:
    """Frame sampling over the (stubbed) video payload: one output row
    per sampled frame — the one-to-MANY ``mapInPandas`` shape (decode
    emits a row per input; this explodes). Frames are every *stride*-th
    index of the fake ``n_frames`` count; a real implementation would
    seek keyframes in the container instead.

    Self-contained closure (see decode_meta)."""

    def sample(batches):
        import pandas as _pd

        for pdf in batches:
            ids, frames = [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                n_frames = 1 + len(payload) % 30  # matches decode_meta STUB
                for idx in range(0, n_frames, stride):
                    ids.append(doc_id)
                    frames.append(idx)
            yield _pd.DataFrame({"doc_id": ids, "frame_idx": frames})

    return df.select(id_col, "payload").mapInPandas(sample, FRAME_SAMPLE_SCHEMA)


def decode_image(df: DataFrame):
    """Pixel decode — NOT IMPLEMENTED in this container (no PIL/ffmpeg).

    The production version mirrors :func:`decode_meta` but yields
    ``array<float>`` pixel tensors (or resized thumbnails) per row.
    """
    raise NotImplementedError(
        "image decode requires a codec library not present in this "
        "container; see decode_meta for the identical mapInPandas plumbing"
    )
