"""Multimodal-column operators (SURVEY.md §2.9 X5 + build charter).

Model: media payloads are opaque ``binary`` columns travelling next to
typed metadata (a struct: modality, mime, width/height/duration…).
Feature extraction / decode / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages — the Spark-side plumbing
(schemas, batch shapes, partitioning) is real and tested; the actual
codec call is stubbed behind ``DECODERS`` because no image/audio
libraries ship in this container. Swapping a stub for PIL/ffmpeg
changes one dict entry, not the pipeline.

JSON props parsing (the ``events.props`` column) is native
``get_json_object``/``from_json`` — no Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 4 cheap byte-level
    statistics. A real build replaces this with PIL/torchaudio/ffmpeg
    decode + model features."""
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    n = len(payload)
    return [
        float(n),
        float(sum(payload) % 997),
        float(payload[0]),
        float(payload[-1]),
    ]


def _unavailable_decode(payload: bytes) -> list[float]:
    raise NotImplementedError(
        "real media decoding requires PIL/ffmpeg — not present in this "
        "container; use the 'fake' decoder for plumbing tests"
    )


DECODERS = {"fake": _fake_decode, "real": _unavailable_decode}


def attach_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal frame from a text table: payload = utf-8
    bytes of the text (deterministic fake media), metadata struct
    populated. Stands in for reading real image/audio blobs."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(text_col)).cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, decoder: str = "fake", batch_hint: int = 256
) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas``: Arrow-batched, one
    Python worker per partition, bounded memory per batch. At 100 TB
    this stage is embarrassingly parallel; throughput is bounded by the
    codec, not Spark."""
    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(lambda p: decode(bytes(p)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["meta"].map(
                        lambda m: m["modality"] if m is not None else None
                    ),
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "checksum": feats.map(lambda f: int(f[1])),
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)


def resize_media(
    media: DataFrame, width: int, height: int, decoder: str = "fake"
) -> DataFrame:
    """Resize stage: payload in → payload out, metadata rewritten to
    the new dimensions. The fake codec crops to ``width*height`` bytes
    (deterministic, oracle-recomputable); a real build calls
    PIL.Image.resize inside the same batch loop. Row-preserving (1:1),
    so it composes with ``extract_features`` in one pipeline."""
    if decoder == "real":
        _unavailable_decode(b"")
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda p: bytes(p)[:target] if p is not None else None
            )
            meta = pdf["meta"].map(
                lambda m: {
                    "modality": m["modality"] if m is not None else None,
                    "mime": m["mime"] if m is not None else None,
                    "width": width,
                    "height": height,
                    "duration_ms": m["duration_ms"] if m is not None else None,
                }
            )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": resized, "meta": meta}
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 32,
    stride: int = 2,
    max_frames: int = 5,
    decoder: str = "fake",
) -> DataFrame:
    """Frame-sampling stage: one media row → N frame rows (the batch
    shape changes inside ``mapInPandas``, which a column-wise UDF
    can't do). The fake codec treats the payload as fixed-size frames
    of ``frame_bytes`` and keeps every ``stride``-th one up to
    ``max_frames``; a real build seeks an ffmpeg demuxer the same way.
    Empty payloads yield zero rows — exactly like a 0-frame video."""
    if decoder == "real":
        _unavailable_decode(b"")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "offset": [], "n_bytes": [], "frame": [],
            }
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p) if p is not None else b""
                total = (len(b) + frame_bytes - 1) // frame_bytes
                for j, idx in enumerate(range(0, total, stride)):
                    if j >= max_frames:
                        break
                    off = idx * frame_bytes
                    chunk = b[off : off + frame_bytes]
                    out["doc_id"].append(did)
                    out["frame_idx"].append(idx)
                    out["offset"].append(off)
                    out["n_bytes"].append(len(chunk))
                    out["frame"].append(chunk)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FRAME_SCHEMA)


def parse_props(
    df: DataFrame, props_col: str, fields: dict[str, str]
) -> DataFrame:
    """X5/native — JSON props extraction with ``get_json_object``
    (JVM-side JSON path, no Python): fields = {name: spark_type}."""
    cols = [df["*"]]
    for name, typ in fields.items():
        cols.append(
            F.get_json_object(F.col(props_col), f"$.{name}").cast(typ).alias(name)
        )
    return df.select(*cols)


def parse_props_typed(
    df: DataFrame, props_col: str, schema: T.StructType
) -> DataFrame:
    """X5 — ``from_json`` with a declared StructType: the schema-first
    form (one parse per row into a typed struct; preferable to N
    path extractions when many fields are consumed). Malformed JSON →
    NULL struct, per Spark's PERMISSIVE default."""
    return df.withColumn("__props", F.from_json(F.col(props_col), schema)).select(
        "*", F.col("__props.*")
    ).drop("__props")
