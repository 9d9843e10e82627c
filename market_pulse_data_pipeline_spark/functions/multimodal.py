"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the actual decode is STUBBED:
``decode_media`` raises ``NotImplementedError`` when ``real=True`` and the
codec import fails, and otherwise produces a deterministic fake feature
vector derived from the bytes. Everything Spark-side — schema, batch
iteration shape, partition-parallel execution, column pruning around the
UDF — is real and tested.

At 100 TB the pattern matters more than the codec: binary payloads stay
columnar in parquet, the UDF sees Arrow batches (no per-row pickling),
and metadata predicates (media_type, byte_size) are pushed down BEFORE
bytes are ever shipped to Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("byte_size", T.IntegerType(), True),
        T.StructField("content_sha", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def documents_to_media(docs: DataFrame) -> DataFrame:
    """Manufacture a deterministic media table from the documents fixture:
    text bytes play the role of an encoded payload."""
    content = F.encode("text", "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        content.alias("content"),
        F.octet_length(content).alias("byte_size"),
        F.sha2(content, 256).alias("content_sha"),
    )


def _fake_decode(payload: bytes, media_type: str, feat_dim: int) -> dict:
    """Deterministic stand-in for a codec: features from a SHA-256 keyed
    byte expansion; 'dimensions' from payload length.

    The expansion chains over HEX STRINGS (``hexdigest`` + an ASCII
    counter), not raw digests, so every hash input is plain ASCII and an
    ANSI-SQL engine whose sha256() takes VARCHAR (DuckDB) can reproduce
    the exact feature bytes — that is what lets the registry's
    ``media_decode_features`` row carry a full value-hash oracle for the
    distributed plumbing rather than a rows-only check.
    """
    digest_hex = hashlib.sha256(payload or b"").hexdigest()
    feats = []
    counter = 0
    while len(feats) < feat_dim:
        raw = hashlib.sha256(
            f"{digest_hex}:{counter}".encode("ascii")
        ).hexdigest()
        feats.extend(
            int(raw[i : i + 2], 16) / 255.0 for i in range(0, 64, 2)
        )
        counter += 1
    n = len(payload or b"")
    return {
        "feature": feats[:feat_dim],
        "width": (n % 640) + 16 if media_type in ("image", "video") else None,
        "height": (n % 480) + 16 if media_type in ("image", "video") else None,
        "n_frames": (n % 120) + 1 if media_type in ("audio", "video") else 1,
    }


def decode_media(
    media: DataFrame, feat_dim: int = 16, real: bool = False
) -> DataFrame:
    """Binary payload → feature vector + dimensions, via mapInPandas.

    ``real=True`` requires an actual codec (PIL / soundfile / av) — not
    available in this container, so it raises NotImplementedError; the
    deterministic fake keeps the distributed plumbing testable.
    """
    if real:
        try:
            import PIL  # noqa: F401, PLC0415
        except ImportError as e:
            raise NotImplementedError(
                "real media decode needs an image/audio codec (PIL/soundfile/"
                "av), not installed in this environment — use real=False"
            ) from e

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                _fake_decode(c, mt, feat_dim)
                for c, mt in zip(pdf["content"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": [d["feature"] for d in decoded],
                    "width": pd.array(
                        [d["width"] for d in decoded], dtype="Int32"
                    ),
                    "height": pd.array(
                        [d["height"] for d in decoded], dtype="Int32"
                    ),
                    "n_frames": pd.array(
                        [d["n_frames"] for d in decoded], dtype="Int32"
                    ),
                }
            )

    return media.select("media_id", "media_type", "content").mapInPandas(
        batches, FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video → sampled frame rows (media_id, frame_index). The sampling
    grid is computed JVM-side from metadata only — payload bytes are not
    touched until a downstream decode, which is the property that matters
    when frames outnumber videos 1000:1."""
    videos = media.filter(F.col("media_type") == "video")
    n_frames = (F.col("byte_size") % 120) + 1  # mirrors the stub decoder
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_index"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("src_width", T.IntegerType(), True),
        T.StructField("src_height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("resized_len", T.IntegerType(), True),
        T.StructField("resized_sha", T.StringType(), True),
    ]
)


def _fake_resize(payload: bytes, w: int, h: int) -> dict:
    """Deterministic stand-in for an image resize: the 'resized payload'
    is a SHA-keyed expansion sized to the target pixel count, so output
    bytes depend on (source bytes, target dims) exactly like a real
    resample would.

    Like ``_fake_decode``, the chaining stays in the HEX-STRING domain
    (ASCII inputs only) so DuckDB's VARCHAR-only sha256() reproduces
    ``resized_sha`` exactly — the ``media_resize`` registry row
    hash-checks the full mapInPandas plumbing against that SQL twin.
    """
    n = len(payload or b"")
    digest_hex = hashlib.sha256(payload or b"").hexdigest()
    key = hashlib.sha256(
        f"{digest_hex}:resize:{w}x{h}".encode("ascii")
    ).hexdigest()
    target_len = max(1, (w * h) // 64)
    out = (key * (target_len // len(key) + 1))[:target_len]
    return {
        "src_width": (n % 640) + 16,  # mirrors _fake_decode's dims
        "src_height": (n % 480) + 16,
        "resized_len": len(out),
        "resized_sha": hashlib.sha256(out.encode("ascii")).hexdigest(),
    }


def resize_media(
    media: DataFrame, width: int = 64, height: int = 64, real: bool = False
) -> DataFrame:
    """Image/video payloads → fixed target dimensions via mapInPandas —
    the batch-resize step before visual feature extraction.

    Same plumbing contract as ``decode_media``: audio rows are filtered
    out BEFORE bytes ship to Python, the UDF sees Arrow batches, and
    ``real=True`` raises until an actual codec is installed (the
    deterministic fake keeps schema/partitioning/batch shape testable).
    """
    if real:
        try:
            import PIL  # noqa: F401, PLC0415
        except ImportError as e:
            raise NotImplementedError(
                "real media resize needs an image codec (PIL), not "
                "installed in this environment — use real=False"
            ) from e

    visual = media.filter(F.col("media_type").isin("image", "video"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [_fake_resize(c, width, height) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "src_width": pd.array(
                        [r["src_width"] for r in resized], dtype="Int32"
                    ),
                    "src_height": pd.array(
                        [r["src_height"] for r in resized], dtype="Int32"
                    ),
                    "width": pd.array([width] * len(pdf), dtype="Int32"),
                    "height": pd.array([height] * len(pdf), dtype="Int32"),
                    "resized_len": pd.array(
                        [r["resized_len"] for r in resized], dtype="Int32"
                    ),
                    "resized_sha": [r["resized_sha"] for r in resized],
                }
            )

    return visual.select("media_id", "media_type", "content").mapInPandas(
        batches, RESIZE_SCHEMA
    )


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("win_id", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("n_zero_cross", T.IntegerType(), False),
    ]
)


def audio_window_energy(
    media: DataFrame, win: int = 400, hop: int = 160
) -> DataFrame:
    """Frame audio payloads into overlapping sample windows and compute
    per-window RMS energy + mean-crossing counts — the VAD/segmentation
    front end of an audio pipeline (win=400, hop=160 are the classic
    25 ms / 10 ms at 16 kHz).

    The payload BYTES are treated as unsigned 8-bit PCM (the fixture's
    deterministic stand-in — a real i16/f32 decode swaps one frombuffer
    dtype). Plumbing is the module's standard shape: audio rows are
    pruned JVM-side BEFORE Python, the windowing runs as an
    Arrow-batched mapInPandas over numpy views (no per-window copy),
    and output rows are windows, not samples — ~n/hop rows per clip.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # noqa: PLC0415

        for pdf in it:
            out: dict[str, list] = {
                "media_id": [],
                "win_id": [],
                "n_samples": [],
                "rms": [],
                "n_zero_cross": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                x = np.frombuffer(payload or b"", dtype=np.uint8).astype(
                    np.float64
                )
                if len(x) == 0:
                    continue
                mean = x.mean()
                centered = x - mean
                n_win = max(0, (len(x) - win) // hop) + (
                    1 if len(x) >= win else 0
                )
                if n_win == 0:  # short clip: one truncated window
                    n_win = 1
                for w_i in range(n_win):
                    seg = centered[w_i * hop : w_i * hop + win]
                    out["media_id"].append(mid)
                    out["win_id"].append(w_i)
                    out["n_samples"].append(len(seg))
                    out["rms"].append(
                        float(np.sqrt((seg * seg).mean()))
                    )
                    out["n_zero_cross"].append(
                        int((np.signbit(seg[1:]) != np.signbit(seg[:-1])).sum())
                    )
            yield pd.DataFrame(out)

    audio = media.filter(F.col("media_type") == "audio").select(
        "media_id", "content"
    )
    return audio.mapInPandas(batches, AUDIO_WINDOW_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("win_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("sum_amp", T.LongType(), False),
        T.StructField("ssq_amp", T.LongType(), False),
        T.StructField("n_mean_cross", T.LongType(), False),
    ]
)


def audio_window_stats(
    media: DataFrame, win: int = 400, hop: int = 160
) -> DataFrame:
    """``audio_window_energy`` with integer-exact outputs — the
    hash-checkable twin.

    Same framing (win/hop overlapping windows, one truncated window for
    short clips) and the same Arrow-batched mapInPandas plumbing, but
    per-window RMS (a libm sqrt — not cross-engine portable) is replaced
    by its sufficient statistics: ``sum_amp`` and ``ssq_amp`` (int64
    sums of raw u8 samples and their squares; RMS of the centered signal
    is derivable as sqrt(ssq/n - (sum/n - clip_mean)^2 ...) driver-side),
    and the mean-crossing count is computed on exact integers —
    ``x*n < S`` replaces ``signbit(x - S/n)`` without ever forming the
    float mean. Every output column is int64, so a SQL engine exploding
    the same bytes reproduces the values bit-for-bit.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # noqa: PLC0415

        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in AUDIO_STATS_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                x = np.frombuffer(payload or b"", dtype=np.uint8).astype(
                    np.int64
                )
                n = len(x)
                if n == 0:
                    continue
                total = int(x.sum())
                # sample is "below clip mean" iff x*n < S — exact in int64
                neg = x * n < total
                n_win = (n - win) // hop + 1 if n >= win else 1
                for w_i in range(n_win):
                    seg = x[w_i * hop : w_i * hop + win]
                    seg_neg = neg[w_i * hop : w_i * hop + win]
                    out["media_id"].append(mid)
                    out["win_id"].append(w_i)
                    out["n_samples"].append(len(seg))
                    out["sum_amp"].append(int(seg.sum()))
                    out["ssq_amp"].append(int((seg * seg).sum()))
                    out["n_mean_cross"].append(
                        int((seg_neg[1:] != seg_neg[:-1]).sum())
                    )
            yield pd.DataFrame(out)

    audio = media.filter(F.col("media_type") == "audio").select(
        "media_id", "content"
    )
    return audio.mapInPandas(batches, AUDIO_STATS_SCHEMA)
