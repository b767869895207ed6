"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct (mime, byte_len, checksum) — the lakehouse-native
representation (the same shape Spark's built-in ``binaryFile`` source
produces). Decode/resize/frame-sample are Pandas-UDF stages over
``mapInPandas``: Arrow moves the bytes in columnar batches, the Python
worker touches each batch once.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so
the decode step is STUBBED: ``decode_image`` raises
NotImplementedError unless PIL is importable, and
``extract_features`` ships a deterministic fake featurizer so the
Spark-side contract — schema, batch iteration, partitioning — is real
and tested end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id BIGINT, byte_len BIGINT, checksum STRING, byte_mean DOUBLE, feature STRING"
)


def to_binary_column(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Wrap content as (payload binary, meta struct) — the multimodal
    envelope. Here the payload is utf-8 bytes of the text column (the
    container has no media files); a real pipeline points the same
    shape at ``spark.read.format('binaryFile')`` output."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("bigint").alias("byte_len"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """STUB: decode an image payload. Real implementation requires PIL,
    which is not installed in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL (not in this environment); "
            "the surrounding Spark plumbing is real — swap this function body"
        ) from e
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


def extract_features(df: DataFrame, batch_size_hint: int | None = None) -> DataFrame:
    """Feature-extraction stage over multimodal rows via mapInPandas.

    The featurizer here is a deterministic fake (byte statistics +
    checksum echo) standing in for a vision/audio model forward pass;
    the batch shape (pandas DataFrame per Arrow batch, one yield per
    batch) is exactly what a GPU-batched model needs.
    """
    import hashlib

    import pandas as pd

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "byte_mean": payloads.map(
                        lambda b: (sum(b) / len(b)) if len(b) else 0.0
                    ).astype("float64"),
                    "feature": payloads.map(lambda b: f"fake-feat-{len(b) % 7}"),
                }
            )

    return df.mapInPandas(featurize, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = "doc_id BIGINT, payload BINARY, width INT, height INT, checksum STRING"


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage over multimodal rows (mapInPandas, 1→1).

    With PIL present this would decode→resize→re-encode each payload;
    here the transform is a deterministic stand-in (payload truncated/
    cycled to the target w·h·3 byte budget) so the plumbing — Arrow
    batch in, binary column out, metadata recomputed — is real and the
    output is bit-reproducible for tests/oracles."""
    import hashlib

    import pandas as pd

    target = width * height * 3

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fake_resize(b: bytes) -> bytes:
                if not b:
                    return b"\x00" * target
                reps = -(-target // len(b))  # ceil
                return (b * reps)[:target]

            out = pdf["payload"].map(fake_resize)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                    "checksum": out.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return df.mapInPandas(do_resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id BIGINT, frame_idx BIGINT, frame BINARY, frame_len BIGINT"


def sample_frames(
    df: DataFrame, chunk_bytes: int = 64, every_nth: int = 2
) -> DataFrame:
    """Frame-sampling stage (mapInPandas, 1→N fan-out — the shape a
    video pipeline needs: one input blob yields many frame rows).

    The deterministic stand-in treats the payload as fixed-size chunks
    ("frames") and keeps every n-th; a real implementation swaps the
    chunker for an ffmpeg keyframe iterator, and the Spark contract
    (schema, multiple output rows per input row, batch-local memory)
    is unchanged."""
    import pandas as pd

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                chunks = [
                    payload[o : o + chunk_bytes]
                    for o in range(0, len(payload), chunk_bytes)
                ]
                for i, ch in enumerate(chunks):
                    if i % every_nth == 0:
                        ids.append(doc_id)
                        idxs.append(i)
                        frames.append(ch)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": pd.Series(frames, dtype=object),
                    "frame_len": pd.Series([len(f) for f in frames], dtype="int64"),
                }
            )

    return df.mapInPandas(do_sample, schema=FRAME_SCHEMA)


#: fake decode rate for the duration stand-in: 4 ms of audio per
#: payload byte (a real decoder would read the container header)
AUDIO_MS_PER_BYTE = 4


def segment_audio(df: DataFrame, segment_ms: int = 4000) -> DataFrame:
    """Split audio payloads into fixed-duration segments — the
    chunking stage of a speech/ASR ingestion pipeline (1→N rows).

    Spark-first: this is NOT a UDF — the duration model (bytes →
    milliseconds, here the deterministic ``AUDIO_MS_PER_BYTE``
    stand-in for a container-header read), the segment lattice
    (``sequence`` + ``explode``), the time bounds and the payload
    SLICES (binary ``substring``) all run as JVM expressions in
    whole-stage codegen — zero Python in the scan, at any corpus
    size. A real decoder would only replace the duration model and
    re-encode step behind the same schema. Output:
    ``doc_id, seg_no, start_ms, end_ms, seg_payload``; slices
    reassemble to the exact original payload (asserted in tests).

    ``segment_ms`` must be a positive multiple of
    ``AUDIO_MS_PER_BYTE`` — otherwise the byte lattice derived by
    integer division would drift from the millisecond lattice and
    the slices would no longer reassemble losslessly."""
    if segment_ms <= 0 or segment_ms % AUDIO_MS_PER_BYTE != 0:
        raise ValueError(
            f"segment_ms must be a positive multiple of "
            f"AUDIO_MS_PER_BYTE={AUDIO_MS_PER_BYTE}; got {segment_ms} — "
            f"a non-aligned segment would make the byte lattice drift "
            f"from the ms lattice and break lossless reassembly"
        )
    dur = F.length("payload") * F.lit(AUDIO_MS_PER_BYTE)
    n_seg = F.ceil(dur / F.lit(segment_ms)).cast("long")
    seg = df.select(
        "doc_id",
        "payload",
        dur.alias("_dur"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.greatest(n_seg - 1, F.lit(0)))
        ).alias("seg_no"),
    ).filter((F.col("seg_no") == 0) | (F.col("seg_no") * segment_ms < F.col("_dur")))
    start = F.col("seg_no") * segment_ms
    end = F.least(F.col("_dur"), start + segment_ms)
    return seg.select(
        "doc_id",
        "seg_no",
        start.alias("start_ms"),
        end.alias("end_ms"),
        F.expr("substring(payload, CAST(seg_no AS INT) * " +
               f"{segment_ms // AUDIO_MS_PER_BYTE} + 1, " +
               f"{segment_ms // AUDIO_MS_PER_BYTE})").alias("seg_payload"),
    )
