"""Multimodal column plumbing (beyond-reference).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side plumbing — schema, partition-friendly batch shape,
Arrow-batched ``mapInPandas`` signatures — is real and tested; the actual
codec step is STUBBED (decode libraries are not in this container): pass
``decoder="fake"`` for a deterministic stand-in, or get a clear
``NotImplementedError`` naming the missing dependency.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct attached next to every media column.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_size", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def attach_media_column(
    df: DataFrame, source_col: str, media_col: str = "media", media_type: str = "image"
) -> DataFrame:
    """Wrap a column's bytes as an opaque media column + metadata struct.

    (Test data has no real binaries, so ``source_col`` text is encoded as the
    payload; with real data this is the ingestion point for raw bytes.)
    """
    payload = F.encode(F.col(source_col).cast("string"), "utf-8")
    return df.withColumn(media_col, payload).withColumn(
        f"{media_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(payload).cast("long").alias("byte_size"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


def _fake_decode(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for an image decoder: derives a plausible
    (width, height) from the payload bytes. Keeps the Arrow batch shape and
    output schema identical to a real decoder."""
    sizes = batch["media"].map(len)
    width = (sizes % 640 + 1).astype("int32")
    height = (sizes % 480 + 1).astype("int32")
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "width": width,
            "height": height,
            "n_pixels": (width * height).astype("int64"),
            "checksum": batch["media"].map(
                lambda b: __import__("hashlib").sha256(b).hexdigest()[:16]
            ),
        }
    )


def decode_images(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    decoder: str = "pillow",
) -> DataFrame:
    """Decode media payloads into per-item dimensions via ``mapInPandas``.

    Real decoding needs an image library not present in this container —
    requesting ``decoder="pillow"`` raises ``NotImplementedError`` at plan
    time. ``decoder="fake"`` runs the deterministic stub through the real
    distributed plumbing (Arrow batches, per-partition map, typed schema).
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r} requires an image codec library (e.g. Pillow) "
            "which is not available in this environment; use decoder='fake' "
            "to exercise the pipeline with the deterministic stub"
        )

    cols = [id_col, media_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = _fake_decode(batch.rename(columns={media_col: "media", id_col: "doc_id"}))
            yield out

    return df.select(*cols).mapInPandas(run, schema=DECODED_IMAGE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, media_col: str = "media", every_nth: int = 30
) -> DataFrame:
    """Video frame-sampling plumbing: emits (doc, frame_index) rows without
    decoding — the downstream decoder consumes the exploded plan. Frame count
    is stubbed from byte_size (a real demuxer would read container headers).
    """
    # floor-division keeps the arithmetic portable (double->int casts round
    # in DuckDB but truncate in Spark)
    est_frames = (
        F.floor(F.col(f"{media_col}_meta.byte_size") / 100) + 1
    ).cast("int")
    idx = F.sequence(F.lit(0).cast("long"), (est_frames - 1).cast("long"), F.lit(every_nth).cast("long"))
    return df.withColumn("frame_index", F.explode(idx))


# ---------------------------------------------------------------------------
# WAV audio: REAL codec, stdlib-only (RIFF headers need no external libs)
# ---------------------------------------------------------------------------
WAV_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.DoubleType()),
    ]
)


def synthesize_wav_column(
    df: DataFrame, id_col: str = "doc_id", n_tokens_col: str = "n_tokens"
) -> DataFrame:
    """(id, media) with a VALID little-endian RIFF/WAVE payload per row —
    deterministic parameters derived from the id and token count, so an
    external oracle can predict what the decoder must recover. Arrow-batched
    generation (this is the ingestion shape real audio bytes would arrive
    in)."""
    import struct as st

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = []
            for did, ntok in zip(batch[id_col], batch[n_tokens_col]):
                rate = 8000 + int(did % 3) * 4000
                ch = 1 + int(did % 2)
                n_samp = int(ntok) * 10
                data = bytes(n_samp * ch * 2)  # 16-bit silence
                hdr = (
                    b"RIFF" + st.pack("<I", 36 + len(data)) + b"WAVE"
                    + b"fmt " + st.pack("<IHHIIHH", 16, 1, ch, rate,
                                        rate * ch * 2, ch * 2, 16)
                    + b"data" + st.pack("<I", len(data))
                )
                payloads.append(hdr + data)
            yield pd.DataFrame({id_col: batch[id_col], "media": payloads})

    src = df.select(id_col, n_tokens_col)
    return src.mapInPandas(gen, schema=f"{id_col} long, media binary")


def decode_wav_meta(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """REAL WAV decoding — walks the RIFF chunk list with ``struct`` and
    recovers format parameters from the bytes alone (no external codec
    library; contrast the image/video decoders, which stay honestly
    stubbed). Malformed payloads raise rather than return garbage."""
    import struct as st

    # output id column follows id_col (schema rebuilt below), so callers
    # with a differently-named id keep their label instead of "doc_id"
    out_schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType)]
        + [f for f in WAV_META_SCHEMA.fields[1:]]
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k: [] for k in (id_col, "sample_rate", "channels",
                                   "bit_depth", "n_samples", "duration_ms")}
            for did, blob in zip(batch[id_col], batch[media_col]):
                b = bytes(blob)
                if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError(f"doc {did}: not a RIFF/WAVE payload")
                pos, fmt, data_size = 12, None, None
                while pos + 8 <= len(b):
                    cid, size = b[pos:pos + 4], st.unpack("<I", b[pos + 4:pos + 8])[0]
                    body = b[pos + 8:pos + 8 + size]
                    if cid == b"fmt ":
                        fmt = st.unpack("<HHIIHH", body[:16])
                    elif cid == b"data":
                        data_size = size
                    pos += 8 + size + (size & 1)   # chunks are word-aligned
                if fmt is None or data_size is None:
                    raise ValueError(f"doc {did}: missing fmt/data chunk")
                _audio_fmt, ch, rate, _brate, _align, bits = fmt
                n_samp = data_size // (ch * (bits // 8))
                out[id_col].append(did)
                out["sample_rate"].append(rate)
                out["channels"].append(ch)
                out["bit_depth"].append(bits)
                out["n_samples"].append(n_samp)
                out["duration_ms"].append(round(n_samp * 1000.0 / rate, 3))
            yield pd.DataFrame(out)

    return df.mapInPandas(parse, schema=out_schema)
