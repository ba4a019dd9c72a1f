"""Multimodal column plumbing (SURVEY.md §2 B11): image/audio/video
payloads as opaque ``binary`` columns with typed metadata, processed
by Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the DECODE step is
stubbed behind ``decode_available()`` (returns a deterministic fake
when the real codec import fails — clearly marked).  Everything
Spark-side is real and tested: the schema contract, the binary
payload construction, the Arrow batch shape, the partition-size
guard, and the feature-extraction UDF signature.

100 TB design notes:
- payloads travel as parquet ``binary``; metadata (mime, width, dur…)
  as a sibling STRUCT column so filters on metadata prune row groups
  WITHOUT reading payload bytes (parquet column projection);
- ``mapInPandas`` receives an ITERATOR of Arrow batches — the UDF
  must stream batch-by-batch, never materialize the partition
  (a partition of 128 MB payloads would OOM a pandas concat);
- ``spark.sql.files.maxPartitionBytes`` (not row count) is the right
  partition knob when rows are megabytes each.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import query
from ..sources.readers import load_table

# Schema contract for a multimodal asset table.
MM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("payload_len", LongType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("payload_len", LongType(), False),
        StructField("first_byte", IntegerType(), True),
        StructField("byte_sum_mod", LongType(), True),
        StructField("n_frames", IntegerType(), True),
        # real-decode columns: populated only for payloads an image
        # codec can actually parse; NULL (decoded=0) otherwise.  The
        # schema is ENVIRONMENT-STABLE: with or without PIL installed,
        # the same columns come back — only their values differ, and on
        # non-image payloads (this fixture) not even those.
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("px_mode", StringType(), True),
        StructField("decoded", IntegerType(), False),
    ]
)


def decode_available() -> bool:
    """True if a real image codec is importable in this environment."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def make_feature_kernel(have_codec: bool):
    """Build the mapInPandas kernel: stream Arrow batches, emit one
    feature row per payload.  Byte-derived features (first_byte,
    byte_sum_mod, n_frames) are computed unconditionally — they are
    exact and codec-free.  The DECODE columns (width/height/px_mode)
    use PIL when ``have_codec`` and the payload parses as an image;
    any per-row decode failure degrades to NULLs + decoded=0, never an
    executor exception (VERDICT r3 "codec landmine": the old kernel
    raised NotImplementedError the moment PIL appeared on a cluster).

    Returned as a closure (not a module-level function) so cloudpickle
    serializes it BY VALUE — executor workers don't import this
    package when the driver loads __spark_entry__.py by file path."""

    def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = None
        if have_codec:
            import io

            try:
                from PIL import Image

                def decode(b):  # noqa: ANN001 — bytes-like in, tuple/None out
                    try:
                        with Image.open(io.BytesIO(bytes(b))) as im:
                            return int(im.size[0]), int(im.size[1]), str(im.mode)
                    except Exception:  # noqa: BLE001 — undecodable payload row
                        return None
            except ImportError:
                # Driver probed a codec the executor image lacks —
                # degrade to the codec-free path rather than die.
                decode = None
        for pdf in batches:
            payloads = pdf["payload"]
            dec = [decode(b) if decode is not None else None for b in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "payload_len": pdf["payload_len"],
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else None),
                    "byte_sum_mod": payloads.map(lambda b: sum(b) % 1000003),
                    "n_frames": payloads.map(lambda b: max(1, len(b) // 64)),
                    "width": [d[0] if d else None for d in dec],
                    "height": [d[1] if d else None for d in dec],
                    "px_mode": [d[2] if d else None for d in dec],
                    "decoded": [1 if d else 0 for d in dec],
                }
            )

    return extract_features


def as_multimodal(docs: DataFrame) -> DataFrame:
    """Build a multimodal asset table from the documents fixture:
    payload = utf-8 bytes of the text (a stand-in for image bytes),
    mime derived from the source id.  Schema matches MM_SCHEMA."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.concat(F.lit("application/x-fixture-"), F.col("source")).alias("mime"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("payload_len"),
    )


@query(
    "b_mm_meta",
    """
    SELECT doc_id,
           'application/x-fixture-' || source AS mime,
           octet_length(encode(text)) AS payload_len,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def mm_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only pass over a multimodal table: mime, payload
    length, content hash — reads NO payload bytes beyond the hash
    column's own scan.  At 100 TB this is the query pattern that must
    prune the payload column entirely; keeping metadata in sibling
    scalar columns (not inside the binary) is what makes that a
    parquet column-projection, not a decode."""
    docs = load_table(spark, sf_dir, "documents")
    mm = as_multimodal(docs)
    # md5 over the payload BYTES equals DuckDB's md5 over the utf-8
    # string — same bytes, engine-portable.
    return mm.select(
        "doc_id",
        "mime",
        "payload_len",
        F.md5(F.col("payload")).alias("payload_md5"),
    )


@query(
    "b_mm_features",
    """
    WITH t AS (
      SELECT doc_id,
             'application/x-fixture-' || source AS mime,
             encode(text) AS b
      FROM documents
    )
    SELECT doc_id, mime,
           CAST(octet_length(b) AS BIGINT) AS payload_len,
           coalesce(CASE WHEN octet_length(b) > 0
                         THEN CAST(('0x' || substr(hex(b), 1, 2)) AS INT)
                    END, -1) AS first_byte,
           CAST(coalesce(list_aggregate(
               list_transform(generate_series(1, octet_length(b)),
                              i -> CAST(('0x' || substr(hex(b), 2*i-1, 2)) AS BIGINT)),
               'sum'), 0) % 1000003 AS BIGINT) AS byte_sum_mod,
           CAST(greatest(1, octet_length(b) // 64) AS INT) AS n_frames,
           CAST(-1 AS INT) AS width,
           CAST(-1 AS INT) AS height,
           CAST('none' AS VARCHAR) AS px_mode,
           CAST(0 AS INT) AS decoded
    FROM t
    """,
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the decode/resize/frame-sample slot.  The
    byte-derived features are exact, so the query is ORACLE-PROVEN:
    the DuckDB twin recomputes first_byte/byte_sum_mod from the blob's
    hex expansion, and the decode columns are NULL/0 on this fixture
    in ANY environment — the payloads are utf-8 text, so PIL (when
    present) fails per-row and the kernel degrades to the same NULLs
    the codec-free path emits.  A real deployment gets real
    width/height/px_mode for real images from the same plan."""
    docs = load_table(spark, sf_dir, "documents")
    mm = as_multimodal(docs)
    kernel = make_feature_kernel(decode_available())
    feats = mm.mapInPandas(kernel, schema=FEATURE_SCHEMA)
    # Canon-safe projection: sentinel-fill the decode columns (an
    # all-NULL INT column round-trips as NaN-float through the
    # harness's pandas fetch, hashing differently from Spark's None).
    return feats.select(
        "doc_id",
        "mime",
        "payload_len",
        F.coalesce("first_byte", F.lit(-1)).alias("first_byte"),
        "byte_sum_mod",
        "n_frames",
        F.coalesce("width", F.lit(-1)).alias("width"),
        F.coalesce("height", F.lit(-1)).alias("height"),
        F.coalesce("px_mode", F.lit("none")).alias("px_mode"),
        "decoded",
    )


FRAME_BYTES = 64  # fixture stand-in: one "frame" per 64 payload bytes
MAX_SAMPLED_FRAMES = 8


@query(
    "b_mm_framesample",
    f"""
    WITH f AS (
      SELECT doc_id,
             greatest(1, octet_length(encode(text)) // {FRAME_BYTES})
               AS n_frames
      FROM documents
    ),
    strided AS (
      SELECT doc_id, n_frames,
             CAST(ceil(n_frames * 1.0 / {MAX_SAMPLED_FRAMES}) AS BIGINT)
               AS stride
      FROM f
    )
    SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
           CAST(u.frame_idx AS BIGINT) AS frame_idx,
           CAST(u.frame_idx * {FRAME_BYTES} AS BIGINT) AS frame_offset
    FROM strided,
         LATERAL (SELECT unnest(generate_series(0, n_frames - 1, stride))
                  AS frame_idx) u
    """,
)
def mm_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plan for video-like payloads: stride-sample at
    most MAX_SAMPLED_FRAMES frame indices per asset from the frame
    count, emitting (frame_idx, byte offset) rows — exactly the work
    list a decode kernel (``b_mm_features``'s mapInPandas slot) would
    consume.  The sampling plan itself never touches payload bytes:
    frame count is metadata arithmetic, so the 100 TB planning pass is
    a payload-pruned scan + generator, and only the sampled (asset,
    offset) pairs reach the expensive decode stage.  Deterministic
    integer arithmetic end-to-end — hash-checked against the twin."""
    docs = load_table(spark, sf_dir, "documents")
    mm = as_multimodal(docs)
    n_frames = F.greatest(F.lit(1), F.floor(F.col("payload_len") / FRAME_BYTES))
    strided = mm.select(
        "doc_id",
        n_frames.alias("n_frames"),
        F.ceil(n_frames / MAX_SAMPLED_FRAMES).alias("stride"),
    )
    return strided.select(
        "doc_id",
        F.col("n_frames").cast("long").alias("n_frames"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n_frames") - 1, F.col("stride"))
        ).alias("frame_idx"),
    ).withColumn("frame_offset", F.col("frame_idx") * FRAME_BYTES)


# ---------------------------------------------------------------- resize

THUMB_SIDE = 32  # codec-path thumbnail edge (pixels)
THUMB_MAX_BYTES = 1024  # byte-path sample cap


def make_resize_kernel(have_codec: bool):
    """mapInPandas kernel for the RESIZE slot: PIL thumbnail when the
    payload decodes, else a deterministic strided byte-sample
    "thumbnail" (every k-th byte, k = len // THUMB_MAX_BYTES, capped)
    — same per-row degrade discipline as the feature kernel, so a
    codec appearing on the cluster can never throw."""
    import hashlib

    def byte_thumb(b) -> tuple[int, int, int, bytes]:
        raw = bytes(b)
        k = max(1, len(raw) // THUMB_MAX_BYTES)
        t = raw[::k][:THUMB_MAX_BYTES]
        return -1, -1, len(t), t

    def run(batches):
        decode = None
        if have_codec:
            import io

            try:
                from PIL import Image

                def decode(b):  # noqa: ANN001
                    try:
                        with Image.open(io.BytesIO(bytes(b))) as im:
                            small = im.resize((THUMB_SIDE, THUMB_SIDE))
                            return (
                                THUMB_SIDE,
                                THUMB_SIDE,
                                len(small.tobytes()),
                                small.tobytes(),
                            )
                    except Exception:  # noqa: BLE001 — undecodable row
                        return None
            except ImportError:
                decode = None
        for pdf in batches:
            rows = {
                "doc_id": pdf["doc_id"],
                "payload_len": pdf["payload_len"],
                "method": [],
                "thumb_w": [],
                "thumb_h": [],
                "thumb_len": [],
                "thumb_md5": [],
            }
            for b in pdf["payload"]:
                d = decode(b) if decode is not None else None
                if d is None:
                    w, h, n, t = byte_thumb(b)
                    rows["method"].append("bytes")
                else:
                    w, h, n, t = d
                    rows["method"].append("codec")
                rows["thumb_w"].append(w)
                rows["thumb_h"].append(h)
                rows["thumb_len"].append(n)
                # hash the lowercase-hex rendering of the thumb bytes —
                # DuckDB's md5 is VARCHAR-only, and the strided sample
                # of utf-8 text is not itself valid text
                rows["thumb_md5"].append(hashlib.md5(t.hex().encode()).hexdigest())
            yield pd.DataFrame(rows)

    return run


@query(
    "b_mm_resize",
    f"""
    WITH t AS (
      SELECT doc_id, encode(text) AS b, octet_length(encode(text)) AS n
      FROM documents
    ),
    s AS (
      SELECT doc_id, n, greatest(1, n // {THUMB_MAX_BYTES}) AS k, hex(b) AS hx
      FROM t
    ),
    thumb AS (
      -- thumb hash runs over the LOWERCASE HEX of the sampled bytes
      -- (ASCII-safe on both engines; DuckDB's md5 is VARCHAR-only and
      -- a strided byte sample of utf-8 text is not valid VARCHAR)
      SELECT doc_id, n,
             lower(array_to_string(
               (list_transform(generate_series(1, n, k),
                               i -> substr(hx, 2 * i - 1, 2)))[1 : {THUMB_MAX_BYTES}],
               '')) AS thx
      FROM s
    )
    SELECT doc_id, CAST(n AS BIGINT) AS payload_len,
           'bytes' AS method,
           CAST(-1 AS INT) AS thumb_w, CAST(-1 AS INT) AS thumb_h,
           CAST(length(thx) // 2 AS INT) AS thumb_len,
           md5(thx) AS thumb_md5
    FROM thumb
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESIZE slot of the multimodal pipeline: thumbnail every payload
    — PIL ``resize((32,32))`` where the payload decodes, else the
    deterministic strided byte-sample (every k-th byte, ≤1 KB).  The
    byte path is what this fixture exercises in ANY environment (the
    payloads are utf-8 text, so PIL degrades per-row), which makes the
    query ORACLE-PROVEN: DuckDB reconstructs the identical sample from
    the blob's hex expansion and md5s it.  A real deployment gets real
    32×32 thumbnails from the same plan, schema-identically.

    Scale: one streamed Arrow pass; output is ≤1 KB per row no matter
    the payload size — the plumbing that turns a 100 TB image corpus
    into a browsable contact sheet without a second storage format."""
    docs = load_table(spark, sf_dir, "documents")
    mm = as_multimodal(docs)
    kernel = make_resize_kernel(decode_available())
    return mm.select("doc_id", "payload", "payload_len").mapInPandas(
        kernel,
        "doc_id bigint, payload_len bigint, method string, "
        "thumb_w int, thumb_h int, thumb_len int, thumb_md5 string",
    )


# ----------------------------------------------------------------- audio

#: Synthetic PCM layout: N_FRAMES frames × FRAME_LEN signed-byte
#: samples per doc, sample i = (doc_id·P1 + i·P2) mod 256 − 128 with
#: Knuth-style odd multipliers — pure integer arithmetic, so the
#: oracle regenerates the exact waveform without touching bytes.
AUDIO_FRAMES = 4
AUDIO_FRAME_LEN = 64
_A_P1 = 2654435761
_A_P2 = 40503


@query(
    "b_mm_audio_energy",
    f"""
    SELECT doc_id,
           frame,
           CAST(sum(s * s) AS BIGINT) AS energy,
           CAST(max(abs(s)) AS BIGINT) AS peak
    FROM (SELECT d.doc_id,
                 i // {AUDIO_FRAME_LEN} AS frame,
                 ((d.doc_id * {_A_P1} + i * {_A_P2}) % 256) - 128 AS s
          FROM (SELECT doc_id FROM documents WHERE doc_id % 25 = 0) d,
               generate_series(0, {AUDIO_FRAMES * AUDIO_FRAME_LEN} - 1) AS t(i))
    GROUP BY doc_id, frame
    """,
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over a BINARY PCM column — the third
    modality's plumbing (image: `b_mm_features`, video frames:
    `b_mm_framesample`): per-frame energy (Σs²) and peak amplitude,
    the front end of VAD / loudness filtering in an audio corpus
    pipeline.

    The exhibit runs the REAL binary path end-to-end: a pandas UDF
    synthesizes each doc's PCM payload as raw signed bytes (numpy →
    ``tobytes``; in production this column arrives from the lake),
    then an ``mapInPandas`` kernel — the exact shape a real DSP
    kernel (librosa/torchaudio) plugs into — decodes bytes back to
    samples and folds frame energies vectorized.  The DuckDB oracle
    regenerates the identical waveform from the integer formula
    WITHOUT any binary handling, so a byte-order, signedness, or
    truncation bug anywhere in encode→store→decode fails the hash.

    Scale shape: both the synth and the kernel are map-only Arrow
    batches (no shuffle until the tiny per-frame rollup);
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds kernel
    memory; frames×len is a constant per row."""
    import numpy as np

    n_samples = AUDIO_FRAMES * AUDIO_FRAME_LEN

    @F.pandas_udf("binary")
    def synth_pcm(doc_ids: pd.Series) -> pd.Series:
        out = []
        for d in doc_ids:
            i = np.arange(n_samples, dtype=np.int64)
            s = ((int(d) * _A_P1 + i * _A_P2) % 256) - 128
            out.append(s.astype(np.int8).tobytes())
        return pd.Series(out)

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .select("doc_id", synth_pcm(F.col("doc_id")).alias("pcm"))
    )

    def energy_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # noqa: PLC0415 — executor-side import

        for pdf in batches:
            rows = []
            for doc_id, pcm in zip(pdf["doc_id"], pdf["pcm"]):
                s = np.frombuffer(pcm, dtype=np.int8).astype(np.int64)
                frames = s.reshape(AUDIO_FRAMES, AUDIO_FRAME_LEN)
                energy = (frames * frames).sum(axis=1)
                peak = np.abs(frames).max(axis=1)
                for f in range(AUDIO_FRAMES):
                    rows.append((doc_id, f, int(energy[f]), int(peak[f])))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame", "energy", "peak"]
            )

    return docs.mapInPandas(
        energy_kernel, "doc_id long, frame long, energy long, peak long"
    )
