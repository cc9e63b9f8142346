"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, decoded/feature-extracted through
Arrow-batched Pandas UDFs (``mapInPandas``).

The container has no image/audio libraries, so the DECODE step is a
deterministic fake (dimensions derived arithmetically from the byte
length) clearly marked as a stub — but every piece of Spark plumbing
around it is real and tested: the binary column synthesis, the schema
contract, the Arrow batch iteration, the partition-preserving shape.
Swap ``_fake_decode_batch`` for a PIL/ffmpeg call and nothing else
changes. ``decode_image_real`` is the gated entry point for that.

Scale notes: mapInPandas streams Arrow batches — constant memory per
task regardless of partition size; binary payloads never pass through
the driver; decode is embarrassingly parallel. This is the canonical
100 TB media-pipeline shape.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import dec_sum, dec_sum_sql
from ..registry import register
from ..session import load_table

DECODED_SCHEMA = "doc_id long, n_bytes long, width long, height long, n_frames long"


def binary_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the multimodal input: documents' text encoded to a
    binary payload column + typed metadata, the layout a media table
    would have (opaque bytes + format tag)."""
    doc = load_table(spark, sf_dir, "documents")
    # fail-soft on NULL payloads: a corpus row with no media bytes is
    # skipped BEFORE the Arrow decode stage (bytes(None) would throw in
    # every downstream Pandas UDF) — the same per-record fail-soft
    # discipline as the claims loaders (X1)
    return doc.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.encode("text", "UTF-8").alias("content"),
        F.lit("fakeimg/v1").alias("media_format"),
        F.octet_length("text").alias("n_bytes_meta"),
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB DECODER (deterministic fake): derives "image" dimensions from
    the payload length instead of parsing real pixels. Replace with a
    real decoder (PIL etc.) without touching the Spark plumbing.

    Kept for unit tests; the mapInPandas closure below INLINES the same
    arithmetic on purpose — a worker-side closure must be fully
    self-contained (pickled by value), because Spark's Python workers
    cannot import this package unless its path is shipped to them.
    """
    n = pdf["content"].map(len)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": n,
            "width": n % 640 + 1,
            "height": (n * 7) % 480 + 1,
            "n_frames": n % 10 + 1,
        }
    )


def decode_metadata(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched decode: binary column in, typed metadata out."""

    # Self-contained closure: no references to module-level names, so
    # cloudpickle ships it by value and workers need no package import.
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            n = pdf["content"].map(len)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "width": n % 640 + 1,
                    "height": (n * 7) % 480 + 1,
                    "n_frames": n % 10 + 1,
                }
            )

    return binary_df.mapInPandas(decode, schema=DECODED_SCHEMA)


def decode_image_real(content: bytes):  # pragma: no cover - gated stub
    """Real image decode — requires an imaging library not present in
    this environment. The Spark-side contract (bytes in, (width, height,
    mode) out) is fixed here so a PIL build drops straight in."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires PIL/Pillow, which is not installed in "
            "this environment; the deterministic stub (_fake_decode_batch) "
            "exercises the identical Spark plumbing"
        ) from exc
    import io

    img = Image.open(io.BytesIO(content))
    return img.width, img.height, img.mode


MM_METADATA_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
       CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS height,
       CAST(octet_length(encode(text)) % 10 + 1 AS BIGINT) AS n_frames
FROM documents
"""


@register("multimodal_decode_metadata", oracle=MM_METADATA_ORACLE, tags=("multimodal", "llm"))
def multimodal_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → decoded metadata through real mapInPandas
    plumbing (the decode itself is the deterministic stub, so the oracle
    can verify the whole path arithmetically)."""
    return decode_metadata(binary_documents(spark, sf_dir))


FRAME_SAMPLE_STRIDE = 2

FRAME_SAMPLE_ORACLE = f"""
WITH meta AS (
  SELECT doc_id, CAST(octet_length(encode(text)) % 10 + 1 AS BIGINT) AS n_frames
  FROM documents
)
SELECT doc_id, CAST(f.frame_idx AS BIGINT) AS frame_idx
FROM meta, (SELECT unnest(generate_series(0, 9)) AS frame_idx) f
WHERE f.frame_idx < n_frames AND f.frame_idx % {FRAME_SAMPLE_STRIDE} = 0
"""


@register("multimodal_frame_sample", oracle=FRAME_SAMPLE_ORACLE, tags=("multimodal", "llm"))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: decode n_frames per payload (stub),
    emit every STRIDE-th frame index — the explode-per-media-row shape
    of a frame-extraction pipeline, fully deterministic."""
    decoded = decode_metadata(binary_documents(spark, sf_dir))
    return decoded.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    ).filter(F.col("frame_idx") % FRAME_SAMPLE_STRIDE == 0)


# ---------------------------------------------------------------------------
# binaryFile source: real opaque-blob ingest
# ---------------------------------------------------------------------------

# Checked-in deterministic binary fixtures (LCG-generated, include NUL and
# high bytes — NOT valid UTF-8, so this exercises true blob handling).
_BLOB_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "fixtures", "blobs")

BINARYFILE_ORACLE = f"""
SELECT regexp_extract(filename, '([^/]+)$', 1) AS fname,
       CAST(octet_length(content) AS BIGINT) AS n_bytes,
       md5(lower(hex(content))) AS content_md5
FROM read_blob('{_BLOB_DIR}/*.bin')
"""


@register("multimodal_binaryfile_ingest", oracle=BINARYFILE_ORACLE, tags=("multimodal", "source"))
def multimodal_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw media ingest via Spark's ``binaryFile`` source: one row per
    file with path, length and opaque ``content`` bytes — the entry
    point of any image/audio/video pipeline (cf. the stubbed decode
    above, which consumes exactly this layout).

    The content hash is computed over the lowercase hex encoding so the
    DuckDB oracle (whose md5 is VARCHAR-only) can verify the bytes
    end-to-end. Scale shape: binaryFile splits per FILE (blobs are not
    splittable); many small media files are the small-file problem —
    pair with the compaction sink (tests/test_sinks.py) or wrap in
    larger containers upstream.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(_BLOB_DIR)
        .select(
            F.regexp_extract("path", r"([^/]+)$", 1).alias("fname"),
            F.col("length").alias("n_bytes"),
            F.md5(F.lower(F.hex("content"))).alias("content_md5"),
        )
    )


_MEDIA_DIR = os.path.join(os.path.dirname(_BLOB_DIR), "media")


def _hex_be(hexcol_expr: str, byte_pos: int, n: int) -> str:
    """DuckDB: big-endian integer from bytes [byte_pos, byte_pos+n) of a
    hex(blob) string (1-based byte positions)."""
    return f"('0x' || substring({hexcol_expr}, {2 * byte_pos - 1}, {2 * n}))::BIGINT"


def _hex_le(hexcol_expr: str, byte_pos: int, n: int) -> str:
    """DuckDB: little-endian integer — concat the byte pairs reversed."""
    pairs = " || ".join(
        f"substring({hexcol_expr}, {2 * (byte_pos + i) - 1}, 2)"
        for i in reversed(range(n))
    )
    return f"('0x' || {pairs})::BIGINT"


HEADER_PARSE_ORACLE = f"""
WITH raw AS (
  SELECT regexp_extract(filename, '([^/]+)$', 1) AS fname,
         hex(content) AS h,
         CAST(octet_length(content) AS BIGINT) AS n_bytes
  FROM read_blob('{_MEDIA_DIR}/*')
)
SELECT fname, n_bytes,
       CASE WHEN substring(h, 1, 16) = '89504E470D0A1A0A' THEN 'png'
            WHEN substring(h, 1, 8) = '52494646' AND substring(h, 17, 8) = '57415645'
              THEN 'wav'
            ELSE 'unknown' END AS container,
       CASE WHEN substring(h, 1, 16) = '89504E470D0A1A0A'
            THEN {_hex_be('h', 17, 4)} END AS width,
       CASE WHEN substring(h, 1, 16) = '89504E470D0A1A0A'
            THEN {_hex_be('h', 21, 4)} END AS height,
       CASE WHEN substring(h, 1, 8) = '52494646' AND substring(h, 17, 8) = '57415645'
            THEN {_hex_le('h', 23, 2)} END AS channels,
       CASE WHEN substring(h, 1, 8) = '52494646' AND substring(h, 17, 8) = '57415645'
            THEN {_hex_le('h', 25, 4)} END AS sample_rate
FROM raw
"""


@register("multimodal_header_parse", oracle=HEADER_PARSE_ORACLE, tags=("multimodal", "source"))
def multimodal_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media metadata extraction — no codec, no UDF: container
    detection by magic bytes plus PNG IHDR width/height (big-endian)
    and WAV fmt-chunk channels/sample-rate (little-endian), all parsed
    with hex()+substring+conv Column arithmetic over checked-in valid
    headers (fixtures/media). This is the catalog pass a media lake
    runs BEFORE any decode: route/validate/partition billions of blobs
    by cheap fixed-offset header fields, leaving pixel/sample decode
    (the stubbed mapInPandas path above) to the few files that survive
    filtering. Everything stays in whole-stage codegen."""
    raw = (
        spark.read.format("binaryFile")
        .load(_MEDIA_DIR)
        .select(
            F.regexp_extract("path", r"([^/]+)$", 1).alias("fname"),
            F.hex("content").alias("h"),
            F.col("length").alias("n_bytes"),
        )
    )

    def be(pos: int, n: int):
        return F.conv(F.substring("h", 2 * pos - 1, 2 * n), 16, 10).cast("long")

    def le(pos: int, n: int):
        pairs = [F.substring("h", 2 * (pos + i) - 1, 2) for i in reversed(range(n))]
        return F.conv(F.concat(*pairs), 16, 10).cast("long")

    is_png = F.substring("h", 1, 16) == "89504E470D0A1A0A"
    is_wav = (F.substring("h", 1, 8) == "52494646") & (
        F.substring("h", 17, 8) == "57415645"
    )
    return raw.select(
        "fname",
        "n_bytes",
        F.when(is_png, "png").when(is_wav, "wav").otherwise("unknown").alias("container"),
        F.when(is_png, be(17, 4)).alias("width"),
        F.when(is_png, be(21, 4)).alias("height"),
        F.when(is_wav, le(23, 2)).alias("channels"),
        F.when(is_wav, le(25, 4)).alias("sample_rate"),
    )


# ---------------------------------------------------------------------------
# Resize + feature-extraction stages (complete the decode → transform →
# featurize multimodal pipeline; stub math, real Arrow plumbing)
# ---------------------------------------------------------------------------

RESIZE_TARGET = 224  # square fit box, the usual vision-model input
E6 = 1_000_000

RESIZE_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, "
    "scale_e6 bigint, resized_w bigint, resized_h bigint"
)

RESIZE_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
         CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS height
  FROM documents
)
SELECT doc_id, width, height,
       CAST(LEAST(({RESIZE_TARGET} * {E6}) // width,
                  ({RESIZE_TARGET} * {E6}) // height) AS BIGINT) AS scale_e6,
       CAST(GREATEST(1, (width * LEAST(({RESIZE_TARGET} * {E6}) // width,
                                       ({RESIZE_TARGET} * {E6}) // height)) // {E6})
            AS BIGINT) AS resized_w,
       CAST(GREATEST(1, (height * LEAST(({RESIZE_TARGET} * {E6}) // width,
                                        ({RESIZE_TARGET} * {E6}) // height)) // {E6})
            AS BIGINT) AS resized_h
FROM d
"""


@register("multimodal_resize", oracle=RESIZE_ORACLE, tags=("multimodal", "llm"))
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving fit-to-{RESIZE_TARGET}-box resize planning per
    image: decode dims (stub), compute the x1e6 fixed-point scale and
    target size in exact integer math (oracle-checkable; a real PIL
    ``Image.resize`` call drops into the closure without touching the
    plumbing — same gating as decode_image_real). mapInPandas stage, no
    shuffle: the transform step of a decode → resize → featurize
    multimodal pipeline."""
    bdf = binary_documents(spark, sf_dir)

    def resize_plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        t, e6 = 224, 1_000_000
        for pdf in batches:
            n = pdf["content"].map(len)
            w = n % 640 + 1
            h = (n * 7) % 480 + 1
            scale = _pd.concat([(t * e6) // w, (t * e6) // h], axis=1).min(axis=1)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "scale_e6": scale,
                    "resized_w": ((w * scale) // e6).clip(lower=1),
                    "resized_h": ((h * scale) // e6).clip(lower=1),
                }
            )

    return bdf.mapInPandas(resize_plan, schema=RESIZE_SCHEMA)


FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, feature string"

_HEX_DIGITS = "0123456789abcdef"


def _feature_oracle() -> str:
    counts = ", ".join(
        f"(length(hx) - length(replace(hx, '{d}', '')))" for d in _HEX_DIGITS
    )
    return f"""
WITH h AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         lower(hex(encode(text))) AS hx
  FROM documents
)
SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
       concat_ws(',', {counts}) AS feature
FROM h
"""


@register("multimodal_feature_extract", oracle=_feature_oracle(), tags=("multimodal", "llm"))
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level feature extraction: each payload → a fixed-16-dim
    nibble-histogram vector computed from the ACTUAL bytes in the Arrow
    batch (exact integers; serialized comma-joined for the driver
    hash). This is the featurize stage of the multimodal pipeline — a
    real embedding model replaces the histogram closure; partitioning,
    batch shape, and schema stay as they are."""
    bdf = binary_documents(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        digits = "0123456789abcdef"

        def feat(b) -> str:
            hx = bytes(b).hex()
            return ",".join(str(hx.count(d)) for d in digits)

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["content"].map(len),
                    "feature": pdf["content"].map(feat),
                }
            )

    return bdf.mapInPandas(extract, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Audio framing: payload bytes as PCM samples → per-frame energy
# ---------------------------------------------------------------------------

AUDIO_FRAME = 64  # samples (bytes) per frame
AUDIO_SCHEMA = "doc_id long, frame_id long, n_samples long, energy long, peak long"

AUDIO_FRAMING_ORACLE = f"""
WITH h AS (
  SELECT doc_id, octet_length(encode(text)) AS nb, hex(encode(text)) AS hx
  FROM documents
), f AS (
  SELECT doc_id, nb, hx,
         unnest(generate_series(0, (nb - 1) // {AUDIO_FRAME})) AS frame_id
  FROM h WHERE nb > 0
), s AS (
  SELECT doc_id, frame_id, hx,
         unnest(generate_series(frame_id * {AUDIO_FRAME},
                                LEAST(frame_id * {AUDIO_FRAME} + {AUDIO_FRAME} - 1,
                                      nb - 1))) AS i
  FROM f
), v AS (
  SELECT doc_id, frame_id,
         (('0x' || substr(hx, i * 2 + 1, 2))::BIGINT - 128) AS d
  FROM s
)
SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(d * d) AS BIGINT) AS energy,
       CAST(MAX(ABS(d)) AS BIGINT) AS peak
FROM v GROUP BY 1, 2
"""


@register("multimodal_audio_framing", oracle=AUDIO_FRAMING_ORACLE, tags=("multimodal", "llm"))
def multimodal_audio_framing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio frame analysis over the opaque binary payload: interpret
    each payload's bytes as unsigned 8-bit PCM samples (centered at
    128), cut them into {AUDIO_FRAME}-sample frames, and emit per-frame
    sample count, integer energy (Σd²) and peak |d| — the
    frame/window stage every audio pipeline runs before VAD or
    spectrogram extraction. A real codec (ffmpeg/soundfile) replaces
    the byte-interpretation line; the framing loop, Arrow batch shape,
    exploding one input row into many frame rows, and the output schema
    are the production plumbing and are exactly what the oracle checks
    (all-integer arithmetic on the true payload bytes).

    Scale: mapInPandas streams Arrow batches (constant memory); each
    payload's frames are computed where the payload lives — the
    one-row-to-many-frames explosion happens inside the task, never
    through a shuffle or the driver."""
    bdf = binary_documents(spark, sf_dir)

    # Self-contained closure (pickled by value — see decode_metadata).
    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        F_SZ = 64

        for pdf in batches:
            out = {"doc_id": [], "frame_id": [], "n_samples": [], "energy": [], "peak": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b = _np.frombuffer(bytes(content), dtype=_np.uint8).astype(_np.int64) - 128
                for fid in range((b.size + F_SZ - 1) // F_SZ):
                    seg = b[fid * F_SZ : (fid + 1) * F_SZ]
                    out["doc_id"].append(doc_id)
                    out["frame_id"].append(fid)
                    out["n_samples"].append(seg.size)
                    out["energy"].append(int((seg * seg).sum()))
                    out["peak"].append(int(_np.abs(seg).max()))
            yield _pd.DataFrame(out)

    return bdf.mapInPandas(frames, schema=AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# Partitioned parquet sink round trip
# ---------------------------------------------------------------------------

PARTITIONED_SINK_ORACLE = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
"""


@register("sink_partitioned_parquet_stats", oracle=PARTITIONED_SINK_ORACLE, tags=("sink", "sources"))
def sink_partitioned_parquet_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet sink, verified by round trip:
    write ``documents`` partitioned by ``lang`` (each language its own
    directory — the layout that makes partition pruning free for every
    downstream reader), read the written dataset back, and aggregate
    per partition. The oracle aggregates the ORIGINAL table, so the
    hash certifies no row was lost, duplicated, or mis-partitioned on
    the way through the files.

    Scale: the writer also caps ``maxRecordsPerFile`` — on a real
    cluster that is the knob that keeps any one output file (and thus
    any downstream task) bounded no matter how skewed the partition
    column is. Output lands in a fixed temp dir, mode=overwrite, so
    repeated runs don't accumulate."""
    import tempfile

    doc = load_table(spark, sf_dir, "documents")
    out = os.path.join(tempfile.gettempdir(), "icdp_sink_partitioned_parquet")
    (
        doc.write.mode("overwrite")
        .option("maxRecordsPerFile", 5000)
        .partitionBy("lang")
        .parquet(out)
    )
    # explicit schema on the read-back: an empty input writes zero data
    # files and schema inference would fail (empty-input guard); on
    # non-empty data the explicit schema is what inference returns
    # anyway, modulo partition-column placement, which the aggregate
    # below doesn't depend on
    back = spark.read.schema(doc.schema).parquet(out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Perceptual-hash bucket dedup over payload byte distributions.
_PHASH_DIGITS = "0123456789abcdef"


def _phash_sig_sql() -> str:
    bits = " + ".join(
        f"(CASE WHEN (length(hx) - length(replace(hx, '{d}', ''))) * 8 >= n_bytes"
        f" THEN {1 << i} ELSE 0 END)"
        for i, d in enumerate(_PHASH_DIGITS)
    )
    return bits


PHASH_ORACLE = f"""
WITH h AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         lower(hex(encode(text))) AS hx
  FROM documents
), sigs AS (
  SELECT doc_id, CAST({_phash_sig_sql()} AS BIGINT) AS sig FROM h
)
SELECT sig,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS representative,
       COUNT(*) > 1 AS is_dup_cluster
FROM sigs GROUP BY sig
"""


@register("multimodal_phash_buckets", oracle=PHASH_ORACLE, tags=("multimodal", "dedup", "llm"))
def multimodal_phash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash-style near-duplicate bucketing of media payloads:
    a 16-bit signature per payload (bit d set iff hex-digit d occurs at
    least its expected share of the byte stream — the mean-threshold
    binarization a pHash applies to DCT coefficients), then one groupBy
    on the signature to form duplicate buckets with a deterministic
    representative. A real pHash swaps the nibble histogram for DCT
    coefficients of the decoded image (`decode_image_real` gating);
    signature width, bucketing, and representative selection stay as
    they are.

    Deliberately bucket-level, not pair-level: payload byte
    distributions collapse onto few signatures (measured: 378 of 500
    synthetic payloads share one), so banded pair enumeration — the
    right shape for DIVERSE corpora, see ``dedup_simhash``'s 60-bit
    banded Hamming join — would be quadratic in the duplicate density
    here. Bucket output is bounded by 2^16 rows whatever the corpus
    size; the map stage is 16 JVM replace/length expressions, no
    Python, no shuffle before the single bounded-key aggregate."""
    doc = load_table(spark, sf_dir, "documents")
    h = doc.select(
        "doc_id",
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        F.lower(F.hex(F.encode("text", "UTF-8"))).alias("hx"),
    )
    sig = F.expr(f"CAST({_phash_sig_sql()} AS BIGINT)")
    return (
        h.select("doc_id", sig.alias("sig"))
        .groupBy("sig")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("representative"),
            (F.count(F.lit(1)) > 1).alias("is_dup_cluster"),
        )
    )


ORC_SINK_ORACLE = f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {dec_sum_sql('value')} AS total_value,
       CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_us,
       CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us
FROM events GROUP BY 1
"""


@register("sink_orc_roundtrip", oracle=ORC_SINK_ORACLE, tags=("sink", "multimodal"))
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink verified by round trip: project events to a typed
    frame (timestamps as epoch-us longs — ORC-portable), write ORC
    (zlib, Spark's built-in writer), read the files back, aggregate per
    event type. The oracle aggregates the ORIGINAL parquet table, so a
    matching hash certifies the second columnar format preserved every
    long and double bit-for-bit through write+scan — format-fidelity
    proof, same pattern as sink_partitioned_parquet_stats.

    Scale: columnar→columnar with a fixed maxRecordsPerFile cap; the
    aggregate is map-side combinable over whatever file split the ORC
    reader produces."""
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    out = os.path.join(tempfile.gettempdir(), "icdp_sink_orc_roundtrip")
    ev.write.mode("overwrite").option("maxRecordsPerFile", 50_000).orc(out)
    back = spark.read.orc(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value").alias("total_value"),
        F.min("ts_us").alias("first_us"),
        F.max("ts_us").alias("last_us"),
    )


CSV_SINK_ORACLE = f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {{DS}} AS total_value,
       CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_us,
       CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us
FROM events GROUP BY 1
"""


def _csv_sink_oracle() -> str:
    return CSV_SINK_ORACLE.replace("{DS}", dec_sum_sql("value"))


@register("sink_csv_roundtrip", oracle=_csv_sink_oracle(), tags=("sink", "multimodal"))
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink verified by round trip — the third format-fidelity
    proof (parquet, ORC, now text). CSV is the lossy one: doubles decay
    through decimal text unless written with round-trippable precision,
    so the writer emits Spark's default (shortest round-trip) repr and
    the reader parses against an EXPLICIT schema (no inference —
    inference is how CSV pipelines corrupt longs into doubles);
    timestamps travel as epoch-us longs. A matching aggregate hash
    against the ORIGINAL parquet certifies every value survived the
    text round trip bit-for-bit.

    Scale: header-per-file CSV with a maxRecordsPerFile cap; the
    read-back aggregate is map-side combinable over file splits."""
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    out = os.path.join(tempfile.gettempdir(), "icdp_sink_csv_roundtrip")
    ev.write.mode("overwrite").option("header", True).option(
        "maxRecordsPerFile", 50_000
    ).csv(out)
    back = spark.read.schema(
        "event_id bigint, ts_us bigint, user_id bigint, event_type string, value double"
    ).option("header", True).csv(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value").alias("total_value"),
        F.min("ts_us").alias("first_us"),
        F.max("ts_us").alias("last_us"),
    )


BUCKETED_JOIN_ORACLE = f"""
SELECT o.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       {dec_sum_sql('l.l_extendedprice')} AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1
"""


@register(
    "sink_bucketed_join_roundtrip",
    oracle=BUCKETED_JOIN_ORACLE,
    tags=("sink", "join", "scale"),
)
def sink_bucketed_join_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table round trip proven by JOIN: write orders and
    lineitem as 8-bucket tables hashed on the join key (sorted within
    buckets), read them back through the catalog, join and aggregate —
    the oracle runs the same join over the ORIGINAL parquet, so a
    matching hash certifies the bucketed layout preserved every row and
    join match. Bucketing is THE 100 TB lever for the star schema: both
    sides pre-shuffled on disk means the orders⋈lineitem Exchange —
    the biggest shuffle in every TPC-H-style plan — disappears from
    every downstream join forever (shuffle-freedom itself is
    plan-gated in tests/test_bucketing.py; this query makes the layout
    driver-visible and value-proven)."""
    import tempfile

    base = os.path.join(tempfile.gettempdir(), "icdp_bucketed_tables")
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .option("path", os.path.join(base, name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(f"icdp_bkt_{name}")
        )
    o = spark.table("icdp_bkt_orders")
    li = spark.table("icdp_bkt_lineitem")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            dec_sum("l_extendedprice").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Shot-boundary detection: adjacent-frame histogram distance spikes
# ---------------------------------------------------------------------------

SHOT_FRAME_BYTES = 256
SHOT_CUT_L1 = 96  # adjacent-histogram L1 threshold (of 512 nibbles mass)
SHOT_SCHEMA = (
    "doc_id long, frame_id long, n_bytes long, l1_prev bigint, is_cut boolean"
)

SHOT_ORACLE = f"""
WITH h AS (
  SELECT doc_id, octet_length(encode(text)) AS nb, hex(encode(text)) AS hx
  FROM documents
), f AS (
  SELECT doc_id, nb, hx,
         unnest(generate_series(0, (nb - 1) // {SHOT_FRAME_BYTES})) AS frame_id
  FROM h WHERE nb > 0
), nib AS (
  SELECT doc_id, frame_id,
         ('0x' || substr(hx, i * 2 + 1, 1))::BIGINT AS hi_nib,
         ('0x' || substr(hx, i * 2 + 2, 1))::BIGINT AS lo_nib
  FROM f, LATERAL (
    SELECT unnest(generate_series(frame_id * {SHOT_FRAME_BYTES},
                  LEAST(frame_id * {SHOT_FRAME_BYTES} + {SHOT_FRAME_BYTES} - 1,
                        nb - 1))) AS i
  )
), longn AS (
  SELECT doc_id, frame_id, hi_nib AS v FROM nib
  UNION ALL SELECT doc_id, frame_id, lo_nib FROM nib
), grid AS (
  SELECT DISTINCT f.doc_id, f.frame_id, g.v
  FROM f, (SELECT unnest(generate_series(0, 15)) AS v) g
), bins AS (
  SELECT g.doc_id, g.frame_id, g.v,
         CAST(COUNT(l.v) AS BIGINT) AS cnt
  FROM grid g LEFT JOIN longn l
    ON l.doc_id = g.doc_id AND l.frame_id = g.frame_id AND l.v = g.v
  GROUP BY 1, 2, 3
), l1 AS (
  SELECT a.doc_id, a.frame_id,
         CAST(SUM(ABS(a.cnt - b.cnt)) AS BIGINT) AS l1_prev
  FROM bins a JOIN bins b
    ON a.doc_id = b.doc_id AND a.v = b.v AND b.frame_id = a.frame_id - 1
  GROUP BY 1, 2
), sizes AS (
  SELECT doc_id, frame_id,
         CAST(LEAST({SHOT_FRAME_BYTES}, nb - frame_id * {SHOT_FRAME_BYTES})
              AS BIGINT) AS n_bytes
  FROM f
)
SELECT s.doc_id, CAST(s.frame_id AS BIGINT) AS frame_id, s.n_bytes,
       l.l1_prev,
       COALESCE(l.l1_prev > {SHOT_CUT_L1}, FALSE) AS is_cut
FROM sizes s LEFT JOIN l1 l
  ON s.doc_id = l.doc_id AND s.frame_id = l.frame_id
"""


@register("multimodal_shot_boundaries", oracle=SHOT_ORACLE, tags=("multimodal", "llm"))
def multimodal_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over the opaque payload: cut the byte
    stream into {SHOT_FRAME_BYTES}-byte 'frames', build each frame's
    16-bin nibble histogram, and flag frames whose L1 distance to the
    previous frame's histogram spikes above the threshold — the
    adjacent-frame-histogram method every video indexing pipeline uses
    for scene segmentation (a real decoder supplies pixel histograms;
    the sliding comparison, one-row-to-many-frames Arrow shape, and
    threshold semantics are the production plumbing the oracle proves
    on the true payload bytes, all-integer).

    Scale: per-payload frame loops run inside mapInPandas where the
    payload lives; no shuffle, no driver hop — the comparison is
    sequential WITHIN a payload, which is exactly the locality a video
    file gives you."""
    bdf = binary_documents(spark, sf_dir)

    def shots(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        FB = 256

        for pdf in batches:
            out = {
                "doc_id": [],
                "frame_id": [],
                "n_bytes": [],
                "l1_prev": [],
                "is_cut": [],
            }
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b = _np.frombuffer(bytes(content), dtype=_np.uint8)
                prev_hist = None
                for fid in range((b.size + FB - 1) // FB):
                    seg = b[fid * FB : (fid + 1) * FB]
                    nibs = _np.concatenate([seg >> 4, seg & 0x0F])
                    hist = _np.bincount(nibs, minlength=16).astype(_np.int64)
                    if prev_hist is None:
                        l1 = None
                    else:
                        l1 = int(_np.abs(hist - prev_hist).sum())
                    out["doc_id"].append(doc_id)
                    out["frame_id"].append(fid)
                    out["n_bytes"].append(int(seg.size))
                    out["l1_prev"].append(l1)
                    out["is_cut"].append(bool(l1 is not None and l1 > 96))
                    prev_hist = hist
            yield _pd.DataFrame(out)

    return bdf.mapInPandas(shots, schema=SHOT_SCHEMA)


# ---------------------------------------------------------------------------
# ViT patch-layout planning (vision-token budget accounting)
# ---------------------------------------------------------------------------

PATCH_SIZE = 16
MAX_VISION_SEQ = 601  # CLS + patch budget; some fixture images exceed it

PATCH_LAYOUT_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
         CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS height
  FROM documents
), g AS (
  SELECT doc_id, width, height,
         (width + {PATCH_SIZE} - 1) // {PATCH_SIZE} AS grid_w,
         (height + {PATCH_SIZE} - 1) // {PATCH_SIZE} AS grid_h
  FROM d
)
SELECT doc_id, width, height, grid_w, grid_h,
       grid_w * {PATCH_SIZE} - width AS pad_w,
       grid_h * {PATCH_SIZE} - height AS pad_h,
       grid_w * grid_h AS n_patches,
       grid_w * grid_h + 1 AS seq_len,
       grid_w * grid_h + 1 > {MAX_VISION_SEQ} AS truncated,
       LEAST(grid_w * grid_h, {MAX_VISION_SEQ} - 1) AS kept_patches
FROM g
"""


@register("multimodal_patch_layout", oracle=PATCH_LAYOUT_ORACLE, tags=("multimodal", "llm"))
def multimodal_patch_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT patch-layout planning: for each image (stub dims — the same
    deterministic derivation as multimodal_resize, replaced verbatim by
    the header/decode dims in production), compute the {PATCH_SIZE}px
    patch grid, the zero-padding the patchifier adds, and the resulting
    vision-token sequence length against a MAX_VISION_SEQ budget with a
    truncation flag — the accounting a multimodal training pipeline
    needs to pack vision tokens next to text tokens (some fixture
    images genuinely exceed the budget, so the truncation branch is
    non-vacuous). Pure codegen integer arithmetic, no UDF, no shuffle —
    the narrow planning map that runs BEFORE any pixel is decoded."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.octet_length("text") % 640 + 1).cast("long").alias("width"),
        ((F.octet_length("text") * 7) % 480 + 1).cast("long").alias("height"),
    )
    grid_w = F.floor((F.col("width") + PATCH_SIZE - 1) / PATCH_SIZE).cast("long")
    grid_h = F.floor((F.col("height") + PATCH_SIZE - 1) / PATCH_SIZE).cast("long")
    g = d.withColumn("grid_w", grid_w).withColumn("grid_h", grid_h)
    n_patches = F.col("grid_w") * F.col("grid_h")
    return g.select(
        "doc_id",
        "width",
        "height",
        "grid_w",
        "grid_h",
        (F.col("grid_w") * PATCH_SIZE - F.col("width")).alias("pad_w"),
        (F.col("grid_h") * PATCH_SIZE - F.col("height")).alias("pad_h"),
        n_patches.alias("n_patches"),
        (n_patches + 1).alias("seq_len"),
        (n_patches + 1 > MAX_VISION_SEQ).alias("truncated"),
        F.least(n_patches, F.lit(MAX_VISION_SEQ - 1)).alias("kept_patches"),
    )


# ---------------------------------------------------------------------------
# Energy-threshold voice-activity detection → speech segments
# ---------------------------------------------------------------------------

VAD_ENERGY_PER_SAMPLE = 2100  # mean-square threshold ~ the signal's p75

VAD_ORACLE = f"""
WITH frames AS ({AUDIO_FRAMING_ORACLE.strip()}),
flagged AS (
  SELECT doc_id, frame_id, energy, n_samples,
         energy > {VAD_ENERGY_PER_SAMPLE} * n_samples AS speech
  FROM frames
), isl AS (
  SELECT doc_id, frame_id, energy,
         frame_id - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY frame_id)
           AS grp
  FROM flagged WHERE speech
)
SELECT doc_id,
       CAST(MIN(frame_id) AS BIGINT) AS seg_start,
       CAST(MAX(frame_id) AS BIGINT) AS seg_end,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(energy) AS BIGINT) AS seg_energy
FROM isl GROUP BY doc_id, grp
"""


@register("multimodal_audio_vad", oracle=VAD_ORACLE, tags=("multimodal", "llm", "window"))
def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-threshold voice-activity detection: flag frames whose
    mean-square energy clears the threshold, then merge consecutive
    speech frames into segments with the gaps-and-islands discipline
    (frame_id − per-doc row_number = constant within an island) — the
    ASR-pipeline front step that cuts hours of audio into utterances
    before any model runs. Composes the framing operator verbatim
    (and its oracle as a CTE); the only additions are a flag, one
    bounded per-doc window, and the segment rollup — no new scan of
    the payload bytes."""
    frames = multimodal_audio_framing(spark, sf_dir)
    flagged = frames.filter(
        F.col("energy") > VAD_ENERGY_PER_SAMPLE * F.col("n_samples")
    )
    from pyspark.sql import Window

    grp = F.col("frame_id") - F.row_number().over(
        Window.partitionBy("doc_id").orderBy("frame_id")
    )
    isl = flagged.withColumn("grp", grp)
    return isl.groupBy("doc_id", "grp").agg(
        F.min("frame_id").cast("long").alias("seg_start"),
        F.max("frame_id").cast("long").alias("seg_end"),
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.sum("energy").cast("long").alias("seg_energy"),
    ).drop("grp")


# ---------------------------------------------------------------------------
# Schema-evolution-on-read roundtrip (mergeSchema across generations)
# ---------------------------------------------------------------------------

SCHEMA_EVO_CUTOFF = "1995-01-01"

SCHEMA_EVO_ORACLE = f"""
WITH gen AS (
  SELECT o_orderpriority,
         o_orderdate < TIMESTAMP '{SCHEMA_EVO_CUTOFF}' AS is_v1,
         o_totalprice
  FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) FILTER (is_v1) AS BIGINT) AS n_v1_rows,
       CAST(COUNT(*) FILTER (NOT is_v1) AS BIGINT) AS n_v2_rows,
       CAST(SUM(CASE WHEN is_v1 THEN 0
                     ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END)
            AS BIGINT) AS v2_price_cents
FROM gen GROUP BY 1
"""


@register("source_schema_evolution", oracle=SCHEMA_EVO_ORACLE, tags=("sink", "sources", "warehouse"))
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution-on-read roundtrip: generation v1 of the orders
    extract (rows before {SCHEMA_EVO_CUTOFF}) is written WITHOUT the
    price column (the column was added later); generation v2 carries
    it. A single ``mergeSchema`` read over both generations must
    resolve the union schema and null-backfill v1 — the additive
    schema evolution every long-lived lakehouse table undergoes. The
    aggregate proves the merged read end-to-end: per priority, row
    counts by generation (via the physically-present marker column)
    and the price sum over rows where the column physically exists.

    Real files are written and read back (the sink_*_roundtrip
    discipline); at 100 TB this read path is exactly how Spark handles
    mixed-generation partitions — the merge is metadata-only, no
    rewrite of old files."""
    import tempfile

    o = load_table(spark, sf_dir, "orders")
    out = os.path.join(tempfile.gettempdir(), "icdp_source_schema_evolution")
    v1 = o.filter(F.col("o_orderdate") < F.lit(SCHEMA_EVO_CUTOFF).cast("timestamp")).select(
        "o_orderkey", "o_orderpriority", F.lit(True).alias("is_v1")
    )
    v2 = o.filter(F.col("o_orderdate") >= F.lit(SCHEMA_EVO_CUTOFF).cast("timestamp")).select(
        "o_orderkey",
        "o_orderpriority",
        F.lit(False).alias("is_v1"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    v1.write.mode("overwrite").parquet(os.path.join(out, "gen=v1"))
    v2.write.mode("overwrite").parquet(os.path.join(out, "gen=v2"))
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "gen=v1"), os.path.join(out, "gen=v2")
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("is_v1").cast("long")).cast("long").alias("n_v1_rows"),
        F.sum((~F.col("is_v1")).cast("long")).cast("long").alias("n_v2_rows"),
        F.sum(F.coalesce("price_cents", F.lit(0))).cast("long").alias("v2_price_cents"),
    )
