"""Multimodal-column operators (north-star surface, SURVEY.md §2.B
"Multimodal columns"): media as opaque `binary` payloads with typed
metadata, and Arrow-batched feature extraction via mapInPandas.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub (`_decode_media` raises NotImplementedError unless
the deterministic fake decoder is requested); everything around it —
schema, binary payload handling, batch shapes, partition-preserving
mapInPandas plumbing — is real and tested. At 100 TB this is the
pattern: binary columns stay columnar in parquet, decode runs
Arrow-batched per partition, features come back as a typed column.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sample_emr_on_eks_fgac_iceberg_spark.operators.registry import QUERIES, register
from sample_emr_on_eks_fgac_iceberg_spark.sources.tables import fan_out, load_table

MEDIA_TYPES = ("image/png", "image/jpeg", "audio/wav")


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents corpus re-shaped as a media table: text payload
    standing in for raw bytes, plus typed metadata columns — the
    binary-column data model the engine supports. Fanned out to full
    core parallelism so the Arrow-batched featurizer downstream gets
    one batch stream per core, not one total."""
    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("doc_id") % 3).cast("int").alias("media_kind"),
        (64 + (F.col("doc_id") % 16) * 8).cast("int").alias("width"),
        (64 + (F.col("doc_id") % 9) * 8).cast("int").alias("height"),
    )


def _pgm_frames(d):
    """(doc_id, payload) frame of synthetic binary PGM (P5) rasters —
    the shared fixture every image operator decodes: dimensions are
    doc_id-derived (w = 64 + (doc_id%16)*8, h = 64 + (doc_id%9)*8) and
    the pixel plane is the document text repeated cyclically (rpad).
    ASCII-only guard: the plane is BYTES (numpy frombuffer) while the
    oracles' rpad/ascii work in CODE POINTS — identical only when
    every character is one byte, so multi-byte docs are excluded on
    BOTH sides rather than silently diverging; a real deployment
    feeds actual binary payloads and drops the guard. Each image
    oracle mirrors this construction textually — a change here must
    land in those oracle CTEs too (the checksum tests pin them)."""
    w = (64 + (F.col("doc_id") % 16) * 8).cast("int")
    h = (64 + (F.col("doc_id") % 9) * 8).cast("int")
    return d.filter(
        (F.length("text") > 0)
        & (F.octet_length("text") == F.length("text"))
    ).select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit("P5\n"),
                w.cast("string"),
                F.lit(" "),
                h.cast("string"),
                F.lit("\n255\n"),
                F.rpad(F.col("text"), w * h, F.col("text")),
            ),
            "UTF-8",
        ).alias("payload"),
    )



@register(
    "multimodal_catalog",
    oracle="""
    SELECT doc_id,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
                WHEN 1 THEN 'image/jpeg' ELSE 'audio/wav' END AS media_type,
           CAST(64 + (doc_id % 16) * 8 AS INT) AS width,
           CAST(64 + (doc_id % 9) * 8 AS INT) AS height,
           md5(text) AS payload_checksum
    FROM documents
    """,
)
def multimodal_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-catalog scan: byte sizes, typed metadata, checksums —
    pure JVM expressions over the binary payload column."""
    m = media_frame(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", F.md5("text").alias("payload_checksum"))
    media_type = (
        F.when(F.col("media_kind") == 0, MEDIA_TYPES[0])
        .when(F.col("media_kind") == 1, MEDIA_TYPES[1])
        .otherwise(MEDIA_TYPES[2])
    )
    return (
        m.join(d, "doc_id")
        .select(
            "doc_id",
            F.octet_length("payload").alias("n_bytes"),
            media_type.alias("media_type"),
            "width",
            "height",
            "payload_checksum",
        )
    )


_FRAME = 256  # chars per fake "frame"
_STRIDE = 4  # keep every 4th frame


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH f AS (SELECT doc_id, text, length(text) AS n FROM documents),
         e AS (SELECT doc_id, text,
                      unnest(range(0, CAST((n - 1) // 256 + 1 AS BIGINT), 4))
                        AS i
               FROM f)
    SELECT doc_id,
           CAST(i AS INT) AS frame_index,
           octet_length(CAST(substring(text, CAST(i * 256 + 1 AS BIGINT), 256)
                             AS BLOB)) AS frame_bytes,
           md5(substring(text, CAST(i * 256 + 1 AS BIGINT), 256)) AS frame_md5
    FROM e
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over media payloads — the 1→many shape of video
    frame extraction (vs the 1:1 featurizer in multimodal_features),
    expressed entirely JVM-side: `sequence` builds the strided frame
    index list per document, `explode` fans it out, `substring` slices
    the frame, `md5` fingerprints it. No Python worker in the plan, so
    at 100 TB this runs inside whole-stage codegen with the generate's
    fan-out bounded by payload_len/FRAME/STRIDE rows per document. A
    real video decoder replaces the substring slice with a
    mapInPandas decode (see _decode_media) — the surrounding plumbing
    is identical. Frames are 256-char chunks of the text payload
    standing in for fixed-byte GOPs."""
    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    frames = d.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.length("text") - 1) / _FRAME).cast("int"),
                F.lit(_STRIDE),
            )
        ).alias("frame_index"),
    )
    frame = F.expr(f"substring(text, frame_index * {_FRAME} + 1, {_FRAME})")
    return frames.select(
        "doc_id",
        "frame_index",
        F.octet_length(frame).alias("frame_bytes"),
        F.md5(F.encode(frame, "UTF-8")).alias("frame_md5"),
    )


def _decode_media(payload: bytes, fake: bool = True) -> bytes:
    """Decode stub. Real decoders (PIL / soundfile / av) are not in
    this container; `fake=True` returns the payload unchanged as the
    deterministic stand-in 'pixel buffer'."""
    if not fake:
        raise NotImplementedError(
            "real media decoding requires PIL/soundfile/av; not available here"
        )
    return payload


_CHUNK = 64
_N_FEATURES = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_chunks", T.IntegerType()),
    ]
    + [T.StructField(f"h{i}", T.LongType()) for i in range(_N_FEATURES)]
)


@register(
    "multimodal_features",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents
               WHERE length(text) > 0
                 AND octet_length(CAST(text AS BLOB)) = length(text)),
    i AS (SELECT doc_id, text, len, unnest(range(0, len)) AS s FROM d),
    v AS (SELECT doc_id, len,
                 ascii(substring(text, CAST(s + 1 AS BIGINT), 1))
                     % {_N_FEATURES} AS b
          FROM i)
    SELECT doc_id,
           CAST((len + {_CHUNK - 1}) // {_CHUNK} AS INT) AS n_chunks,
           {", ".join(
               f"CAST(COUNT(*) FILTER (WHERE b = {i}) AS BIGINT) AS h{i}"
               for i in range(_N_FEATURES)
           )}
    FROM v GROUP BY doc_id, len
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas: per doc, decode (the stub passthrough for raw bytes —
    `_decode_media` still raises for compressed formats) then an
    8-bin byte histogram — integer-exact counts plus the chunk count a
    downstream embedder would batch on, so the whole featurizer is
    DuckDB-oracle-checked (previously rows-only). Histogram via
    vectorized numpy bincount per payload — no per-byte Python.
    ASCII-only guard as in the raster/PCM decoders: the featurizer
    reads BYTES, the oracle indexes CODE POINTS."""
    import numpy as np
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "n_chunks"] + [f"h{i}" for i in range(_N_FEATURES)]
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(
                    _decode_media(bytes(payload), fake=True), dtype=np.uint8
                )
                if buf.size == 0:
                    continue
                hist = np.bincount(buf % _N_FEATURES, minlength=_N_FEATURES)
                out["doc_id"].append(doc_id)
                out["n_chunks"].append((buf.size + _CHUNK - 1) // _CHUNK)
                for i in range(_N_FEATURES):
                    out[f"h{i}"].append(int(hist[i]))
            yield pd.DataFrame(out, columns=cols)

    ascii_only = (
        load_table(spark, sf_dir, "documents")
        .filter(
            (F.length("text") > 0)
            & (F.octet_length("text") == F.length("text"))
        )
        .select("doc_id")
    )
    return (
        media_frame(spark, sf_dir)
        .join(ascii_only, "doc_id", "left_semi")
        .select("doc_id", "payload")
        .mapInPandas(extract, FEATURE_SCHEMA)
    )


_TILE = 32  # pixels per tile edge for the raster stats grid


@register(
    "multimodal_image_stats",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, length(text) AS len,
                      CAST(64 + (doc_id % 16) * 8 AS INT) AS w,
                      CAST(64 + (doc_id % 9) * 8 AS INT) AS h
               FROM documents
               WHERE length(text) > 0
                 AND octet_length(CAST(text AS BLOB)) = length(text)),
    px AS (SELECT doc_id, text, len, w, h,
                  unnest(range(0, CAST(w * h AS BIGINT))) AS s
           FROM d),
    -- rpad(text, N, text) is text repeated cyclically: the pixel at
    -- position s is text[s mod len] — indexing the SHORT string keeps
    -- this linear (a materialized padded buffer re-scans ~N chars per
    -- unnested position: quadratic per document)
    v AS (SELECT doc_id,
                 CAST((s // w) // {_TILE} AS INT) AS tile_row,
                 CAST((s % w) // {_TILE} AS INT) AS tile_col,
                 ascii(substring(text, CAST(s % len + 1 AS BIGINT), 1)) AS val
          FROM px)
    SELECT doc_id, tile_row, tile_col,
           CAST(COUNT(*) AS INT) AS n_px,
           CAST(SUM(val) AS BIGINT) AS sum_val,
           CAST(MIN(val) AS INT) AS min_val,
           CAST(MAX(val) AS INT) AS max_val
    FROM v GROUP BY doc_id, tile_row, tile_col
    """,
)
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A GENUINE image decode needing no media library — the sibling of
    `multimodal_audio_rms`'s PCM path, converting the last decode stub
    pattern into a real decoder (VERDICT r4 task 4): each payload is a
    well-formed binary PGM (P5) file — `P5\\n<w> <h>\\n255\\n` header +
    w*h 8-bit pixels — built JVM-side from the text corpus (rpad
    repeats the text to exactly w*h bytes). The decoder then does what
    a real PGM reader does: parse the header bytes, `np.frombuffer`
    the pixel plane as uint8, reshape to (h, w), and reduce each
    {_TILE}x{_TILE} tile to integer stats (count/sum/min/max) — the
    exposure/contrast screen an image curation pipeline runs before
    expensive featurization. Compressed formats (PNG/JPEG) still raise
    NotImplementedError in `_decode_media`; this path is for the
    uncompressed rasters a preprocessing fleet actually materializes.

    Scale shape: Arrow-batched mapInPandas, partition-preserving (no
    shuffle before the final per-tile agg keys, which ride out of the
    decoder already reduced ~1000:1); decode is a numpy view + reshape
    per doc, no per-pixel Python. Integer accumulators keep the oracle
    compare exact."""
    import numpy as np
    import pandas as pd

    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    pgm = _pgm_frames(d)

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("tile_row", T.IntegerType()),
            T.StructField("tile_col", T.IntegerType()),
            T.StructField("n_px", T.IntegerType()),
            T.StructField("sum_val", T.LongType()),
            T.StructField("min_val", T.IntegerType()),
            T.StructField("max_val", T.IntegerType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        header = re.compile(rb"^P5\n(\d+) (\d+)\n255\n")
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "tile_row", "tile_col", "n_px", "sum_val",
                "min_val", "max_val",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                m = header.match(buf)
                if m is None:  # not an uncompressed raster → not ours
                    continue
                iw, ih = int(m.group(1)), int(m.group(2))
                plane = np.frombuffer(
                    buf, dtype=np.uint8, count=iw * ih, offset=m.end()
                ).reshape(ih, iw)
                for ty in range(0, ih, _TILE):
                    for tx in range(0, iw, _TILE):
                        tile = plane[ty : ty + _TILE, tx : tx + _TILE]
                        out["doc_id"].append(doc_id)
                        out["tile_row"].append(ty // _TILE)
                        out["tile_col"].append(tx // _TILE)
                        out["n_px"].append(tile.size)
                        out["sum_val"].append(int(tile.sum(dtype=np.int64)))
                        out["min_val"].append(int(tile.min()))
                        out["max_val"].append(int(tile.max()))
            yield pd.DataFrame(out)

    return pgm.mapInPandas(decode, out_schema)


def _le_hex(col, nbytes: int):
    """Little-endian hex of an int column, ``nbytes`` wide — BMP header
    fields are LE, and string-encode can't write bytes > 0x7f (UTF-8
    would multi-byte them), so headers assemble as hex → unhex."""
    hh = F.lpad(F.lower(F.hex(col)), nbytes * 2, "0")
    return F.concat(
        *[F.substring(hh, i * 2 + 1, 2) for i in reversed(range(nbytes))]
    )


@register(
    "multimodal_bmp_stats",
    oracle="""
    WITH d AS (SELECT doc_id, text, length(text) AS len,
                      CAST(64 + (doc_id % 16) * 8 AS INT) AS w,
                      CAST(64 + (doc_id % 9) * 8 AS INT) AS h
               FROM documents
               WHERE length(text) > 0
                 AND octet_length(CAST(text AS BLOB)) = length(text)),
    px AS (SELECT doc_id, text, len,
                  unnest(range(0, CAST(3 * w * h AS BIGINT))) AS s
           FROM d),
    -- rpad(text, N, text) is text repeated cyclically: char at pixel
    -- position s is text[s mod len] — indexing the SHORT string keeps
    -- this linear (materializing the padded buffer re-scans ~N chars
    -- per unnested position: quadratic per document)
    v AS (SELECT doc_id, CAST(s % 3 AS INT) AS channel,
                 ascii(substring(text, CAST(s % len + 1 AS BIGINT), 1)) AS val
          FROM px)
    SELECT doc_id, channel,
           CAST(COUNT(*) AS INT) AS n_px,
           CAST(SUM(val) AS BIGINT) AS sum_val,
           CAST(MIN(val) AS INT) AS min_val,
           CAST(MAX(val) AS INT) AS max_val
    FROM v GROUP BY doc_id, channel
    """,
)
def multimodal_bmp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A second GENUINE image decode (VERDICT r6 task 7), covering the
    other real-world uncompressed header layout beside PGM's: each
    payload is a well-formed 24-bit BI_RGB Windows BMP — 14-byte file
    header + 40-byte BITMAPINFOHEADER, all integer fields
    little-endian, pixel rows stored BOTTOM-UP as BGR triplets — built
    JVM-side (headers assemble as hex → unhex because LE length fields
    contain bytes no string encoding can emit). The decoder does what
    a real BMP reader does: validate the 'BM' magic / 24-bit / BI_RGB
    fields, read the pixel-array offset from the file header, compute
    the 4-byte-aligned row stride, `np.frombuffer` + reshape, flip the
    bottom-up rows, split B/G/R planes, and reduce each channel to
    integer stats — the per-channel exposure screen an image curation
    pipeline runs. Channel totals are invariant to the row flip, which
    is what lets DuckDB reproduce them positionally (byte index mod 3)
    without modelling BMP row order; the decode path itself still
    exercises offset parsing, stride math and the flip. Widths here
    are multiples of 8, so 3·w is already 4-byte aligned (stride ==
    3·w) on the WRITE side; the read side computes the general padded
    stride. ASCII-only guard as in `multimodal_image_stats`: the
    decoder reads bytes, the oracle indexes code points.

    Scale shape: identical to the PGM path — Arrow-batched
    mapInPandas, partition-preserving, ~w·h·3 bytes in → 3 rows out
    per doc (massive pre-shuffle reduction), vectorized numpy only."""
    import numpy as np
    import pandas as pd

    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    w = (64 + (F.col("doc_id") % 16) * 8).cast("int")
    h = (64 + (F.col("doc_id") % 9) * 8).cast("int")
    npx = (w * h * 3).cast("int")
    header_hex = F.concat(
        F.lit("424d"),  # 'BM'
        _le_hex(npx + F.lit(54), 4),  # file size
        F.lit("00000000"),  # reserved
        F.lit("36000000"),  # pixel-array offset = 54
        F.lit("28000000"),  # biSize = 40
        _le_hex(w, 4),
        _le_hex(h, 4),  # positive → bottom-up rows
        F.lit("0100"),  # planes = 1
        F.lit("1800"),  # bit count = 24
        F.lit("00000000"),  # compression = BI_RGB
        _le_hex(npx, 4),  # image size
        F.lit("00000000" * 4),  # ppm x/y, colors used/important
    )
    bmp = d.filter(
        (F.length("text") > 0)
        & (F.octet_length("text") == F.length("text"))
    ).select(
        "doc_id",
        F.concat(
            F.unhex(header_hex),
            F.encode(F.rpad(F.col("text"), w * h * 3, F.col("text")), "UTF-8"),
        ).alias("payload"),
    )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("channel", T.IntegerType()),
            T.StructField("n_px", T.IntegerType()),
            T.StructField("sum_val", T.LongType()),
            T.StructField("min_val", T.IntegerType()),
            T.StructField("max_val", T.IntegerType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("doc_id", "channel", "n_px", "sum_val", "min_val", "max_val")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                if buf[:2] != b"BM" or len(buf) < 54:
                    continue
                off = int.from_bytes(buf[10:14], "little")
                iw = int.from_bytes(buf[18:22], "little", signed=True)
                ihgt = int.from_bytes(buf[22:26], "little", signed=True)
                bitcount = int.from_bytes(buf[28:30], "little")
                compression = int.from_bytes(buf[30:34], "little")
                if bitcount != 24 or compression != 0 or iw <= 0:
                    continue  # not an uncompressed 24-bit raster
                ih = abs(ihgt)
                stride = ((3 * iw + 3) // 4) * 4
                rows = np.frombuffer(
                    buf, dtype=np.uint8, count=stride * ih, offset=off
                ).reshape(ih, stride)
                if ihgt > 0:  # bottom-up storage → top-down raster
                    rows = rows[::-1]
                px = rows[:, : 3 * iw].reshape(ih, iw, 3)
                for ch in range(3):
                    plane = px[:, :, ch]
                    out["doc_id"].append(doc_id)
                    out["channel"].append(ch)
                    out["n_px"].append(int(plane.size))
                    out["sum_val"].append(int(plane.sum(dtype=np.int64)))
                    out["min_val"].append(int(plane.min()))
                    out["max_val"].append(int(plane.max()))
            yield pd.DataFrame(out, columns=list(cols))

    return bmp.mapInPandas(decode, out_schema)


_PCM_WINDOW = 128  # samples per analysis window


@register(
    "multimodal_audio_rms",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, length(text) // 2 AS n_samp
               FROM documents
               WHERE octet_length(CAST(text AS BLOB)) = length(text)),
    i AS (SELECT doc_id, text, unnest(range(0, n_samp)) AS s
          FROM d WHERE n_samp > 0),
    samp AS (
        SELECT doc_id, s,
               CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS val
        FROM (SELECT doc_id, s,
                     ascii(substring(text, CAST(2 * s + 1 AS BIGINT), 1))
                     + 256 * ascii(substring(text, CAST(2 * s + 2 AS BIGINT), 1))
                         AS v
              FROM i))
    SELECT doc_id,
           CAST(s // {_PCM_WINDOW} AS INT) AS window_index,
           CAST(COUNT(*) AS INT) AS n_samples,
           CAST(SUM(val * val) AS BIGINT) AS sum_sq,
           CAST(MAX(abs(val)) AS INT) AS peak
    FROM samp GROUP BY doc_id, window_index
    """,
)
def multimodal_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A GENUINE decode path needing no media library: the binary
    payload is interpreted as 16-bit little-endian PCM
    (`np.frombuffer('<i2')` — the actual wire decode a WAV data chunk
    needs) and each 128-sample window yields its energy (sum of
    squares) and peak amplitude — the loudness/clipping screen an audio
    curation pipeline runs before feature extraction. Integer
    accumulators keep it engine-exact; RMS itself is
    sqrt(sum_sq/n_samples), left to the caller to stay float-free.

    Scale shape: Arrow-batched mapInPandas, one pass, ~payload/256 rows
    out per doc; the decode is vectorized C (numpy view + int64 square)
    per batch — no per-sample Python. Partition-preserving: no shuffle
    anywhere in the plan."""
    import numpy as np
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("window_index", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("sum_sq", T.LongType()),
            T.StructField("peak", T.IntegerType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "window_index", "n_samples", "sum_sq", "peak")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                usable = len(buf) - (len(buf) % 2)
                if usable == 0:
                    continue
                samples = np.frombuffer(buf[:usable], dtype="<i2").astype(np.int64)
                for w in range(0, len(samples), _PCM_WINDOW):
                    win = samples[w : w + _PCM_WINDOW]
                    out["doc_id"].append(doc_id)
                    out["window_index"].append(w // _PCM_WINDOW)
                    out["n_samples"].append(len(win))
                    out["sum_sq"].append(int((win * win).sum()))
                    out["peak"].append(int(np.abs(win).max()))
            yield pd.DataFrame(out)

    # ASCII-only guard, same reason as multimodal_image_stats: the
    # decoder reads BYTES, the oracle indexes CODE POINTS
    return (
        media_frame(spark, sf_dir)
        .join(
            load_table(spark, sf_dir, "documents")
            .filter(F.octet_length("text") == F.length("text"))
            .select("doc_id"),
            "doc_id",
            "left_semi",
        )
        .select("doc_id", "payload")
        .mapInPandas(decode, out_schema)
    )


_AH_MAXHAM = 3  # pigeonhole-sound: 4 x 16-bit bands catch hamming <= 3


@register(
    "multimodal_image_ahash_dedup",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, length(text) AS len,
                      CAST(64 + (doc_id % 16) * 8 AS INT) AS w,
                      CAST(64 + (doc_id % 9) * 8 AS INT) AS h
               FROM documents
               WHERE length(text) > 0
                 AND octet_length(CAST(text AS BLOB)) = length(text)),
    px AS (SELECT doc_id, text, len, w, h,
                  unnest(range(0, CAST(w * h AS BIGINT))) AS s
           FROM d),
    v AS (SELECT doc_id,
                 CAST((s // w) // (h // 8) AS INT) AS br,
                 CAST((s % w) // (w // 8) AS INT) AS bc,
                 ascii(substring(text, CAST(s % len + 1 AS BIGINT), 1)) AS val
          FROM px),
    blocks AS (SELECT doc_id, br, bc, SUM(val) // COUNT(*) AS bv
               FROM v GROUP BY doc_id, br, bc),
    thr AS (SELECT doc_id, SUM(bv) // 64 AS t FROM blocks GROUP BY doc_id),
    bits AS (SELECT b.doc_id, br, bc,
                    CASE WHEN bv > t THEN 1 ELSE 0 END AS bit
             FROM blocks b JOIN thr USING (doc_id)),
    bands AS (SELECT doc_id, CAST(br // 2 AS INT) AS band,
                     CAST(SUM(bit * (1 << (bc + 8 * (br % 2)))) AS BIGINT)
                         AS bv
              FROM bits GROUP BY doc_id, br // 2),
    cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
             FROM bands x JOIN bands y
               ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id),
    ham AS (SELECT c.a_id, c.b_id,
                   SUM(bit_count(xor(xa.bv, xb.bv))) AS hamming
            FROM cand c
              JOIN bands xa ON xa.doc_id = c.a_id
              JOIN bands xb ON xb.doc_id = c.b_id AND xb.band = xa.band
            GROUP BY c.a_id, c.b_id)
    SELECT a_id, b_id, CAST(hamming AS INT) AS hamming
    FROM ham WHERE hamming <= {_AH_MAXHAM}
    """,
)
def multimodal_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate IMAGE detection — average-hash (aHash)
    over the genuine PGM decode path, closing the multimodal↔dedup
    loop: decode raster → block-average to an 8×8 grid → threshold by
    the global mean → 64-bit perceptual hash → banded LSH join → exact
    Hamming verify. Two images whose pixels differ slightly (crop
    noise, re-encode jitter) land within a few bits; byte-identical
    payloads collide at hamming 0.

    Candidate generation is pigeonhole-SOUND for the verify threshold:
    the hash splits into 4 × 16-bit bands, and any pair with hamming
    ≤ {_AH_MAXHAM} (< 4) must agree exactly on at least one band — no
    recall loss vs all-pairs. All arithmetic integer (block mean =
    sum // n, threshold = sum // 64), bit-exact vs the DuckDB oracle.

    Scale shape: the decoder (Arrow-batched mapInPandas, numpy
    reshape-sum — no per-pixel Python) reduces each image to FOUR
    16-bit band rows before any shuffle (~w·h : 4 reduction); the
    candidate join is keyed on (band, value) — 65 536 buckets per
    band, never all-pairs; the verify re-joins only candidate ids
    against the 4-row hashes. The same shape as dedup_minhash_det's
    band join, applied to pixels instead of shingles."""
    import numpy as np
    import pandas as pd

    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    pgm = _pgm_frames(d)

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("band", T.IntegerType()),
            T.StructField("bv", T.LongType()),
        ]
    )

    def hash_bands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        header = re.compile(rb"^P5\n(\d+) (\d+)\n255\n")
        for pdf in batches:
            ids, bands, vals = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                m = header.match(buf)
                if m is None:
                    continue
                iw, ih = int(m.group(1)), int(m.group(2))
                plane = np.frombuffer(
                    buf, dtype=np.uint8, count=iw * ih, offset=m.end()
                )
                a = plane.reshape(ih, iw).astype(np.int64)
                bh, bw = ih // 8, iw // 8
                blocks = a.reshape(8, bh, 8, bw).sum(axis=(1, 3)) // (bh * bw)
                t = blocks.sum() // 64
                bits = (blocks > t).astype(np.int64)
                rowbytes = (bits << np.arange(8)).sum(axis=1)
                bvals = rowbytes[0::2] + 256 * rowbytes[1::2]
                ids.extend([doc_id] * 4)
                bands.extend(range(4))
                vals.extend(int(x) for x in bvals)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "band": pd.Series(bands, dtype="int32"),
                 "bv": pd.Series(vals, dtype="int64")}
            )

    bands_df = pgm.mapInPandas(hash_bands, out_schema)
    from sample_emr_on_eks_fgac_iceberg_spark.sources.tables import (
        materialize_once as _mat,
    )

    bands_df = _mat(bands_df)
    x = bands_df.select(
        F.col("doc_id").alias("a_id"), "band", F.col("bv").alias("abv")
    )
    y = bands_df.select(
        F.col("doc_id").alias("b_id"), "band", F.col("bv").alias("bbv")
    )
    cand = (
        x.join(y, (x.band == y.band) & (x.abv == y.bbv) & (x.a_id < y.b_id))
        .select("a_id", "b_id")
        .distinct()
    )
    xa = bands_df.select(
        F.col("doc_id").alias("a_id"), "band", F.col("bv").alias("abv")
    )
    xb = bands_df.select(
        F.col("doc_id").alias("b_id"), "band", F.col("bv").alias("bbv")
    )
    return (
        cand.join(xa, "a_id")
        .join(xb, ["b_id", "band"])
        .groupBy("a_id", "b_id")
        .agg(
            F.sum(F.bit_count(F.col("abv").bitwiseXOR(F.col("bbv"))))
            .cast("int")
            .alias("hamming")
        )
        .filter(F.col("hamming") <= _AH_MAXHAM)
    )


# mean-square energy floor for voice-activity detection: a window is
# ACTIVE when sum_sq >= _VAD_MSQ * n_samples (integer cross-multiply —
# never a float mean compare)
_VAD_MSQ = 650_000_000


@register(
    "multimodal_audio_vad_segments",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, length(text) // 2 AS n_samp
               FROM documents
               WHERE octet_length(CAST(text AS BLOB)) = length(text)),
    i AS (SELECT doc_id, text, unnest(range(0, n_samp)) AS s
          FROM d WHERE n_samp > 0),
    samp AS (
        SELECT doc_id, s,
               CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS val
        FROM (SELECT doc_id, s,
                     ascii(substring(text, CAST(2 * s + 1 AS BIGINT), 1))
                     + 256 * ascii(substring(text, CAST(2 * s + 2 AS BIGINT), 1))
                         AS v
              FROM i)),
    win AS (
        SELECT doc_id,
               CAST(s // {_PCM_WINDOW} AS INT) AS window_index,
               COUNT(*) AS n_samples,
               SUM(val * val) AS sum_sq,
               MAX(abs(val)) AS peak
        FROM samp GROUP BY doc_id, window_index),
    act AS (
        SELECT *, window_index
               - ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY window_index) AS island
        FROM win WHERE sum_sq >= {_VAD_MSQ} * n_samples)
    SELECT doc_id,
           CAST(MIN(window_index) AS INT) AS seg_start,
           CAST(COUNT(*) AS INT) AS n_windows,
           CAST(SUM(sum_sq) AS BIGINT) AS seg_sum_sq,
           CAST(MAX(peak) AS INT) AS seg_peak
    FROM act GROUP BY doc_id, island
    """,
)
def multimodal_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-based voice-activity detection over the PCM payloads:
    windows whose mean-square energy clears the floor are ACTIVE, and
    consecutive active windows merge into segments (gaps-and-islands) —
    the speech-region pre-cut an audio curation pipeline runs before
    transcription, so downstream featurizers read only voiced spans.

    Determinism: the activity verdict is an integer cross-multiply
    (sum_sq ≥ floor · n_samples) over the exact integer energies the
    PCM decode emits; segment stats are integer sums.

    Plan shape at 100 TB: the decode is the same Arrow-batched
    mapInPandas single pass as multimodal_audio_rms (~payload/256 rows
    out per clip, no shuffle); the islands trick is ONE doc-keyed
    window (row_number over active windows) and ONE (doc, island) hash
    agg — per-clip state, no self-join, no global sort."""
    win = QUERIES["multimodal_audio_rms"](spark, sf_dir)
    active = win.filter(
        F.col("sum_sq")
        >= F.lit(_VAD_MSQ).cast("bigint") * F.col("n_samples").cast("bigint")
    )
    w = Window.partitionBy("doc_id").orderBy("window_index")
    act = active.withColumn(
        "island", F.col("window_index") - F.row_number().over(w)
    )
    return act.groupBy("doc_id", "island").agg(
        F.min("window_index").cast("int").alias("seg_start"),
        F.count(F.lit(1)).cast("int").alias("n_windows"),
        F.sum("sum_sq").cast("bigint").alias("seg_sum_sq"),
        F.max("peak").cast("int").alias("seg_peak"),
    ).drop("island")


_EDGE_THRESH = 32  # |Δ pixel| above this counts as an edge step


@register(
    "multimodal_image_gradient_energy",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, length(text) AS len,
                      CAST(64 + (doc_id % 16) * 8 AS INT) AS w,
                      CAST(64 + (doc_id % 9) * 8 AS INT) AS h
               FROM documents
               WHERE length(text) > 0
                 AND octet_length(CAST(text AS BLOB)) = length(text)),
    px AS (SELECT doc_id, text, len, w, h,
                  unnest(range(0, CAST(w * h AS BIGINT))) AS s
           FROM d),
    -- pixel value at any position is text[pos mod len] (the cyclic
    -- rpad construction), so the right/down neighbors index the SHORT
    -- string directly — no self-join over the pixel plane
    v AS (SELECT doc_id, w, h, s,
                 ascii(substring(text, CAST(s % len + 1 AS BIGINT), 1))
                     AS val,
                 CASE WHEN s % w < w - 1 THEN
                     ascii(substring(text,
                         CAST((s + 1) % len + 1 AS BIGINT), 1))
                 END AS val_r,
                 CASE WHEN s < w * (h - 1) THEN
                     ascii(substring(text,
                         CAST((s + w) % len + 1 AS BIGINT), 1))
                 END AS val_d
          FROM px)
    SELECT doc_id,
           CAST(SUM(abs(val_r - val)) AS BIGINT) AS grad_h,
           CAST(SUM(abs(val_d - val)) AS BIGINT) AS grad_v,
           CAST(COUNT(*) FILTER (abs(val_r - val) > {_EDGE_THRESH})
                + COUNT(*) FILTER (abs(val_d - val) > {_EDGE_THRESH})
                AS BIGINT) AS n_edges,
           CAST((COUNT(*) FILTER (abs(val_r - val) > {_EDGE_THRESH})
                 + COUNT(*) FILTER (abs(val_d - val) > {_EDGE_THRESH}))
                * 1000000
                // (COUNT(val_r) + COUNT(val_d)) AS BIGINT)
               AS edge_density_ppm
    FROM v GROUP BY doc_id
    """,
)
def multimodal_image_gradient_energy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gradient energy + edge density per raster — the sharpness/
    complexity screen an image-curation pipeline runs to drop flat or
    noise-saturated frames before expensive featurization (the visual
    sibling of the text quality filters). Decodes the same synthetic
    PGM payloads as `multimodal_image_stats`, then per image: total
    |horizontal Δ| and |vertical Δ| (integer L1 gradient energy), the
    count of steps above {_EDGE_THRESH}, and edge density in truncated
    ppm of all neighbor comparisons. All integer-exact; the oracle
    indexes the cyclic text directly (no pixel-plane self-join).

    Scale shape: Arrow-batched mapInPandas — np.diff over the decoded
    plane, two axis sums, no per-pixel Python; each image reduces to
    ONE row inside the decoder (~10⁴:1 before any shuffle), and the
    final frame is doc-count-sized."""
    import numpy as np
    import pandas as pd

    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    pgm = _pgm_frames(d)

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("grad_h", T.LongType()),
            T.StructField("grad_v", T.LongType()),
            T.StructField("n_edges", T.LongType()),
            T.StructField("edge_density_ppm", T.LongType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        header = re.compile(rb"^P5\n(\d+) (\d+)\n255\n")
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "grad_h", "grad_v", "n_edges",
                "edge_density_ppm",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                m = header.match(buf)
                if m is None:
                    continue
                iw, ih = int(m.group(1)), int(m.group(2))
                plane = np.frombuffer(
                    buf, dtype=np.uint8, count=iw * ih, offset=m.end()
                ).reshape(ih, iw).astype(np.int64)
                dh = np.abs(np.diff(plane, axis=1))
                dv = np.abs(np.diff(plane, axis=0))
                n_edges = int((dh > _EDGE_THRESH).sum()) + int(
                    (dv > _EDGE_THRESH).sum()
                )
                n_cmp = dh.size + dv.size
                out["doc_id"].append(doc_id)
                out["grad_h"].append(int(dh.sum()))
                out["grad_v"].append(int(dv.sum()))
                out["n_edges"].append(n_edges)
                out["edge_density_ppm"].append(n_edges * 1_000_000 // n_cmp)
            yield pd.DataFrame(out)

    return pgm.mapInPandas(decode, out_schema)


@register(
    "multimodal_image_resize",
    oracle="""
    WITH d AS (SELECT doc_id, text, length(text) AS len,
                      CAST(64 + (doc_id % 16) * 8 AS BIGINT) AS w,
                      CAST(64 + (doc_id % 9) * 8 AS BIGINT) AS h
               FROM documents
               WHERE length(text) > 0
                 AND octet_length(CAST(text AS BLOB)) = length(text)),
    g AS (SELECT doc_id, text, len, w, h,
                 (w + 1) // 2 AS rw, (h + 1) // 2 AS rh
          FROM d),
    px AS (SELECT doc_id, rw, rh, text, len, w,
                  unnest(range(0, rw * rh)) AS s
           FROM g),
    -- nearest-neighbor 2:1 — resized (i, j) reads original
    -- (2i, 2j); pixel value at any original position is
    -- text[pos mod len] (the cyclic rpad construction)
    v AS (SELECT doc_id, rw, rh, s,
                 ascii(substring(text,
                     CAST((2 * (s // rw) * w + 2 * (s % rw)) % len + 1
                          AS BIGINT), 1)) AS val
          FROM px)
    SELECT doc_id,
           CAST(MAX(rw) AS BIGINT) AS rw,
           CAST(MAX(rh) AS BIGINT) AS rh,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM(val) AS BIGINT) AS sum_val,
           CAST(MIN(val) AS BIGINT) AS min_val,
           CAST(MAX(val) AS BIGINT) AS max_val,
           CAST(SUM(val * (s + 1)) AS BIGINT) AS pos_checksum
    FROM v GROUP BY doc_id
    """,
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor 2:1 DOWNSAMPLE of the decoded PGM rasters —
    the thumbnail/preprocess step every vision-training pipeline runs
    before featurization (SURVEY.md §2.B multimodal: decode /
    feature-extract / RESIZE / frame-sample; this is the resize).
    Each image decodes once, downsamples with a strided numpy view
    (plane[::2, ::2] — no interpolation arithmetic, bit-exact pixel
    copies), and reduces to stats that PIN THE PIXEL PLACEMENT: the
    position-weighted checksum Σ val·(s+1) over the resized row-major
    order catches any off-by-one in stride or dimension that plain
    sums would miss. The oracle indexes the cyclic source text
    directly at (2i·w + 2j) mod len — no pixel-plane self-join.

    Scale shape: Arrow-batched mapInPandas; each image reduces to ONE
    row inside the decoder (the gradient-energy pattern — ~10⁴:1
    before any shuffle); the output frame is doc-count-sized. A real
    resize-for-training would emit the resized binary column the same
    way (payload out instead of stats); the stats form keeps the
    driver-gate schema scalar-only."""
    import numpy as np
    import pandas as pd

    d = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    pgm = _pgm_frames(d)

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("rw", T.LongType()),
            T.StructField("rh", T.LongType()),
            T.StructField("n_px", T.LongType()),
            T.StructField("sum_val", T.LongType()),
            T.StructField("min_val", T.LongType()),
            T.StructField("max_val", T.LongType()),
            T.StructField("pos_checksum", T.LongType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        header = re.compile(rb"^P5\n(\d+) (\d+)\n255\n")
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "rw", "rh", "n_px", "sum_val", "min_val",
                "max_val", "pos_checksum",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                m = header.match(buf)
                if m is None:
                    continue
                iw, ih = int(m.group(1)), int(m.group(2))
                plane = np.frombuffer(
                    buf, dtype=np.uint8, count=iw * ih, offset=m.end()
                ).reshape(ih, iw)
                small = plane[::2, ::2].astype(np.int64)
                flat = small.ravel()
                out["doc_id"].append(doc_id)
                out["rw"].append(small.shape[1])
                out["rh"].append(small.shape[0])
                out["n_px"].append(flat.size)
                out["sum_val"].append(int(flat.sum()))
                out["min_val"].append(int(flat.min()))
                out["max_val"].append(int(flat.max()))
                out["pos_checksum"].append(
                    int((flat * (np.arange(flat.size) + 1)).sum())
                )
            yield pd.DataFrame(out)

    return pgm.mapInPandas(decode, out_schema)
