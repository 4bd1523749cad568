"""Multimodal columns (Tier C, SURVEY.md §2.3): image/audio/video as
opaque ``binary`` payloads + a typed metadata struct, processed by
Arrow-batched ``mapInPandas`` stages.

Container constraint: no image/audio libs are installed here, so the
actual codec step is STUBBED — ``decode_features`` has a real-library
path that raises NotImplementedError (import-gated PIL) and a
deterministic fake path computing features straight from the bytes.
Everything AROUND the codec is real and tested: schema, Arrow batch
shapes, UDF signatures, partitioning.

Scale design: payloads stay opaque binary until the one mapInPandas
stage that needs them (no JVM↔Python crossing before it); feature
outputs are tiny typed columns, so everything downstream of decode is
ordinary columnar Spark. On a cluster you'd read real payloads with
``spark.read.format("binaryFile")`` or from a lakehouse table whose
payload column points at object storage.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from dataextractor_spark.catalog import load_table
from dataextractor_spark.registry import query

#: metadata carried alongside every payload — the typed contract a
#: 100 TB pipeline needs to route/filter WITHOUT touching bytes.
MEDIA_META_SCHEMA = "kind STRING, width INT, height INT, sample_rate INT"

FEATURE_SCHEMA = (
    "doc_id BIGINT, kind STRING, n_bytes BIGINT, first_byte BIGINT, "
    "decode_backend STRING"
)


def attach_payloads(docs: DataFrame) -> DataFrame:
    """Synthesize deterministic binary payloads from the documents
    table (payload = utf-8 bytes of the text — a stand-in with real
    binary semantics) plus a typed media-metadata struct. All JVM-side
    expressions; zero Python until a consumer decodes."""
    kind = F.when(F.col("doc_id") % 3 == 0, "image").when(
        F.col("doc_id") % 3 == 1, "audio"
    ).otherwise("video")
    meta = F.struct(
        kind.alias("kind"),
        F.when(kind == "image", F.lit(640)).otherwise(F.lit(None).cast("int")).alias(
            "width"
        ),
        F.when(kind == "image", F.lit(480)).otherwise(F.lit(None).cast("int")).alias(
            "height"
        ),
        F.when(kind == "audio", F.lit(16000))
        .otherwise(F.lit(None).cast("int"))
        .alias("sample_rate"),
    )
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        meta.alias("media"),
    )


def decode_features(
    media_df: DataFrame, *, backend: str = "fake"
) -> DataFrame:
    """Per-payload feature extraction as ONE mapInPandas stage.

    backend="fake": deterministic features computed from raw bytes
    (length + first byte) — exercises the full Arrow round trip.
    backend="pil": the real-library path; import-gated and raising
    NotImplementedError in this container (clearly-marked stub).
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if backend == "pil":
                try:
                    import PIL  # noqa: F401
                except ImportError as exc:  # pragma: no cover - env-specific
                    raise NotImplementedError(
                        "real image decode requires PIL, not installed in "
                        "this container; use backend='fake'"
                    ) from exc
                raise NotImplementedError("PIL decode path not implemented")
            rows = {
                "doc_id": pdf["doc_id"],
                "kind": [m["kind"] for m in pdf["media"]],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "first_byte": [p[0] if len(p) else -1 for p in pdf["payload"]],
                "decode_backend": backend,
            }
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(
    media_df: DataFrame, *, target_w: int = 64, target_h: int = 48
) -> DataFrame:
    """Resize stub: for image payloads, emit a 'resized' payload whose
    byte length is scaled by the area ratio (deterministic fake — the
    real path would decode→resample→re-encode via PIL, which is not in
    this container) plus updated metadata. The Arrow batch shape,
    metadata rewrite, and binary-in/binary-out signature are the real
    contract a codec implementation drops into."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "payload": [], "width": [], "height": []}
            for doc_id, media, payload in zip(
                pdf["doc_id"], pdf["media"], pdf["payload"]
            ):
                if media["kind"] != "image":
                    continue
                ratio = (target_w * target_h) / float(media["width"] * media["height"])
                n_out = max(1, int(len(payload) * ratio))
                out["doc_id"].append(doc_id)
                out["payload"].append(payload[:n_out])
                out["width"].append(target_w)
                out["height"].append(target_h)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(
        run, "doc_id BIGINT, payload BINARY, width INT, height INT"
    )


def sample_frames(
    media_df: DataFrame, *, every_n_bytes: int = 64, max_frames: int = 4
) -> DataFrame:
    """Frame-sampling stub: emit up to ``max_frames`` fixed-stride
    "frames" (byte slices) per video payload — the row-explosion shape
    of real frame extraction (one input row → k frame rows), with
    deterministic fake content. Output stays (doc_id, frame_no,
    frame_bytes) so downstream batching/partitioning is realistic."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_no": [], "frame_bytes": []}
            for doc_id, media, payload in zip(
                pdf["doc_id"], pdf["media"], pdf["payload"]
            ):
                if media["kind"] != "video":
                    continue
                for i in range(max_frames):
                    start = i * every_n_bytes
                    if start >= len(payload):
                        break
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["frame_bytes"].append(payload[start : start + every_n_bytes])
            yield pd.DataFrame(out)

    return media_df.mapInPandas(
        run, "doc_id BIGINT, frame_no INT, frame_bytes BINARY"
    )


@query(
    "multimodal_features",
    oracle="""
    SELECT
        CASE WHEN doc_id % 3 = 0 THEN 'image'
             WHEN doc_id % 3 = 1 THEN 'audio'
             ELSE 'video' END            AS kind,
        count(*)                         AS n_docs,
        CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        round(avg(ascii(substring(text, 1, 1))), 6) AS avg_first_byte
    FROM documents
    GROUP BY kind
    ORDER BY kind
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline end-to-end: attach payloads + typed
    metadata → Arrow-batched fake decode → per-kind feature rollup.
    The oracle recomputes the same features from the source text
    (payload bytes ≡ utf-8 text bytes), proving the binary plumbing
    and the mapInPandas batch contract numerically."""
    docs = load_table(spark, sf_dir, "documents")
    feats = decode_features(attach_payloads(docs), backend="fake")
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("first_byte"), 6).alias("avg_first_byte"),
        )
        .orderBy("kind")
    )


@query(
    "multimodal_framesample",
    oracle="""
    SELECT count(*) AS n_videos,
        CAST(sum(least(4, CAST(ceil(strlen(text) / 64.0) AS BIGINT))) AS BIGINT)
            AS total_frames,
        CAST(sum(list_sum(list_transform(range(0, 4), i ->
            CASE WHEN strlen(text) > i * 64
                 THEN least(64, strlen(text) - i * 64) ELSE 0 END)))
             AS BIGINT) AS total_frame_bytes
    FROM documents
    WHERE doc_id % 3 = 2
    """,
)
def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling path end-to-end: the one-row→k-rows explosion a
    real video decoder produces, via mapInPandas (up to 4 byte-stride
    frames per video payload), rolled up to totals. The oracle
    recomputes frame counts and byte coverage arithmetically from the
    source text lengths — the Arrow batch explosion must agree with
    the closed form exactly."""
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_payloads(docs))
    return frames.agg(
        F.countDistinct("doc_id").alias("n_videos"),
        F.count(F.lit(1)).cast("long").alias("total_frames"),
        F.sum(F.length("frame_bytes")).alias("total_frame_bytes"),
    )


@query(
    "multimodal_resize",
    oracle="""
    SELECT count(*) AS n_images,
        CAST(sum(greatest(1, CAST(floor(strlen(text) * 0.01) AS BIGINT)))
             AS BIGINT) AS total_resized_bytes
    FROM documents
    WHERE doc_id % 3 = 0
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize path end-to-end: binary-in/binary-out mapInPandas with a
    metadata rewrite (640×480 → 64×48, byte length scaled by the exact
    area ratio 0.01 in the deterministic fake). The oracle recomputes
    the resized byte budget from source lengths, pinning the batch
    contract a real codec drops into."""
    docs = load_table(spark, sf_dir, "documents")
    resized = resize_images(attach_payloads(docs))
    return resized.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(F.length("payload")).alias("total_resized_bytes"),
    )
