"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (BASELINE.json extension surface): image/audio/video payloads live in a
`binary` column with a metadata struct alongside; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
`mapInPandas`, so each executor processes whole record batches without JVM
round-trips — the right shape for CPU-bound media work at 100 TB (partition
count = media files / target batch size; no shuffle).

The external codec libraries (PIL/ffmpeg/librosa) are NOT in this container,
so THIS module's generic decode kernel is stubbed: `decode_image_meta` raises
NotImplementedError unless `fake=True`, in which case it produces a
deterministic fake decode (dimensions derived from the payload hash) — the
Spark-side plumbing (schema, batching, UDF signatures) is real and tested
either way.

For the formats decodable with the stdlib alone the decode IS real: see
functions/media_codec.py — a full PNG decoder (zlib inflate, CRC-verified
chunk walk, all five filter-type reconstructions) and a PCM16 WAV decoder,
each with a spec-conformant writer, oracle-gated pixel/sample statistics
(`png_decode` / `wav_decode`), and hand-computed spec vectors in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_META_SCHEMA = (
    "id long, n_bytes int, magic string, sha_prefix string"
)

DECODED_SCHEMA = "id long, width int, height int, n_channels int, ok boolean"


def with_binary_payload(df: DataFrame, src_col: str, id_col: str, out: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of a string
    column — in production this is the raw image/audio bytes from
    `spark.read.format('binaryFile')` or a parquet BYTE_ARRAY column)."""
    return df.select(F.col(id_col).alias("id"), F.encode(F.col(src_col), "UTF-8").alias(out))


def binary_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata over the opaque payload — pure JVM expressions:
    byte length, magic prefix (first 4 bytes hex), content hash prefix."""
    return df.select(
        "id",
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
        F.substring(F.upper(F.hex(F.col(payload_col))), 1, 8).alias("magic"),
        F.substring(F.lower(F.sha2(F.col(payload_col), 256)), 1, 16).alias("sha_prefix"),
    )


def decode_image_meta(df: DataFrame, payload_col: str = "payload", fake: bool = False) -> DataFrame:
    """'Decode' each payload to (width, height, channels) via mapInPandas.

    Real decoders (PIL etc.) are unavailable in this environment; with
    fake=True a deterministic stand-in derives dimensions from the byte
    content so tests can exercise the full distributed plumbing. The batch
    shape, Arrow transfer, and output schema are exactly what a real decoder
    kernel would use.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/opencv, not present in this container; "
                    "pass fake=True for the deterministic test kernel"
                )
            payloads = pdf[payload_col]
            n = payloads.map(len)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "width": (n % 640 + 16).astype("int32"),
                    "height": (n % 480 + 16).astype("int32"),
                    "n_channels": ((n % 2) * 2 + 1).astype("int32"),
                    "ok": True,
                }
            )

    return df.mapInPandas(_decode, schema=DECODED_SCHEMA)


FEATURES_SCHEMA = "id long, features array<double>"
RESIZED_SCHEMA = "id long, n_bytes int, resized binary, ok boolean"


def extract_features(
    df: DataFrame, payload_col: str = "payload", dim: int = 8, fake: bool = False
) -> DataFrame:
    """Feature extraction plumbing: payload bytes -> fixed-dim embedding via
    mapInPandas (the CLIP/wav2vec slot in a real pipeline; model runtimes are
    absent here, so the fake kernel is deterministic byte arithmetic).

    Fake kernel: feature_i = (sum of bytes at positions ≡ i (mod dim)
    modulo 1000) / 1000.0 — integer ops then one exact double divide, so the
    whole pipeline has a bit-exact cross-engine oracle. Output embeds
    straight into the similarity operators (cosine_topk/ann_*), wiring the
    multimodal path into the ANN stack."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "feature extraction requires a model runtime (CLIP/wav2vec), "
                    "not present in this container; pass fake=True for the "
                    "deterministic test kernel"
                )
            feats = []
            for b in pdf[payload_col]:
                sums = [0] * dim
                for pos, byte in enumerate(b):
                    sums[pos % dim] += byte
                feats.append([(s % 1000) / 1000.0 for s in sums])
            yield pd.DataFrame({"id": pdf["id"], "features": feats})

    return df.mapInPandas(_extract, schema=FEATURES_SCHEMA)


def resize_payload(
    df: DataFrame, payload_col: str = "payload", target_bytes: int = 256, fake: bool = False
) -> DataFrame:
    """Resize plumbing: payload -> bounded-size payload via mapInPandas (the
    image-resize / audio-downsample slot). The fake kernel truncates to
    ``target_bytes`` — deterministic, so the byte lengths (and content) have
    an exact oracle; a real kernel would decode-resize-reencode per batch."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "resize requires PIL/ffmpeg, not present in this container; "
                    "pass fake=True for the deterministic test kernel"
                )
            resized = pdf[payload_col].map(lambda b: bytes(b[:target_bytes]))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": resized.map(len).astype("int32"),
                    "resized": resized,
                    "ok": True,
                }
            )

    return df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, payload_col: str = "payload", every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing: split each payload into fixed-size 'frames'
    (posexplode over byte ranges) — the distributed shape of video frame
    extraction (one row per sampled frame, order-preserving)."""
    return df.select(
        "id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(octet_length({payload_col}) / {every_n_bytes} AS INT)), "
                f"i -> substring({payload_col}, i * {every_n_bytes} + 1, {every_n_bytes}))"
            )
        ).alias("frame_idx", "frame_bytes"),
    ).filter(F.octet_length("frame_bytes") > 0)
