"""Parametric multimodal-column operators (opaque binary payloads).

Round-5 extraction, third wave: the multimodal plumbing — Arrow-batched
decode / feature extraction / frame sampling over a ``binary`` column —
as schema-agnostic functions with PLUGGABLE decoders:

    from dataframe_differ_spark.operators.multimodal import decode_features
    feats = decode_features(images, id_col="img_id", payload_col="bytes",
                            decoder=my_pillow_decoder)

The Spark side (schema contract, Arrow batch iteration, partition-local
pipelining with the scan — no shuffle) is real and tested; the DEFAULT
decoder/sampler are deterministic stubs because this container ships no
image/audio libraries (pillow/ffmpeg). A production decoder drops in as a
plain Python callable without touching any Spark code — the stub defines
the exact signature it must satisfy. Fixture bindings + full oracles:
``multimodal_features``, ``multimodal_framesample``,
``multimodal_binary_dedup``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "stub_image_decoder",
    "stub_frame_sampler",
    "decode_features",
    "sample_frames",
    "dedup_payloads",
]


def stub_image_decoder(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for ``PIL.Image.open(io.BytesIO(payload))``:
    fake (width, height, channels) derived from the bytes themselves, so
    the full dataflow is verifiable without an image library."""
    return 64 + len(payload) % 512, 64 + payload[0] % 64, 3


def stub_frame_sampler(payload: bytes) -> Iterator[tuple[int, int, str]]:
    """Deterministic stand-in for ffmpeg keyframe extraction: up to 3
    fixed-stride 100-byte windows (at least one for short payloads),
    yielding (frame_idx, byte_offset, md5-of-window)."""
    n = max(1, min(3, len(payload) // 100))
    for i in range(n):
        yield i, i * 100, hashlib.md5(payload[i * 100 : i * 100 + 100]).hexdigest()


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    *,
    decoder: Callable[[bytes], tuple[int, int, int]] = stub_image_decoder,
) -> DataFrame:
    """Per-payload typed features via ``mapInPandas``: returns
    ``(id_col, n_bytes, width, height, channels)``.

    Binary column in, Arrow batch iterator, typed schema out — pipelined
    with the scan, partition-local, no shuffle: at 100 TB the decode cost
    is the scan cost and parallelism is the file-split count. ``decoder``
    is any ``bytes -> (w, h, c)`` callable (e.g. a Pillow open +
    ``im.size``); it runs inside the Arrow worker, once per payload.
    """
    import pandas as pd

    def extract(batches):
        for pdf in batches:
            dims = [decoder(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": [len(b) for b in pdf[payload_col]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    schema = f"{id_col} bigint, n_bytes int, width int, height int, channels int"
    return df.select(id_col, payload_col).mapInPandas(extract, schema)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    *,
    sampler: Callable[[bytes], Iterator[tuple[int, int, str]]] = stub_frame_sampler,
) -> DataFrame:
    """One payload → N sampled frames via ``mapInPandas`` (the flatMap
    shape video decoders need): returns ``(id_col, frame_idx,
    byte_offset, frame_hash)`` with a VARIABLE number of rows per input.

    ``sampler`` is any ``bytes -> iterator of (idx, offset, hash)``
    callable (ffmpeg keyframe extraction in production). Pipeline stays
    shuffle-free: scan → Arrow → Python → Arrow, partition-local.
    """
    import pandas as pd

    def sample(batches):
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                for idx, off, h in sampler(payload):
                    rows.append((rid, idx, off, h))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "byte_offset", "frame_hash"]
            )

    schema = (
        f"{id_col} bigint, frame_idx int, byte_offset int, frame_hash string"
    )
    return df.select(id_col, payload_col).mapInPandas(sample, schema)


def dedup_payloads(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    *,
    hash_col: str = "payload_hash",
) -> DataFrame:
    """Content-hash dedup of binary payloads: md5 over the raw bytes,
    hash-groupBy, min-id canonical — the first pass every multimodal
    ingest runs (byte-identical crawl duplicates are the bulk of media
    duplication and cost one scan). Returns ``(hash_col,
    canonical_<id_col>, copies)``; ``copies > 1`` are duplicate groups.
    Uniform 128-bit shuffle key, map-side combine — the H1 plan on bytes.
    """
    return df.groupBy(F.md5(F.col(payload_col)).alias(hash_col)).agg(
        F.min(id_col).alias(f"canonical_{id_col}"),
        F.count(F.lit(1)).alias("copies"),
    )
