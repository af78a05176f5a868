"""Multimodal (image/audio/video) column handling.

Design for 100 TB: media never travels through the relational plan as
inline bytes unless it must.  Two representations:

- **inline**: an opaque ``binary`` payload column + typed metadata struct
  (byte_size, sha256, mime) — fine for thumbnails/snippets;
- **pointer**: (uri, offset, length) struct referencing an object store —
  the only sane layout for 100 TB; the relational engine plans over
  metadata and defers byte access to ``mapInPandas`` stages that fetch
  lazily per batch.

Decode/resize/frame-sample are Arrow-batched ``mapInPandas`` stages.
``decode_image`` attempts a lazy PIL import inside the batch function on
each executor — real decode the moment Pillow is installed, the
documented NotImplementedError otherwise (this container has no imaging
libraries).  ``fake_feature_extract``/``fake_resize`` compute
deterministic hash-derived outputs so the Spark-side plumbing (schema,
batching, partitioning) is real and testable end-to-end either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import ensure_package_on_executors

FEATURE_DIM = 4

PAYLOAD_META_SCHEMA = "struct<byte_size:bigint,sha256:string,mime:string>"


def attach_binary_payload(
    df: DataFrame, source_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Materialize an opaque binary payload + metadata struct from a source
    column (here text; in production the bytes come from the storage
    layer).  Metadata is computed JVM-side."""
    payload = F.col(source_col).cast("binary")
    return df.withColumns(
        {
            "payload": payload,
            "payload_meta": F.struct(
                F.octet_length(F.col(source_col)).cast("bigint").alias("byte_size"),
                F.sha2(F.col(source_col), 256).alias("sha256"),
                F.lit(mime).alias("mime"),
            ),
        }
    )


def pointer_payload(
    df: DataFrame, uri_col: str, offset_col: str, length_col: str
) -> DataFrame:
    """Pointer-style payload for datasets too large to inline."""
    return df.withColumn(
        "payload_ref",
        F.struct(
            F.col(uri_col).alias("uri"),
            F.col(offset_col).cast("bigint").alias("offset"),
            F.col(length_col).cast("bigint").alias("length"),
        ),
    )


def decode_image(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode image payload bytes into (width, height, mode) metadata.

    Real decode runs the moment the environment gains PIL (Pillow): the
    import is attempted lazily *inside* the Arrow batch function on each
    executor, so the operator works without a rebuild once the library is
    installed.  Without PIL this raises the documented NotImplementedError
    — use :func:`fake_feature_extract` for pipeline plumbing tests; its
    mapInPandas wiring (schema, batching, partitioning) is identical.
    """
    ensure_package_on_executors(df.sparkSession)
    out_schema = f"{id_col} bigint, width int, height int, mode string"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import io

            from PIL import Image  # type: ignore[import-not-found]
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "image decode requires an imaging library (pip install "
                "Pillow); use fake_feature_extract for pipeline plumbing "
                "tests"
            ) from exc
        for pdf in batches:
            widths, heights, modes = [], [], []
            for raw in pdf[payload_col]:
                with Image.open(io.BytesIO(bytes(raw))) as im:
                    widths.append(im.width)
                    heights.append(im.height)
                    modes.append(im.mode)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": widths,
                    "height": heights,
                    "mode": modes,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, out_schema)


def fake_feature_extract(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Deterministic stand-in for a media feature extractor.

    Arrow-batched mapInPandas: each batch converts payload bytes into a
    FEATURE_DIM-float vector derived from sha256 — the real extractor
    swaps only the inner function, keeping schema/batching identical.
    """
    ensure_package_on_executors(df.sparkSession)
    out_schema = f"{id_col} bigint, feature array<double>, n_bytes bigint"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for raw in pdf[payload_col]:
                buf = bytes(raw) if raw is not None else b""
                digest = hashlib.sha256(buf).digest()
                feats.append(
                    [
                        int.from_bytes(digest[4 * i : 4 * i + 4], "big")
                        / 4294967295.0
                        for i in range(FEATURE_DIM)
                    ]
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "feature": feats,
                    "n_bytes": [
                        len(bytes(r)) if r is not None else 0
                        for r in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, out_schema)


PHASH_BITS = 60  # stays inside a signed 64-bit long (no 1<<63)
PHASH_BANDS = 10  # 10 bands x 6 bits: hamming <= 9 always collides >= once


def fake_phash(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Deterministic perceptual-hash stand-in over media payload bytes.

    Arrow-batched ``mapInPandas``, same contract as the other fake media
    stages: the inner function is what a real pHash (DCT over a decoded
    grayscale grid) replaces; the stand-in samples ``PHASH_BITS`` evenly
    spaced base64 character codes and thresholds each against their mean
    — similar payloads produce nearby hashes, which is the property the
    downstream banded Hamming join exploits.  Empty/NULL payloads hash
    to 0.  Exactly mirrored in SQL by llm_ops._sql_phash (base64 keeps
    both engines in the same ASCII domain, no multibyte divergence)."""
    import base64 as _b64

    ensure_package_on_executors(df.sparkSession)
    out_schema = f"{id_col} bigint, phash bigint"

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for raw in pdf[payload_col]:
                buf = bytes(raw) if raw is not None else b""
                b64 = _b64.b64encode(buf).decode("ascii")
                n = len(b64)
                if n == 0:
                    out.append(0)
                    continue
                codes = [
                    ord(b64[(j * n) // PHASH_BITS])
                    for j in range(PHASH_BITS)
                ]
                mean = sum(codes) / float(PHASH_BITS)
                v = 0
                for j, c in enumerate(codes):
                    if c >= mean:
                        v |= 1 << j
                out.append(v)
            yield pd.DataFrame({id_col: pdf[id_col], "phash": out})

    return df.select(id_col, payload_col).mapInPandas(hash_batch, out_schema)


def frame_sample(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    frame_bytes: int = 64,
    stride: int = 128,
) -> DataFrame:
    """Frame sampling over binary payloads (the video keyframe analogue).

    Every ``stride`` bytes, emit a ``frame_bytes`` slice as its own row —
    Arrow-batched ``mapInPandas`` that EXPANDS rows (one payload -> many
    frames), which is the shape a real decoder-sampler has.  Slicing is
    byte-deterministic, so the DuckDB oracle reproduces it with substring
    arithmetic; a real codec swaps only the inner loop.
    """
    ensure_package_on_executors(df.sparkSession)
    out_schema = f"{id_col} bigint, frame_idx bigint, frame binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            idxs: list = []
            frames: list = []
            for i, raw in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(raw) if raw is not None else b""
                for k, off in enumerate(range(0, len(buf), stride)):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(buf[off : off + frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(sample, out_schema)


def resize_image(
    df: DataFrame,
    id_col: str,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
) -> DataFrame:
    """STUB boundary for image resize (PIL/opencv absent by design):
    raises like :func:`decode_image`; :func:`fake_resize` carries the real
    Spark-side plumbing with a deterministic stand-in transform."""
    raise NotImplementedError(
        "image resize requires an imaging library; use fake_resize for "
        "pipeline plumbing tests"
    )


def fake_resize(
    df: DataFrame,
    id_col: str,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
) -> DataFrame:
    """Deterministic stand-in for a resize stage: emits a pseudo-payload of
    exactly ``target_w * target_h`` bytes derived from the source bytes by
    repeating/truncating (byte-deterministic, so tests can assert sizes
    and content stability), plus the output metadata struct a real resizer
    would produce.  Swapping in a real codec changes ONLY the inner
    function — schema, Arrow batching, and partitioning are the product
    shape.
    """
    ensure_package_on_executors(df.sparkSession)
    n_out = target_w * target_h
    out_schema = (
        f"{id_col} bigint, resized binary, out_w int, out_h int, "
        "out_bytes bigint, src_sha256 string"
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, shas = [], [], []
            for i, raw in zip(pdf[id_col], pdf[payload_col]):
                # empty AND null payloads both fall back (len 0 would
                # divide by zero below)
                buf = bytes(raw) if raw else b"\x00"
                reps = (n_out + len(buf) - 1) // len(buf)
                payloads.append((buf * reps)[:n_out])
                shas.append(hashlib.sha256(buf).hexdigest())
                ids.append(i)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "resized": payloads,
                    "out_w": target_w,
                    "out_h": target_h,
                    "out_bytes": [len(p) for p in payloads],
                    "src_sha256": shas,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, out_schema)
