"""Multimodal column plumbing: images/audio/video as opaque binary + typed
metadata, processed in Arrow-batched pandas UDFs via mapInPandas.

The Spark-side plumbing (schemas, batch shapes, partitioning, UDF
signatures) is real and tested; for media types whose decoders aren't in
this container (JPEG/MP3/MP4), the decode step is stubbed behind a clearly
marked NotImplementedError (see ``decode_external``) while our own formats
(ppm/bmp/qpng) decode for real with the pure-numpy codecs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs

DECODE_SCHEMA = (
    "image_id string, ok boolean, reason string, w int, h int, "
    "mean_r double, mean_g double, mean_b double, phash long"
)
RESIZE_SCHEMA = "image_id string, ok boolean, fmt string, bytes binary, w int, h int"

EXTERNAL_FORMATS = {"jpeg", "jpg", "png", "gif", "webp", "mp3", "wav", "mp4"}


def decode_external(data: bytes, fmt: str) -> np.ndarray:
    """STUB: decoding container-external media formats.

    The sandbox has no PIL/cv2/imageio; on a real deployment this calls the
    codec library inside the same pandas UDF. Kept as an explicit seam so
    the pipeline shape (binary in → ndarray out, Arrow-batched) is real.
    """
    raise NotImplementedError(
        f"decoder for {fmt!r} not available in this environment; "
        "plug a real codec (PIL/cv2) here"
    )


def _decode_any(data: bytes, fmt: str) -> np.ndarray:
    if fmt in codecs.FORMATS:
        return codecs.decode(data, fmt)
    return decode_external(data, fmt)


def decode_features(df: DataFrame) -> DataFrame:
    """Decode + per-channel mean features + phash, vectorized per batch.

    Input: the payload schema (image_id, bytes, fmt, ...). Errors are rows,
    never exceptions (error-column contract).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "image_id": pdf["image_id"],
                "ok": np.zeros(n, dtype=bool),
                "reason": np.full(n, "", dtype=object),
                "w": np.zeros(n, dtype="int32"),
                "h": np.zeros(n, dtype="int32"),
                "mean_r": np.zeros(n),
                "mean_g": np.zeros(n),
                "mean_b": np.zeros(n),
                "phash": np.zeros(n, dtype="int64"),
            }
            for i in range(n):
                try:
                    arr = _decode_any(pdf["bytes"].iat[i], pdf["fmt"].iat[i])
                except NotImplementedError:
                    out["reason"][i] = "codec_unavailable"
                    continue
                except Exception as e:
                    out["reason"][i] = f"decode_error:{type(e).__name__}"
                    continue
                out["ok"][i] = True
                out["h"][i], out["w"][i] = arr.shape[:2]
                m = arr.reshape(-1, 3).mean(axis=0)
                out["mean_r"][i], out["mean_g"][i], out["mean_b"][i] = m
                out["phash"][i] = codecs.average_phash(arr)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, DECODE_SCHEMA)


def block_mean_resize(arr: np.ndarray, factor: int) -> np.ndarray:
    """Downscale by integer factor via exact block-mean pooling (numpy)."""
    h, w = arr.shape[:2]
    h2, w2 = h // factor, w // factor
    cropped = arr[: h2 * factor, : w2 * factor]
    return (
        cropped.reshape(h2, factor, w2, factor, 3)
        .mean(axis=(1, 3))
        .round()
        .astype(np.uint8)
    )


def resize_images(df: DataFrame, factor: int = 2) -> DataFrame:
    """Real resize for our formats (block-mean), re-encoded as ppm."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                try:
                    arr = _decode_any(pdf["bytes"].iat[i], pdf["fmt"].iat[i])
                    small = block_mean_resize(arr, factor)
                    rows.append(
                        (
                            pdf["image_id"].iat[i],
                            True,
                            "ppm",
                            codecs.encode_ppm(small),
                            small.shape[1],
                            small.shape[0],
                        )
                    )
                except NotImplementedError:
                    rows.append((pdf["image_id"].iat[i], False, None, None, 0, 0))
            yield pd.DataFrame(
                rows, columns=["image_id", "ok", "fmt", "bytes", "w", "h"]
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


# ---------------------------------------------------------------- video
# QVID: an owned multi-frame container (magic + frame count + length-
# prefixed ppm frames) so the video path — decode container, sample every
# Nth frame, per-frame features — is REAL end-to-end in this sandbox.
# MP4/WebM decode stays an explicit NotImplementedError seam
# (decode_external); on a deployment the same UDF calls ffmpeg/pyav and
# nothing else changes.

_QVID_MAGIC = b"QVID"

FRAME_SCHEMA = (
    "video_id string, frame_idx int, w int, h int, "
    "mean_r double, mean_g double, mean_b double, phash long"
)


def encode_qvid(frames: list[np.ndarray]) -> bytes:
    parts = [_QVID_MAGIC, len(frames).to_bytes(4, "little")]
    for f in frames:
        blob = codecs.encode_ppm(f)
        parts.append(len(blob).to_bytes(4, "little"))
        parts.append(blob)
    return b"".join(parts)


def decode_qvid(data: bytes) -> list[np.ndarray]:
    if data[:4] != _QVID_MAGIC:
        raise ValueError("not a QVID container")
    n = int.from_bytes(data[4:8], "little")
    out, off = [], 8
    for _ in range(n):
        ln = int.from_bytes(data[off : off + 4], "little")
        off += 4
        out.append(codecs.decode_ppm(data[off : off + ln]))
        off += ln
    return out


def frame_sample(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (idx 0, N,
    2N, ...), with per-frame features — Arrow-batched mapInPandas, one
    video decoded at a time, frames never all held as Spark rows.

    Input: (video_id string, bytes binary, fmt string). Unknown containers
    (mp4/webm) yield zero frames (the decode_external seam) rather than
    failing the batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                fmt = pdf["fmt"].iat[i]
                if fmt != "qvid":
                    continue  # external codec seam: no frames emitted
                frames = decode_qvid(pdf["bytes"].iat[i])
                for idx in range(0, len(frames), every_n):
                    arr = frames[idx]
                    m = arr.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (
                            pdf["video_id"].iat[i], idx,
                            arr.shape[1], arr.shape[0],
                            float(m[0]), float(m[1]), float(m[2]),
                            codecs.average_phash(arr),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "video_id", "frame_idx", "w", "h",
                    "mean_r", "mean_g", "mean_b", "phash",
                ],
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


def phash_near_pairs(
    df: DataFrame,
    id_col: str = "image_id",
    max_hamming: int = 6,
    n_chunks: int = 8,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash hamming distance.

    The input table already carries a 64-bit ``phash`` per image (computed
    at decode time, BASELINE.json input_hint), so image near-dup detection
    never touches the bytes column: block the int64 phash on bit chunks
    (pigeonhole: distance d < n_chunks ⇒ one shared chunk), equi-join per
    chunk, verify exact distance with bit_count — the same machinery as
    text SimHash (dedup.simhash_near_pairs), never an all-pairs join.

    At 100 TB the scan reads only (id, phash) — two slim columns pruned at
    the parquet reader — and shuffles ~n_chunks×|rows| 16-byte rows;
    degenerate chunk buckets (e.g. flat images that hash alike) are capped
    and logged by cap_bucket_members. Returns (id_a, id_b, hamming).
    """
    from . import dedup

    return dedup.simhash_near_pairs(
        df.select(id_col, "phash"),
        id_col,
        max_hamming=max_hamming,
        n_chunks=n_chunks,
        max_bucket=max_bucket,
        hash_col="phash",
    )


def phash_dedup_clusters(
    df: DataFrame,
    id_col: str = "image_id",
    max_hamming: int = 6,
    n_chunks: int = 8,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Transitive image near-dup clusters over the phash pair edges.

    Single-link pairs alone are not closure-correct (a~b, b~c must cluster
    a,b,c even when a~c is past the hamming threshold), so run min-label
    connected components over the blocked pair edges. Returns
    (id_col, comp) where comp — the lexicographically-least reachable
    image_id — is the cluster's canonical representative; keeping rows
    where id = comp is the dedup survivor set.
    """
    from . import dedup

    pairs = phash_near_pairs(df, id_col, max_hamming, n_chunks, max_bucket)
    return dedup.connected_components(
        df.select(id_col), pairs.select("id_a", "id_b"), id_col=id_col
    )
