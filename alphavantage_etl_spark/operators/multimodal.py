"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference pipeline is tabular-only; a training-data engine must carry
media through the same relational plans (north star X5). The design:

- **binary payload column** (``BinaryType``) — raw encoded bytes. Parquet
  stores these as BYTE_ARRAY with page compression; filters/joins never
  touch the payload, so column pruning keeps scans cheap (check
  ``ReadSchema`` — a metadata-only query must not read the payload pages).
- **typed metadata struct** — width/height/frames/sample-rate/format,
  decoded ONCE at ingest, so downstream predicates (``meta.width >= 512``)
  are plain Catalyst filters with pushdown, never a decode in the hot path.
- **decode / feature-extract as Arrow-batched ``mapInPandas``** — the only
  genuinely-Python step. Batches arrive as pandas DataFrames (payload as
  ``bytes``); output schema is declared up front. The image/audio libraries
  are NOT in this container, so the real decode path raises
  ``NotImplementedError`` and a clearly-marked deterministic fake stands in;
  the Spark-side plumbing (schema, batching, partitioning) is real and
  tested — swapping the fake for PIL/torchvision changes one function body.

Scale: payloads dominate bytes but never shuffle (feature extraction is a
narrow map); only ids + features + metadata enter joins/aggregations. For
100 TB of media, size ``spark.sql.files.maxPartitionBytes`` so a partition's
payloads fit executor memory, and prefer many small row groups.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pandas only used inside mapInPandas workers
    import pandas as pd

N_FEATURES = 8

FEATURES_SCHEMA = "doc_id long, n_bytes int, features array<float>"


def attach_media(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Synthesize a deterministic media column set from a text corpus.

    Real ingest reads encoded bytes from object storage; the fixtures carry
    no binary column, so the payload is the sha256 digest of the text
    (deterministic, content-addressed — the plumbing downstream is identical
    to real media bytes).
    """
    did = F.col(id_col)
    return docs.select(
        did,
        F.to_binary(F.sha2(F.col(text_col), 256), F.lit("hex")).alias("payload"),
        F.struct(
            (16 + (did % 16) * 8).cast("int").alias("width"),
            (16 + (did % 12) * 8).cast("int").alias("height"),
            (1 + did % 8).cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
            F.lit("fake/rgb8").alias("format"),
        ).alias("meta"),
    )


def decode_image_features(df: DataFrame, mode: str = "fake") -> DataFrame:
    """Feature-extract each payload via Arrow-batched ``mapInPandas``.

    ``mode='fake'``: deterministic stand-in — first ``N_FEATURES`` payload
    bytes scaled to [0, 1]. ``mode='real'`` documents the intended body and
    raises: the decode libraries are not installed in this container.
    """
    if mode not in ("fake", "real"):
        raise ValueError(f"mode must be 'fake' or 'real', got {mode!r}")

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            if mode == "real":
                # Real body: PIL.Image.open(io.BytesIO(b)) -> resize ->
                # np.asarray -> channel means/moments per image.
                raise NotImplementedError(
                    "real image decode needs PIL/opencv (not in this container); "
                    "use mode='fake' for the deterministic stand-in"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "features": pdf["payload"].map(
                        lambda b: [round(x / 255.0, 6) for x in b[:N_FEATURES]]
                    ),
                }
            )

    return df.mapInPandas(extract, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, payload binary, "
    "meta struct<width:int,height:int,n_frames:int,sample_rate:int,format:string>"
)


def resize_media(
    df: DataFrame, width: int, height: int, mode: str = "fake"
) -> DataFrame:
    """Re-encode each payload at (width, height) via Arrow-batched
    ``mapInPandas`` — the resize stage of an image pipeline, same plumbing
    contract as :func:`decode_image_features`: declared output schema,
    payload transformed batch-wise in Python, metadata struct updated to
    the new dimensions JVM-side semantics (emitted from the same batch).

    ``mode='fake'``: deterministic stand-in — the "resized" payload is
    sha256(payload || 'wxh') truncated/tiled to ``width*height//64`` bytes,
    so output size scales with the target dims and the transform is
    content-addressed (same input + dims -> same bytes, any run, any
    partitioning). ``mode='real'`` documents the intended body and raises.
    """
    if mode not in ("fake", "real"):
        raise ValueError(f"mode must be 'fake' or 'real', got {mode!r}")
    if width <= 0 or height <= 0:
        raise ValueError(f"target dims must be positive, got {width}x{height}")
    n_out = max(1, (width * height) // 64)

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        def fake_resize(b: bytes) -> bytes:
            if mode == "real":
                # Real body: PIL.Image.open(io.BytesIO(b))
                #   .resize((width, height)).save(buf, format=...) -> bytes
                raise NotImplementedError(
                    "real image resize needs PIL/opencv (not in this "
                    "container); use mode='fake' for the deterministic "
                    "stand-in"
                )
            seed = hashlib.sha256(bytes(b) + f"{width}x{height}".encode()).digest()
            reps = (n_out + len(seed) - 1) // len(seed)
            return (seed * reps)[:n_out]

        for pdf in batches:
            meta = pd.DataFrame(
                {
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "n_frames": [m["n_frames"] for m in pdf["meta"]],
                    "sample_rate": [m["sample_rate"] for m in pdf["meta"]],
                    "format": [m["format"] for m in pdf["meta"]],
                }
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(fake_resize),
                    "meta": meta.to_dict("records"),
                }
            )

    return df.mapInPandas(resize, schema=RESIZED_SCHEMA)


def frame_sample(df: DataFrame, frame_size: int = 4, every_k: int = 2) -> DataFrame:
    """Sample every k-th fixed-size frame from each payload — video-style
    frame extraction as pure byte slicing (``substr`` works on binary), no
    Python. One output row per sampled frame.
    """
    n_frames = (F.octet_length("payload") / frame_size).cast("int")
    # sequence(0, -1, k) raises at runtime, so payloads shorter than one
    # frame must short-circuit to an empty frame list, not an error
    idx = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1, F.lit(every_k))
    ).otherwise(F.array().cast("array<int>"))
    exploded = df.select(
        "doc_id",
        F.posexplode(
            F.transform(idx, lambda i: F.col("payload").substr(i * frame_size + 1, F.lit(frame_size)))
        ).alias("pos", "frame"),
    )
    return exploded.select(
        "doc_id", (F.col("pos") * every_k).alias("frame_no"), "frame"
    )


PHASH_SCHEMA = "doc_id long, phash long"


def image_phash(df: DataFrame, mode: str = "fake") -> DataFrame:
    """dHash-style 64-bit perceptual fingerprint per payload — the image
    counterpart of the text SimHash: visually-near images differ in few
    bits, so near-dup detection reduces to banded hamming joins.

    ``mode='real'`` documents the intended body (decode -> grayscale ->
    9x8 resize -> adjacent-pixel gradient bits) and raises: the decode
    libraries are not in this container. ``mode='fake'`` derives the 8x9
    pseudo-pixel grid deterministically from the payload bytes, keeping
    every downstream property real: equal payloads hash equal, near
    payloads differ in few bits, and the Arrow batch plumbing matches
    the real path exactly (one function body swaps).
    """
    if mode not in ("fake", "real"):
        raise ValueError(f"mode must be 'fake' or 'real', got {mode!r}")

    def hash_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def dhash(b: bytes) -> int:
            if mode == "real":
                # Real body: PIL.Image.open -> convert('L') -> resize((9,8))
                # -> bits[r][c] = px[r][c] < px[r][c+1]
                raise NotImplementedError(
                    "real image decode needs PIL/opencv; use mode='fake'"
                )
            grid = (b * (72 // max(len(b), 1) + 1))[:72]
            bits = 0
            for r in range(8):
                for c in range(8):
                    i = r * 9 + c
                    bits = (bits << 1) | (1 if grid[i] < grid[i + 1] else 0)
            return bits - (1 << 64) if bits >= (1 << 63) else bits

        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "phash": pdf["payload"].map(dhash)}
            )

    return df.mapInPandas(hash_batches, schema=PHASH_SCHEMA)


def phash_near_dups(
    hashes: DataFrame, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with hamming(phash) <= ``max_hamming``,
    found via banded buckets — the SimHash/LSH shuffle shape: split the 64
    bits into ``bands`` slices, join only rows sharing a slice value, then
    verify the exact distance with ``bit_count`` on candidates only. With
    ``bands > max_hamming`` the pigeonhole guarantees every qualifying
    pair shares at least one clean band (no recall loss); shuffle keys are
    (band, slice) — never all-pairs.
    """
    if bands <= max_hamming:
        raise ValueError(
            "bands must exceed max_hamming for guaranteed recall "
            f"(got bands={bands}, max_hamming={max_hamming})"
        )
    if 64 % bands != 0:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1
    slices = F.array(
        *[
            F.expr(f"shiftright(phash, {i * width}) & {mask}L")
            for i in range(bands)
        ]
    )
    banded = hashes.select(
        F.col("doc_id"), F.col("phash"),
        F.posexplode(slices).alias("band", "bval"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bval") == F.col("b.bval"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.expr("bit_count(a.phash ^ b.phash)").alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.filter(F.col("hamming") <= max_hamming)
