"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training pipelines carry images/audio/video as ``binary`` columns with a
metadata struct; the engine treats them exactly like the reference treats
opaque row payloads (bytes in, bytes out, per-row invariants). Real
decode/resize/frame-sample needs codec libraries that are NOT in this
environment, so the decode kernel is stubbed: ``fake=True`` (default)
computes deterministic byte-level features (real Spark plumbing, fake
pixels); ``fake=False`` raises NotImplementedError where PIL/ffmpeg would be
called. Schema, partitioning, UDF signature, and Arrow batch shape are real
and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

FEATURE_SCHEMA = (
    "doc_id bigint, modality string, n_bytes int, checksum bigint, "
    "width int, height int, feat array<float>"
)
FEATURE_COLS = [c.split(" ")[0] for c in FEATURE_SCHEMA.split(", ")]


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media: payload = utf-8 text bytes, metadata struct
    (modality, width, height) derived from doc_id arithmetic."""
    return docs.select(
        "doc_id",
        F.encode(F.coalesce("text", F.lit("")), "utf-8").alias("payload"),
        F.struct(
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("modality"),
            (F.col("doc_id") % 64 * 16 + 64).cast("int").alias("width"),
            (F.col("doc_id") % 48 * 16 + 64).cast("int").alias("height"),
        ).alias("meta"),
    )


def _extract_batches(fake: bool):
    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        if not fake:
            # probe at runtime instead of assuming: an env that ships PIL
            # gets the real image path; otherwise fail with the actionable
            # message (audio/video still need libav — not probed, no decoder
            # here would use it yet)
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real decode requires PIL/libav (PIL import failed: "
                    f"{e}); run with fake=True for deterministic "
                    "byte-level features"
                ) from e
            import io

            def _decode(pdf: "pd.DataFrame") -> "pd.DataFrame":
                rows = []
                for _, r in pdf.iterrows():
                    if r["modality"] != "image":
                        raise NotImplementedError(
                            f"real {r['modality']} decode requires libav"
                        )
                    img = Image.open(io.BytesIO(r["payload"])).convert("L")
                    arr = np.asarray(img, dtype=np.float32)
                    q = max(arr.shape[0] // 4, 1)
                    feat = np.array(
                        [arr[i * q : (i + 1) * q].mean() for i in range(4)],
                        dtype=np.float32,
                    )
                    rows.append(
                        (
                            r["doc_id"],
                            r["modality"],
                            len(r["payload"]),
                            int(arr.sum()),
                            img.width,
                            img.height,
                            feat,
                        )
                    )
                return pd.DataFrame(rows, columns=FEATURE_COLS)

            for pdf in batches:
                yield _decode(pdf)
            return
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len).astype("int32")
            checksum = payloads.map(
                lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())
                if len(b)
                else 0
            ).astype("int64")
            # 4-dim fake embedding: byte-histogram quartile mass fractions
            feats = []
            for b in payloads:
                if not len(b):
                    feats.append(np.zeros(4, dtype=np.float32))
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.histogram(arr, bins=4, range=(0, 256))[0]
                feats.append((hist / len(arr)).astype(np.float32))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": n_bytes,
                    "checksum": checksum,
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "feat": feats,
                }
            )

    return extract


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""
    flat = media.select(
        "doc_id",
        "payload",
        F.col("meta.modality").alias("modality"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(_extract_batches(fake), FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """'Video' frame sampling as byte-stride slices — the partition-friendly
    plan shape for frame extraction (real decoder would replace the slice)."""
    return media.filter(F.col("meta.modality") == "video").select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, greatest(int(length(payload) / {every_n}), 1)),"
            f" i -> substring(payload, (i - 1) * {every_n} + 1, {every_n}))"
        ).alias("frames"),
    )


RESIZE_SCHEMA = (
    "doc_id bigint, modality string, src_width int, src_height int, "
    "dst_width int, dst_height int, payload binary"
)
RESIZE_COLS = [c.split(" ")[0] for c in RESIZE_SCHEMA.split(", ")]


def resize_plan(
    media: DataFrame, max_dim: int = 256, fake: bool = True
) -> DataFrame:
    """Aspect-preserving image resize as an Arrow-batched Pandas UDF —
    the fourth multimodal kernel (decode / feature-extract / resize /
    frame-sample). Target dims are REAL math (longest side → max_dim,
    aspect kept, floor, min 1 — the computation a PIL ``thumbnail`` call
    would receive); the pixel kernel is a deterministic byte subsample
    under ``fake=True`` and probes for PIL under ``fake=False`` like the
    decode path. Images already within bounds pass through unchanged.

    Plan shape: one mapInPandas over (payload, meta) batches — no
    shuffle; at corpus scale this pipelines with the scan exactly like
    extract_features.
    """

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        if not fake:
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real resize requires PIL (import failed: "
                    f"{e}); run with fake=True for the byte-subsample stub"
                ) from e

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h = int(r["width"]), int(r["height"])
                scale = max_dim / max(w, h)
                if scale >= 1.0:
                    dw, dh = w, h
                    payload = r["payload"]
                else:
                    dw = max(int(w * scale), 1)
                    dh = max(int(h * scale), 1)
                    if fake:
                        # deterministic stand-in: keep every k-th byte,
                        # k = the area ratio (a real kernel replaces this)
                        b = np.frombuffer(r["payload"], dtype=np.uint8)
                        k = max((w * h) // max(dw * dh, 1), 1)
                        payload = b[::k].tobytes()
                    else:
                        import io

                        from PIL import Image

                        img = Image.open(io.BytesIO(r["payload"]))
                        img.thumbnail((max_dim, max_dim))
                        buf = io.BytesIO()
                        img.save(buf, format=img.format or "PNG")
                        payload = buf.getvalue()
                rows.append(
                    (r["doc_id"], r["modality"], w, h, dw, dh, payload)
                )
            yield pd.DataFrame(rows, columns=RESIZE_COLS)

    flat = media.filter(F.col("meta.modality") == "image").select(
        "doc_id",
        "payload",
        F.col("meta.modality").alias("modality"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(resize, RESIZE_SCHEMA)
