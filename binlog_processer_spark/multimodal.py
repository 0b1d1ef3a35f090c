"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training pipelines carry images/audio/video as ``binary`` columns with a
metadata struct; the engine treats them exactly like the reference treats
opaque row payloads (bytes in, bytes out, per-row invariants).

Decode is REAL for three self-describing formats — PPM (P5/P6) and
uncompressed 24-bit BMP images (``decode_image``), and PCM 16-bit mono
WAV audio (``decode_wav``) — implemented in pure numpy, so ``fake=False``
works end-to-end in this environment with no codec libraries. Other
containers (JPEG/PNG/MP3/video) probe for PIL/libav at runtime and raise
NotImplementedError with an actionable message when the env lacks them. ``fake=True`` (default) computes deterministic byte-level
features without decoding at all. Schema, partitioning, UDF signature, and
Arrow batch shape are identical on every path.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import numpy as np
    import pandas as pd


# -- pure-numpy codecs: PPM (P5/P6) and uncompressed 24-bit BMP -----------
# module-level so mapInPandas ships them to executors by module reference


def encode_ppm(arr: "np.ndarray") -> bytes:
    """Binary PPM/PGM: ``P6`` for HxWx3 RGB, ``P5`` for HxW grayscale."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    elif a.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"encode_ppm: shape {a.shape} is not HxWx3 or HxW")
    h, w = a.shape[:2]
    return b"%s %d %d 255\n" % (magic, w, h) + a.tobytes()


def encode_bmp(arr: "np.ndarray") -> bytes:
    """Uncompressed 24-bit BI_RGB BMP (BITMAPINFOHEADER, bottom-up rows,
    4-byte row padding, BGR byte order) from an HxWx3 uint8 array."""
    import struct

    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"encode_bmp: shape {a.shape} is not HxWx3")
    h, w = a.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    raw = body.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(raw), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw), 2835,
                    2835, 0, 0)
    return header + raw


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode a PPM (P6→HxWx3) / PGM (P5→HxW) / uncompressed 24-bit BMP
    (→HxWx3) payload to a uint8 array, pure numpy. Raises ValueError for
    any other container — callers fall through to their PIL probe."""
    import re

    import numpy as np

    if payload[:2] in (b"P5", b"P6"):
        # header: magic, width, height, maxval — whitespace separated,
        # '#' comments legal between tokens; one whitespace byte ends it
        toks, pos, want = [], 2, 3
        while len(toks) < want:
            m = re.match(
                rb"(?:\s|#[^\n]*\n)*(\d+)", payload[pos:pos + 256]
            )
            if not m:
                raise ValueError("bad PPM header")
            toks.append(int(m.group(1)))
            pos += m.end()
        w, h, maxval = toks
        if maxval != 255:
            raise ValueError(f"PPM maxval {maxval} unsupported (255 only)")
        pos += 1  # the single whitespace after maxval
        ch = 3 if payload[:2] == b"P6" else 1
        a = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch,
                          offset=pos)
        return a.reshape(h, w, 3) if ch == 3 else a.reshape(h, w)
    if payload[:2] == b"BM":
        import struct

        off = struct.unpack_from("<I", payload, 10)[0]
        dib = struct.unpack_from("<I", payload, 14)[0]
        if dib < 40:
            raise ValueError("BMP core-header variant unsupported")
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or comp != 0:
            raise ValueError(f"BMP bpp={bpp} compression={comp} unsupported")
        flip = h > 0
        h = abs(h)
        stride = (w * 3 + 3) // 4 * 4
        a = np.frombuffer(
            payload, dtype=np.uint8, count=h * stride, offset=off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
        return a[::-1] if flip else a
    raise ValueError("not a PPM/PGM/BMP payload")


def encode_wav(samples: "np.ndarray", sample_rate: int) -> bytes:
    """Canonical 44-byte-header RIFF/WAVE, PCM 16-bit mono, from an int16
    sample array."""
    import struct

    import numpy as np

    s = np.ascontiguousarray(samples, dtype="<i2")
    if s.ndim != 1:
        raise ValueError(f"encode_wav: shape {s.shape} is not 1-D")
    data = s.tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH",
            b"fmt ",
            16,
            1,  # PCM
            1,  # mono
            sample_rate,
            sample_rate * 2,
            2,
            16,
        )
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple["np.ndarray", int]:
    """Decode RIFF/WAVE PCM 16-bit mono to ``(int16 samples, rate)``,
    pure numpy. Walks the chunk list (extra chunks between fmt and data
    are legal WAV), raises ValueError for any other container/encoding —
    callers fall through to their libav probe."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if (audio_format, channels, bits) != (1, 1, 16):
        raise ValueError(
            f"WAV format={audio_format} ch={channels} bits={bits} "
            "unsupported (PCM 16-bit mono only)"
        )
    return np.frombuffer(data, dtype="<i2"), rate


def media_audio_params(doc_id: int) -> tuple[int, int]:
    """Deterministic (n_samples, sample_rate) for synthesized audio."""
    return int(doc_id % 128 * 16 + 128), int(8000 + doc_id % 4 * 4000)


def media_samples(doc_id: int, n: int) -> "np.ndarray":
    """Deterministic int16 sample array — the generator's ground truth,
    closed-form so the DuckDB oracle recomputes its sum in SQL:
    ``(doc_id*13 + i*7 + i*i*3) % 4096 - 2048``."""
    import numpy as np

    i = np.arange(n, dtype=np.int64)
    return ((doc_id * 13 + i * 7 + i * i * 3) % 4096 - 2048).astype(
        np.int16
    )


def media_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic (width, height) for synthesized real images."""
    return int(doc_id % 16 * 4 + 8), int(doc_id % 12 * 4 + 8)


def media_pixels(doc_id: int, w: int, h: int) -> "np.ndarray":
    """Deterministic RGB pixel array for ``doc_id`` — the generator's
    ground truth the decode tests compare against."""
    import numpy as np

    y = np.arange(h, dtype=np.int64)[:, None, None]
    x = np.arange(w, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((doc_id * 7 + y * 3 + x * 5 + c * 11) % 256).astype(np.uint8)

FEATURE_SCHEMA = (
    "doc_id bigint, modality string, n_bytes int, checksum bigint, "
    "width int, height int, feat array<float>"
)
FEATURE_COLS = [c.split(" ")[0] for c in FEATURE_SCHEMA.split(", ")]


def synthesize_media(docs: DataFrame, codec: str | None = None) -> DataFrame:
    """Deterministic media column. Default (``codec=None``): payload =
    utf-8 text bytes with doc_id-derived metadata — fast, container-less,
    for the byte-level (``fake=True``) paths. ``codec='ppm'`` or
    ``'bmp'``: payload is a VALID image in that format whose pixels are
    ``media_pixels(doc_id, *media_dims(doc_id))`` — the real-decode test
    corpus (all rows modality ``image``). ``codec='wav'``: payload is a
    VALID PCM 16-bit mono WAV whose samples are ``media_samples(doc_id,
    n)`` (all rows modality ``audio``; meta width carries n_samples,
    meta height the sample rate)."""
    if codec is not None:
        if codec not in ("ppm", "bmp", "wav"):
            raise ValueError(
                f"codec must be 'ppm', 'bmp' or 'wav', got {codec!r}"
            )

        def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            import pandas as pd

            enc = encode_ppm if codec == "ppm" else encode_bmp
            for pdf in batches:
                rows = []
                for d in pdf["doc_id"]:
                    d = int(d)
                    if codec == "wav":
                        n, rate = media_audio_params(d)
                        rows.append(
                            (d, encode_wav(media_samples(d, n), rate),
                             "audio", n, rate)
                        )
                        continue
                    w, h = media_dims(d)
                    rows.append((d, enc(media_pixels(d, w, h)), "image",
                                 w, h))
                yield pd.DataFrame(
                    rows,
                    columns=["doc_id", "payload", "modality", "width",
                             "height"],
                )

        flat = docs.select("doc_id").mapInPandas(
            gen,
            "doc_id bigint, payload binary, modality string, "
            "width int, height int",
        )
        return flat.select(
            "doc_id",
            "payload",
            F.struct("modality", "width", "height").alias("meta"),
        )
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
            # decode order: the pure-numpy codecs first (real, no deps —
            # decode_image/decode_wav raise ValueError on other
            # containers), then a runtime PIL probe for JPEG/PNG-style
            # image payloads; non-WAV audio and all video still need
            # libav — not probed, no decoder here would use it yet
            def _decode(pdf: "pd.DataFrame") -> "pd.DataFrame":
                rows = []
                for _, r in pdf.iterrows():
                    payload = bytes(r["payload"])
                    if r["modality"] == "audio":
                        # real audio decode: WAV PCM in pure numpy; any
                        # other audio container still needs libav
                        try:
                            samples, rate = decode_wav(payload)
                        except ValueError as e:
                            raise NotImplementedError(
                                "real decode of this audio container "
                                f"requires libav ({e}); only WAV PCM "
                                "16-bit mono decodes in-env; run with "
                                "fake=True for byte-level features"
                            ) from e
                        n = len(samples)
                        q = max(n // 4, 1)
                        # feat: 4 segment RMS values; checksum: exact
                        # integer sample sum — the oracle's anchor
                        feat = np.array(
                            [
                                np.sqrt(
                                    np.mean(
                                        samples[i * q:(i + 1) * q]
                                        .astype(np.float64) ** 2
                                    )
                                )
                                if len(samples[i * q:(i + 1) * q])
                                else 0.0
                                for i in range(4)
                            ],
                            dtype=np.float32,
                        )
                        rows.append(
                            (
                                r["doc_id"],
                                "audio",
                                len(payload),
                                int(samples.astype(np.int64).sum()),
                                n,
                                rate,
                                feat,
                            )
                        )
                        continue
                    if r["modality"] != "image":
                        raise NotImplementedError(
                            f"real {r['modality']} decode requires libav"
                        )
                    try:
                        px = decode_image(payload)
                        w, h = px.shape[1], px.shape[0]
                    except ValueError:
                        try:
                            from PIL import Image
                        except ImportError as e:
                            raise NotImplementedError(
                                "real decode of this container requires "
                                f"PIL/libav (PIL import failed: {e}); only "
                                "PPM/PGM/BMP decode in-env; run with "
                                "fake=True for byte-level features"
                            ) from e
                        import io

                        img = Image.open(io.BytesIO(payload))
                        px = np.asarray(img.convert("RGB"))
                        w, h = img.width, img.height
                    # checksum: exact integer sum over raw channel values;
                    # feat: 4 horizontal-band means of the channel-mean
                    # grayscale — both reproducible by the generator
                    gray = (
                        px.astype(np.float32)
                        if px.ndim == 2
                        else px.mean(axis=2, dtype=np.float64).astype(
                            np.float32
                        )
                    )
                    q = max(h // 4, 1)
                    feat = np.array(
                        [gray[i * q:(i + 1) * q].mean() for i in range(4)],
                        dtype=np.float32,
                    )
                    rows.append(
                        (
                            r["doc_id"],
                            r["modality"],
                            len(payload),
                            int(px.astype(np.int64).sum()),
                            w,
                            h,
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
    would receive). Pixel kernel: ``fake=True`` is a deterministic byte
    subsample; ``fake=False`` really resizes PPM/PGM/BMP payloads
    (pure-numpy decode → nearest-neighbor sample → re-encode as PPM/PGM)
    and probes for PIL for other containers like the decode path. Images
    already within bounds pass through unchanged.

    Plan shape: one mapInPandas over (payload, meta) batches — no
    shuffle; at corpus scale this pipelines with the scan exactly like
    extract_features.
    """

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

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
                        raw = bytes(r["payload"])
                        try:
                            px = decode_image(raw)
                        except ValueError:
                            try:
                                from PIL import Image
                            except ImportError as e:
                                raise NotImplementedError(
                                    "real resize of this container requires "
                                    f"PIL (import failed: {e}); only "
                                    "PPM/PGM/BMP resize in-env; run with "
                                    "fake=True for the byte-subsample stub"
                                ) from e
                            import io

                            img = Image.open(io.BytesIO(raw))
                            img.thumbnail((max_dim, max_dim))
                            buf = io.BytesIO()
                            img.save(buf, format=img.format or "PNG")
                            payload = buf.getvalue()
                            px = None
                        if px is not None:
                            # nearest-neighbor sample on the decode dims
                            # (the meta dims may disagree with the
                            # container's own header — trust the pixels),
                            # re-encoded as PPM/PGM (the normalization a
                            # curation pipeline wants anyway)
                            sh, sw = px.shape[0], px.shape[1]
                            sc = max_dim / max(sw, sh)
                            dw = max(int(sw * sc), 1) if sc < 1 else sw
                            dh = max(int(sh * sc), 1) if sc < 1 else sh
                            ys = (
                                np.arange(dh) * (sh / dh)
                            ).astype(np.int64)
                            xs = (
                                np.arange(dw) * (sw / dw)
                            ).astype(np.int64)
                            payload = encode_ppm(px[ys][:, xs])
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
