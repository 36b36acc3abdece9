"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
struct of typed metadata. The decode / feature-extract step is the ONLY
Python in this package's hot path and runs as an Arrow-batched
``mapInPandas`` so batches (not rows) cross the JVM↔Python boundary.

Decoding comes in two tiers:

- REAL (``kernel/media.py``, pure stdlib+numpy): PNG decode/encode (zlib
  inflate + scanline defilter), 24-bit BMP, PCM-16 WAV, animated GIF
  (LZW), and baseline JPEG (gray + YCbCr 4:4:4/4:2:0 color;
  canonical-Huffman entropy decode + IDCT). ``extract_media_meta_real``, ``resize_images`` with
  ``codec='real'``, and ``audio_features`` run these through the same
  Arrow-batched ``mapInPandas`` stages.
- FAKE (deterministic, payload-derived): ``extract_media_meta`` keeps the
  original byte-arithmetic stand-in so the driver-graded q32 stays
  engine-reproducible in SQL, and the video frame split remains a marked
  stub (no container/entropy codec exists here — that is the honest
  boundary, now limited to inter-frame video; successive-approximation
  JPEG refinement decodes for real as of round 5).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType,
                               LongType, StringType, StructField,
                               StructType)

MEDIA_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("byte_len", LongType()),
    StructField("media_format", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("n_frames", LongType()),
])


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload column (here: utf-8 bytes of the text
    standing in for image/audio bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_media_real(payload: bytes) -> dict:
    """Real single-payload decode: container-header metadata via the
    pure-Python kernel (PNG/JPEG/GIF/BMP/WAV), falling back to PIL when it
    is importable for formats the kernel doesn't parse. Raises
    NotImplementedError only for genuinely unparseable payloads in a
    codec-less environment."""
    from vulnerablecode_spark.kernel import media as _media

    meta = _media.parse_media_header(payload)
    if meta["media_format"] != "bin":
        return meta
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "payload is not a PNG/JPEG/GIF/BMP/WAV and no codec library "
            "is available; use extract_media_meta (deterministic fake) "
            "for opaque payloads"
        ) from exc
    img = Image.open(io.BytesIO(payload))  # pragma: no cover - env-dependent
    return {"media_format": (img.format or "img").lower(),
            "width": img.width, "height": img.height,
            "n_frames": getattr(img, "n_frames", 1)}


REAL_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("byte_len", LongType()),
    StructField("media_format", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("n_frames", LongType()),
    StructField("sample_rate", LongType()),
    StructField("n_channels", LongType()),
    StructField("bit_depth", LongType()),
    StructField("n_samples", LongType()),
])


def extract_media_meta_real(df: DataFrame, id_col: str = "doc_id",
                            payload_col: str = "payload",
                            spread_input: bool = True) -> DataFrame:
    """REAL mapInPandas decode stage: container headers → typed metadata.

    Parses actual PNG/JPEG/GIF/BMP/WAV headers (kernel/media.py) per Arrow
    batch; unrecognized payloads come back as ``media_format='bin'`` with
    null dimensions, so a mixed 100 TB binary column needs no schema split
    first. The closure imports the kernel module on workers —
    ``ensure_shipped`` makes that location-independent.
    """
    from vulnerablecode_spark import ensure_shipped

    ensure_shipped(df.sparkSession)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        from vulnerablecode_spark.kernel import media as _media

        cols = ("media_format", "width", "height", "n_frames",
                "sample_rate", "n_channels", "bit_depth", "n_samples")
        for pdf in batches:
            # NULL payloads read as empty bytes → media_format 'bin',
            # byte_len 0 — the stage stays total over dirty columns
            payloads = [bytes(b) if b is not None else b""
                        for b in pdf[payload_col]]
            metas = [_media.parse_media_header(b) for b in payloads]
            out = {"doc_id": pdf[id_col].astype("int64"),
                   "byte_len": _pd.Series([len(b) for b in payloads],
                                          dtype="int64")}
            for c in cols:
                out[c] = _pd.Series([m[c] for m in metas])
            yield _pd.DataFrame(out)

    base = df.select(F.col(id_col), F.col(payload_col))
    if spread_input:
        from vulnerablecode_spark.llm.dedup import spread

        base = spread(base)
    return base.mapInPandas(decode, REAL_META_SCHEMA)


def extract_media_meta(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload",
                       spread_input: bool = True) -> DataFrame:
    """mapInPandas decode stage: (id, payload) → typed media metadata.

    Arrow batches flow in as pandas DataFrames; at 100 TB this runs one
    Python worker per core with zero driver involvement. Swap the fake
    decode below for ``decode_media_real`` when codecs exist.

    The closure is deliberately self-contained (no references to this
    module's globals) so cloudpickle ships it BY VALUE — Python workers
    don't need the package on their import path.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd  # worker-side import only

        def fake_meta(byte_len: int) -> tuple[str, int, int, int]:
            # deterministic stand-in for a real media decoder
            fmt = ("img", "audio", "video")[byte_len % 3]
            return (fmt, byte_len % 640 + 16, (byte_len * 7) % 480 + 16,
                    byte_len % 16 + 1)

        for pdf in batches:
            byte_len = pdf[payload_col].map(
                lambda b: len(b) if b is not None else 0).astype("int64")
            meta = byte_len.map(fake_meta)
            yield _pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "byte_len": byte_len,
                "media_format": meta.map(lambda m: m[0]),
                "width": meta.map(lambda m: m[1]).astype("int64"),
                "height": meta.map(lambda m: m[2]).astype("int64"),
                "n_frames": meta.map(lambda m: m[3]).astype("int64"),
            })

    base = df.select(F.col(id_col), F.col(payload_col))
    if spread_input:
        # single-file inputs arrive as one partition — byte-sized spread()
        # (not a blanket repartition-to-all-cores: a 600 KB corpus gets 3
        # decode tasks, not 32 worker dispatches) so Python workers each
        # decode a full Arrow batch stream. Pass ``spread_input=False``
        # when the payload frame is already a partitioned stored column.
        from vulnerablecode_spark.llm.dedup import spread

        base = spread(base)
    return base.mapInPandas(decode, MEDIA_META_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("payload", BinaryType()),
])

FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("frame_payload", BinaryType()),
])


def resize_images(df: DataFrame, width: int = 224, height: int = 224,
                  id_col: str = "doc_id", payload_col: str = "payload",
                  codec: str = "fake",
                  spread_input: bool = True) -> DataFrame:
    """Resize stage: (id, payload) → (id, width, height, payload').

    ``codec='real'`` does an actual decode → nearest-neighbor resample →
    PNG re-encode for the formats the pure-Python kernel decodes (PNG,
    24-bit BMP); payloads it cannot decode are dropped from the output
    (the standard training-pipeline policy for corrupt media rows).
    ``codec='fake'`` keeps the deterministic byte-cycling stand-in for
    opaque payloads, exercising the identical Spark contract — Arrow
    batches in, binary column out, one Python worker per core.
    """
    w, h = int(width), int(height)
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec mode: {codec!r}")
    real = codec == "real"
    if real:
        from vulnerablecode_spark import ensure_shipped

        ensure_shipped(df.sparkSession)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        if real:
            from vulnerablecode_spark.kernel import media as _media

        target = w * h

        def fake_resample(b: bytes) -> bytes:
            if not b:
                return bytes(target)
            reps = target // len(b) + 1
            return (b * reps)[:target]

        for pdf in batches:
            if real:
                ids, payloads = [], []
                for doc_id, b in zip(pdf[id_col], pdf[payload_col]):
                    try:
                        px = _media.decode_image(bytes(b or b""))
                    except _media.MediaError:
                        continue  # undecodable media row: drop
                    resized = _media.resize_nearest(px, w, h)
                    ids.append(int(doc_id))
                    payloads.append(_media.encode_png(resized))
                yield _pd.DataFrame({
                    "doc_id": _pd.Series(ids, dtype="int64"),
                    "width": _pd.Series([w] * len(ids), dtype="int64"),
                    "height": _pd.Series([h] * len(ids), dtype="int64"),
                    "payload": payloads,
                })
            else:
                yield _pd.DataFrame({
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": _pd.Series([w] * len(pdf), dtype="int64"),
                    "height": _pd.Series([h] * len(pdf), dtype="int64"),
                    "payload": pdf[payload_col].map(fake_resample),
                })

    base = df.select(F.col(id_col), F.col(payload_col))
    if spread_input:
        from vulnerablecode_spark.llm.dedup import spread

        base = spread(base)
    return base.mapInPandas(resize, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("sample_rate", LongType()),
    StructField("n_channels", LongType()),
    StructField("n_samples", LongType()),
    StructField("duration_ms", LongType()),
    StructField("rms", DoubleType()),
    StructField("zero_crossings", LongType()),
])


def audio_features(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "payload",
                   spread_input: bool = True) -> DataFrame:
    """REAL audio feature extraction over PCM-16 WAV payloads.

    Decodes RIFF/WAVE containers (kernel/media.py) and computes per-clip
    RMS energy and zero-crossing count vectorized in numpy — the standard
    cheap features a training pipeline filters silence/noise clips with.
    Non-WAV payloads are dropped (corrupt-media policy, as in
    ``resize_images(codec='real')``).
    """
    from vulnerablecode_spark import ensure_shipped

    ensure_shipped(df.sparkSession)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        from vulnerablecode_spark.kernel import media as _media

        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    samples, rate = _media.decode_wav(bytes(b or b""))
                except _media.MediaError:
                    continue
                mono = samples.astype(_np.float64).mean(axis=1)
                n = samples.shape[0]
                rms = float(_np.sqrt(_np.mean(mono * mono))) if n else 0.0
                zc = int(_np.count_nonzero(_np.diff(_np.signbit(mono)))) \
                    if n > 1 else 0
                rows.append((int(doc_id), rate, samples.shape[1], n,
                             n * 1000 // rate, round(rms, 6), zc))
            yield _pd.DataFrame(rows, columns=[
                "doc_id", "sample_rate", "n_channels", "n_samples",
                "duration_ms", "rms", "zero_crossings"])

    base = df.select(F.col(id_col), F.col(payload_col))
    if spread_input:
        from vulnerablecode_spark.llm.dedup import spread

        base = spread(base)
    return base.mapInPandas(feats, AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 4, frame_bytes: int = 256,
                  id_col: str = "doc_id", payload_col: str = "payload",
                  codec: str = "fake",
                  spread_input: bool = True) -> DataFrame:
    """Frame-sampling stage: one video payload row → many frame rows.

    The row fan-out (an input batch yields a LARGER output batch) is the
    part that matters for the Spark contract — mapInPandas output is not
    1:1 with input, and downstream operators see ordinary rows.

    ``codec='real'`` does an actual video/animation decode
    (kernel/media.py): animated GIF via the LZW decoder, or Motion-JPEG
    AVI via the RIFF walk + baseline-JPEG decoder — and emits every
    ``every_n``-th frame re-encoded as PNG; payloads that decode as
    neither are dropped (corrupt-media policy). ``codec='fake'`` keeps
    the deterministic byte-window split for opaque payloads (a real
    inter-frame-video deployment swaps in av/ffmpeg at that point —
    H.26x-style entropy/motion decode is the one genuinely codec-bound
    boundary left).
    """
    k, fb = int(every_n), int(frame_bytes)
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec mode: {codec!r}")
    real = codec == "real"
    if real:
        from vulnerablecode_spark import ensure_shipped

        ensure_shipped(df.sparkSession)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        if real:
            from vulnerablecode_spark.kernel import media as _media

        def frames(b: bytes):
            if real:
                try:
                    if _media.sniff_format(b) == "avi":
                        # dispatches MJPG and inter-frame RLE8 streams
                        decoded, _fps = _media.decode_avi(b)
                    else:
                        decoded = _media.decode_gif(b)
                except _media.MediaError:
                    return  # not a decodable video: drop the row
                for i in range(0, decoded.shape[0], k):
                    yield i, _media.encode_png(decoded[i])
                return
            n_frames = max(len(b) // fb, 1)
            for i in range(0, n_frames, k):
                yield i, b[i * fb:(i + 1) * fb]

        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[payload_col]):
                for i, fr in frames(b):
                    ids.append(int(doc_id)); idxs.append(i)
                    payloads.append(fr)
            yield _pd.DataFrame({
                "doc_id": _pd.Series(ids, dtype="int64"),
                "frame_idx": _pd.Series(idxs, dtype="int64"),
                "frame_payload": payloads,
            })

    base = df.select(F.col(id_col), F.col(payload_col))
    if spread_input:
        from vulnerablecode_spark.llm.dedup import spread

        base = spread(base)
    return base.mapInPandas(sample, FRAME_SCHEMA)


def byte_histogram_features(df: DataFrame, bins: int = 16,
                            id_col: str = "doc_id",
                            payload_col: str = "payload",
                            spread_input: bool = True) -> DataFrame:
    """REAL (no stub) feature extraction: normalized ``bins``-bucket byte
    histogram per payload as ``array<double>`` — a codec-free content
    embedding usable by the cosine/ANN operators in llm.similarity.
    Vectorized end-to-end: numpy ``frombuffer`` + ``bincount`` per Arrow
    batch, no per-byte Python. Closure self-contained (pickled by value).
    """
    nb = int(bins)
    if not 1 <= nb <= 256:
        raise ValueError(f"byte_histogram_features: bins must be 1..256, "
                         f"got {nb}")
    out_schema = StructType([
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ])

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def one(b: bytes):
            if not b:
                return [0.0] * nb
            # value*nb//256 maps 0..255 onto exactly nb buckets for ANY
            # nb (a power-of-two shift produced 2^ceil(log2 nb) buckets
            # — ragged feature vectors for e.g. nb=10); identical to the
            # old shift for power-of-two nb
            arr = (_np.frombuffer(b, dtype=_np.uint8)
                   .astype(_np.int32) * nb) >> 8
            counts = _np.bincount(arr, minlength=nb).astype(_np.float64)
            return list(counts / counts.sum())

        for pdf in batches:
            yield _pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "features": pdf[payload_col].map(one),
            })

    base = df.select(F.col(id_col), F.col(payload_col))
    if spread_input:
        from vulnerablecode_spark.llm.dedup import spread

        base = spread(base)
    return base.mapInPandas(hist, out_schema)


SPECTRAL_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("sample_rate", LongType()),
    StructField("n_samples", LongType()),
    StructField("spectral_centroid_hz", DoubleType()),
    StructField("spectral_rolloff_hz", DoubleType()),
    StructField("spectral_bandwidth_hz", DoubleType()),
    StructField("spectral_flatness", DoubleType()),
])


def audio_spectral_features(df: DataFrame, id_col: str = "doc_id",
                            payload_col: str = "payload",
                            rolloff: float = 0.85,
                            spread_input: bool = True) -> DataFrame:
    """Frequency-domain audio features over PCM-16 WAV payloads.

    Per clip: rFFT magnitude spectrum of the mono mix, then the standard
    spectral descriptors a training pipeline filters tones/noise/speech
    with — centroid (magnitude-weighted mean frequency), ``rolloff``-
    quantile frequency, bandwidth (magnitude-weighted std around the
    centroid), and flatness (geometric/arithmetic mean ratio, ~1 for
    noise, ~0 for pure tones). Arrow-batched mapInPandas like every
    decode stage; non-WAV payloads are dropped (corrupt-media policy).
    Results are rounded to 3 decimals — FFT floats are not bit-portable
    across BLAS builds, so these are pytest-bounded operators, not
    oracle-hashed ones (the boundary SCALE.md documents).
    """
    from vulnerablecode_spark import ensure_shipped

    ensure_shipped(df.sparkSession)
    q = float(rolloff)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        from vulnerablecode_spark.kernel import media as _media

        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    samples, rate = _media.decode_wav(bytes(b or b""))
                except _media.MediaError:
                    continue
                mono = samples.astype(_np.float64).mean(axis=1)
                n = mono.shape[0]
                if n < 2:
                    continue
                mag = _np.abs(_np.fft.rfft(mono))
                freqs = _np.fft.rfftfreq(n, d=1.0 / rate)
                total = float(mag.sum())
                if total <= 0.0:
                    centroid = roll = bw = 0.0
                    flat = 1.0
                else:
                    centroid = float((freqs * mag).sum() / total)
                    cum = _np.cumsum(mag)
                    roll = float(freqs[_np.searchsorted(
                        cum, q * total, side="left")])
                    bw = float(_np.sqrt(
                        ((freqs - centroid) ** 2 * mag).sum() / total))
                    power = mag * mag
                    gm = float(_np.exp(_np.mean(_np.log(power + 1e-12))))
                    am = float(_np.mean(power) + 1e-12)
                    flat = min(gm / am, 1.0)
                rows.append((int(doc_id), rate, n, round(centroid, 3),
                             round(roll, 3), round(bw, 3), round(flat, 6)))
            yield _pd.DataFrame(rows, columns=[
                "doc_id", "sample_rate", "n_samples", "spectral_centroid_hz",
                "spectral_rolloff_hz", "spectral_bandwidth_hz",
                "spectral_flatness"])

    base = df.select(F.col(id_col), F.col(payload_col))
    if spread_input:
        from vulnerablecode_spark.llm.dedup import spread

        base = spread(base)
    return base.mapInPandas(feats, SPECTRAL_FEATURES_SCHEMA)


def byte_entropy(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload",
                 bins: int = 16) -> DataFrame:
    """Quantized Shannon entropy of each payload's byte-bin distribution
    — the codec-free compressibility proxy (low entropy = repetitive/
    padded payloads, high = compressed/encrypted media), the scalar
    companion to :func:`byte_histogram_features`. REAL (no stub):
    numpy ``frombuffer`` + ``bincount`` per Arrow batch.

    Determinism by CONSTRUCTION, not by rounding luck: the statistic is
    DEFINED in integer micro-nats — with bin counts c and total t,
    ``h_e6 = ⌊ln(t)·1e6 + 0.5⌋ − (Σ_c ⌊c·ln(c)·1e6 + 0.5⌋) div t``
    (algebraically ln t − Σ(c/t)ln c, each term quantized BEFORE the
    order-free integer sum — a float Σ of ln terms would be summation-
    order-dependent). Empty payloads carry no distribution and are
    excluded. Output: (id, t_bytes, h_e6).
    """
    nb = int(bins)
    # the output id column carries the CALLER's name — hardcoding
    # 'doc_id' here silently renamed any other id column (ADVICE r11)
    out_schema = StructType([
        StructField(id_col, LongType()),
        StructField("t_bytes", LongType()),
        StructField("h_e6", LongType()),
    ])

    def ent(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math as _math

        import numpy as _np
        import pandas as _pd

        def one(b: bytes):
            if not b:
                return None
            arr = (_np.frombuffer(b, dtype=_np.uint8)
                   .astype(_np.int32) * nb) >> 8
            counts = _np.bincount(arr, minlength=nb)
            t = int(counts.sum())
            bsum = sum(int(_math.floor(c * _math.log(c) * 1e6 + 0.5))
                       for c in counts.tolist() if c > 0)
            a = int(_math.floor(_math.log(t) * 1e6 + 0.5))
            return (t, a - bsum // t)

        for pdf in batches:
            rows = [(int(i), r) for i, r in
                    zip(pdf.iloc[:, 0], pdf.iloc[:, 1].map(one))
                    if r is not None]
            yield _pd.DataFrame({
                id_col: [i for i, _ in rows],
                "t_bytes": [r[0] for _, r in rows],
                "h_e6": [r[1] for _, r in rows],
            }, dtype="int64")

    return df.select(F.col(id_col), F.col(payload_col)) \
             .mapInPandas(ent, out_schema)


def byte_tv_drift(hist: DataFrame, *, group_col: str = "source",
                  bin_col: str = "bin", count_col: str = "c") -> DataFrame:
    """Pairwise total-variation distance between groups' byte-bin
    distributions — the multimodal distribution-shift check (a source
    whose byte mix drifts from the corpus norm changed encoding, codec,
    or got polluted; the byte-level companion to the KS length drift,
    q153). TV is the exact-integer choice:
    ``TV(P,Q) = ½ Σ_i |p_i − q_i|
              = Σ_i |c_i·T_q − d_i·T_p| / (2·T_p·T_q)``
    — every operand an exact BIGINT, one integer division at the end
    (numerator non-negative, so trunc ≡ floor). Output: (src_a, src_b,
    t_a, t_b, tv_bp) for src_a < src_b.

    Input is a (group, bin, count) histogram frame — the
    :func:`byte_histogram_features` counts rolled to group grain, or
    any stored histogram artifact. Scale: the pair algebra runs on
    O(groups × bins) rows, broadcast joins only — the same
    sketch-not-corpus discipline as the KMV matrices (q162/q168).
    Headroom: every product runs in DECIMAL(38,0) (oracle side:
    HUGEINT) — the per-term c·T products AND the closing
    Σ·10⁴ div (2·t_a·t_b) step, whose numerator reaches 2·t_a·t_b·10⁴
    (that bound wrapped int64 near t ≈ 7e8 bytes per group, four
    orders below the old comment's ~3e9 which only covered c·T). The
    binding constraint is now 2·t_a·t_b·10⁴ < 10³⁸ → ~10¹⁶ bytes per
    group, past any 100 TB corpus.
    """
    g = (hist.groupBy(F.col(group_col).alias("g"), F.col(bin_col)
                      .alias("bin"))
         .agg(F.sum(count_col).cast("bigint").alias("c")))
    tot = g.groupBy("g").agg(F.sum("c").cast("bigint").alias("t"))
    bins = g.select("bin").distinct()
    # dense pair × bin grid: a bin absent on one side is ZERO MASS
    # there, not a dropped term — an equi-join on the bin key would
    # silently under-count TV whenever a bin is one-sided
    pairs = (tot.select(F.col("g").alias("src_a"), F.col("t").alias("t_a"))
             .join(F.broadcast(tot.select(F.col("g").alias("src_b"),
                                          F.col("t").alias("t_b"))),
                   F.col("src_a") < F.col("src_b")))
    grid = pairs.join(F.broadcast(bins))
    ca = g.select(F.col("g").alias("src_a"), "bin", F.col("c").alias("c_a"))
    cb = g.select(F.col("g").alias("src_b"), "bin", F.col("c").alias("c_b"))
    dense = (grid.join(F.broadcast(ca), ["src_a", "bin"], "left")
             .join(F.broadcast(cb), ["src_b", "bin"], "left")
             .fillna(0, subset=["c_a", "c_b"]))
    num = F.abs(F.col("c_a").cast("decimal(38,0)") * F.col("t_b")
                - F.col("c_b").cast("decimal(38,0)") * F.col("t_a"))
    return (dense.groupBy("src_a", "src_b", "t_a", "t_b")
            .agg(F.sum(num).alias("_num"))
            .selectExpr("src_a", "src_b", "t_a", "t_b",
                        "CAST(_num * 10000 div (CAST(2 AS DECIMAL(38,0))"
                        " * t_a * t_b) AS BIGINT) AS tv_bp"))
