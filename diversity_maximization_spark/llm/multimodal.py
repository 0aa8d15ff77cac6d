"""Multimodal column processing (SURVEY.md §2.2-L; prompt mandate).

Images/audio/video are opaque ``binary`` columns with typed metadata.
PNG and WAV are REAL end-to-end with stdlib-only codecs — the
payloads are genuine files (PNG: zlib-deflated RGB8 scanlines with
CRC-checked chunks; WAV: 16-bit PCM via the ``wave`` module), decode
parses them back, resize produces an actual nearest-neighbor
thumbnail re-encoded as PNG. Video is REAL over the engine-declared
MPNG container (length-prefixed real PNG frames; mpng_encode/decode
with magic + length validation): container parse, stride frame
sampling, first-frame decode, and per-frame feature descriptors all
operate on genuine bytes. mp4 itself stays unsupported — no H.264
codec exists in the stdlib, and faking one would be dishonest; a
real deployment plugs its decoder into the same mapInPandas seams.

Scale shape: every step is Arrow-batched ``mapInPandas`` running next
to the data — one pass, no shuffle between synth/decode/resize, no
driver involvement; 100 TB of media decodes with whatever parallelism
the scan has.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load

IMG_W, IMG_H = 16, 16
WAV_RATE = 8000
WAV_SAMPLES = 400


# --- real stdlib codecs ----------------------------------------------------


def png_encode(rgb: bytes, width: int, height: int) -> bytes:
    """Minimal real PNG writer: 8-bit RGB, filter 0, one IDAT."""
    assert len(rgb) == width * height * 3

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(
        b"\x00" + rgb[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> tuple[int, int, bytes]:
    """Minimal real PNG reader for the subset png_encode writes
    (8-bit RGB, filter 0). Returns (width, height, rgb bytes)."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, width, height, idat = 8, 0, 0, b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        crc = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])[0]
        assert crc == zlib.crc32(tag + body) & 0xFFFFFFFF, "PNG CRC mismatch"
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert (depth, ctype) == (8, 2), "unsupported PNG subset"
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = width * 3
    rows = []
    for y in range(height):
        line = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        assert line[0] == 0, "unsupported PNG filter"
        rows.append(line[1:])
    return width, height, b"".join(rows)


def wav_encode(samples: list[int], rate: int = WAV_RATE) -> bytes:
    """Real WAV writer: 16-bit PCM mono via the stdlib wave module."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[int, int, list[int]]:
    """(n_frames, rate, samples) via the stdlib wave module."""
    with wave.open(io.BytesIO(data), "rb") as w:
        n, rate = w.getnframes(), w.getframerate()
        samples = list(struct.unpack(f"<{n}h", w.readframes(n)))
    return n, rate, samples


MPNG_MAGIC = b"MPNG"


def mpng_encode(frames: list[bytes]) -> bytes:
    """REAL container writer: magic + frame count + length-prefixed
    PNG frames (an MJPEG-style concatenation container, PNG-based so
    every frame is decodable by the stdlib codec above). mp4 itself
    stays unsupported — no stdlib H.264 — so the engine declares this
    container as its video format instead of faking mp4."""
    out = [MPNG_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def mpng_decode(data: bytes) -> list[bytes]:
    """Parse an MPNG container back to its PNG frame payloads,
    validating magic, counts, and exact length."""
    if data[:4] != MPNG_MAGIC:
        raise ValueError("not an MPNG payload")
    (n,) = struct.unpack_from("<I", data, 4)
    off = 8
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        frames.append(data[off : off + ln])
        off += ln
    if off != len(data):
        raise ValueError("trailing bytes in MPNG payload")
    return frames


def _synth_payload(doc_id: int, text: str, media_type: str) -> bytes:
    """Deterministic REAL media file from the doc: PNG, WAV, or an
    MPNG video container of N_TOTAL_FRAMES real PNG frames.

    The byte stream is derived by HEX-STRING sha256 chaining
    (sha256 over "seedhex:i" text, not raw digest bytes) so a SQL
    engine with a VARCHAR-only sha256 (DuckDB) can regenerate the
    identical bytes — that is what lets multimodal_decode_census
    hash-check the whole synth -> encode -> decode pipeline against
    an arithmetic replay that never touches a codec."""
    seed_hex = hashlib.sha256(f"{doc_id}:{text}".encode()).hexdigest()
    stream = b"".join(
        hashlib.sha256(f"{seed_hex}:{i}".encode()).digest() for i in range(26)
    )  # 832 bytes >= max(IMG_W*IMG_H*3 = 768, WAV_SAMPLES*2 = 800)
    if media_type == "image/png":
        return png_encode(stream[: IMG_W * IMG_H * 3], IMG_W, IMG_H)
    if media_type == "audio/wav":
        vals = struct.unpack(f"<{WAV_SAMPLES}h", stream[: WAV_SAMPLES * 2])
        return wav_encode(list(vals))
    # video/mpng: N_TOTAL_FRAMES real PNG frames in the MPNG container
    frames = []
    for i in range(N_TOTAL_FRAMES):
        fstream = b"".join(
            hashlib.sha256(f"{seed_hex}:frame{i}:{j}".encode()).digest()
            for j in range(24)
        )  # 768 bytes = IMG_W*IMG_H*3
        frames.append(png_encode(fstream[: IMG_W * IMG_H * 3], IMG_W, IMG_H))
    return mpng_encode(frames)


def with_media(d: DataFrame) -> DataFrame:
    """Attach a typed media column: REAL PNG/WAV/MPNG payloads
    (stdlib encoders) — synthesized executor-side in Arrow batches,
    deterministic per doc."""

    def gen(batches):
        for pdf in batches:
            mts, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                mt = ("image/png", "audio/wav", "video/mpng")[doc_id % 3]
                mts.append(mt)
                payloads.append(_synth_payload(doc_id, text, mt))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_type": mts, "payload": payloads}
            )

    from ..plans.distance_join import ensure_parallelism

    return ensure_parallelism(d.select("doc_id", "text")).mapInPandas(
        gen, "doc_id bigint, media_type string, payload binary"
    )


# backward-compat alias (older tests/docs referenced the fake name)
with_fake_media = with_media


def _decode_one(media_type: str, payload: bytes) -> tuple[int, int, float]:
    """(width, height, mean_luma) for images; (n_frames, rate,
    mean |amplitude| in [0,1]) for audio; (n_frames, frame width,
    first-frame mean luma) for MPNG video — all REAL decodes."""
    if media_type == "image/png":
        w, h, rgb = png_decode(payload)
        luma = [
            0.299 * rgb[i] + 0.587 * rgb[i + 1] + 0.114 * rgb[i + 2]
            for i in range(0, len(rgb), 3)
        ]
        return w, h, round(sum(luma) / len(luma) / 255.0, 6)
    if media_type == "audio/wav":
        n, rate, samples = wav_decode(payload)
        mean_abs = sum(abs(s) for s in samples) / len(samples) / 32768.0
        return n, rate, round(mean_abs, 6)
    # video/mpng: REAL container parse + first-frame PNG decode —
    # (n_frames, frame width, first-frame mean luma)
    frames = mpng_decode(payload)
    w, _h, luma = _decode_one("image/png", frames[0])
    return len(frames), w, luma


def _decode_batches(batches):
    for pdf in batches:
        feats = [
            _decode_one(mt, p) for mt, p in zip(pdf["media_type"], pdf["payload"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len),
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "mean_luma": [f[2] for f in feats],
            }
        )


@query("multimodal_decode")  # rows-only: binary payloads, not SQL-expressible
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column -> decoded feature columns via Arrow-batched
    mapInPandas (the 100 TB pattern: decode runs next to the data,
    one pass, no driver involvement). PNG/WAV decode is REAL (stdlib
    zlib/wave); video is a REAL MPNG container parse + first-frame
    PNG decode."""
    d = load(spark, sf_dir, "documents")
    media = with_media(d)
    return media.mapInPandas(
        _decode_batches,
        "doc_id bigint, media_type string, n_bytes int, width int, height int, "
        "mean_luma double",
    )


def _duck_stream_bytes(hashes_expr: str) -> str:
    """DuckDB: flatten a list of sha256 hex strings into the byte list
    they encode (2 hex nibbles per byte, 32 bytes per hash) — the
    exact bytes hashlib .digest() concatenation produces."""
    nib = "strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1"
    b0 = nib.format(pos="2 * o + 1")
    b1 = nib.format(pos="2 * o + 2")
    return (
        f"flatten(list_transform({hashes_expr}, "
        f"h -> list_transform(generate_series(0, 31), "
        f"o -> ({b0}) * 16 + ({b1}))))"
    )


def _decode_census_oracle() -> str:
    """Arithmetic replay of multimodal_decode's (width, height,
    mean_luma) WITHOUT any codec: regenerate the synth byte stream by
    the same hex-string sha256 chain, then compute what the PNG/WAV/
    MPNG decode MUST report if every encoder/decoder round-trips
    bit-exactly. Luma/amplitude sums are the same left folds in the
    same term order; round_even mirrors Python round (half-even)."""
    img_hashes = (
        "list_transform(generate_series(0, 25), "
        "i -> sha256(seed || ':' || CAST(i AS VARCHAR)))"
    )
    vid_hashes = (
        "list_transform(generate_series(0, 23), "
        "j -> sha256(seed || ':frame0:' || CAST(j AS VARCHAR)))"
    )
    luma = (
        "round_even(list_sum(list_transform(generate_series(0, 255), "
        "p -> CAST(0.299 AS DOUBLE) * bs[3 * p + 1] "
        "+ CAST(0.587 AS DOUBLE) * bs[3 * p + 2] "
        "+ CAST(0.114 AS DOUBLE) * bs[3 * p + 3])) / 256 / 255.0, 6)"
    )
    amp = (
        "round_even(CAST(list_sum(list_transform(generate_series(0, 399), "
        "k -> abs(CASE WHEN bs[2 * k + 1] + 256 * bs[2 * k + 2] >= 32768 "
        "THEN bs[2 * k + 1] + 256 * bs[2 * k + 2] - 65536 "
        "ELSE bs[2 * k + 1] + 256 * bs[2 * k + 2] END))) AS DOUBLE) "
        "/ 400 / 32768.0, 6)"
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id,
         ['image/png', 'audio/wav', 'video/mpng'][CAST(doc_id % 3 AS INT) + 1]
           AS media_type,
         sha256(CAST(doc_id AS VARCHAR) || ':' || text) AS seed
  FROM documents
), streams AS MATERIALIZED (
  SELECT doc_id, media_type,
         CASE WHEN media_type = 'video/mpng'
              THEN {_duck_stream_bytes(vid_hashes)}
              ELSE {_duck_stream_bytes(img_hashes)} END AS bs
  FROM base
)
SELECT doc_id, media_type,
       CAST(CASE media_type WHEN 'image/png' THEN {IMG_W}
            WHEN 'audio/wav' THEN {WAV_SAMPLES} ELSE 8 END AS INT) AS width,
       CAST(CASE media_type WHEN 'image/png' THEN {IMG_H}
            WHEN 'audio/wav' THEN {WAV_RATE} ELSE {IMG_W} END AS INT) AS height,
       CASE WHEN media_type = 'audio/wav' THEN {amp} ELSE {luma} END
         AS mean_luma
FROM streams
"""


@query("multimodal_decode_census", oracle=_decode_census_oracle())
def multimodal_decode_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked census of the multimodal pipeline — the SQL-
    verifiable projection of multimodal_decode (everything but
    n_bytes, whose DEFLATE-compressed length no second engine can
    predict). The engine runs the REAL pipeline: synth bytes ->
    stdlib PNG/WAV/MPNG encode -> container -> CRC-checked decode ->
    features. The oracle regenerates the synth bytes by the same
    hex-chained sha256 and computes the expected decode report with
    pure arithmetic — so any corruption anywhere in the codec round
    trip (filter bytes, chunk framing, PCM packing, frame order)
    lands as a hash mismatch on the affected doc. The N_TOTAL_FRAMES
    and geometry constants are replayed as literals; luma/amplitude
    means are identical left folds term by term."""
    d = load(spark, sf_dir, "documents")
    media = with_media(d)
    return media.mapInPandas(
        _decode_batches,
        "doc_id bigint, media_type string, n_bytes int, width int, "
        "height int, mean_luma double",
    ).select("doc_id", "media_type", "width", "height", "mean_luma")


TARGET_W, TARGET_H = 32, 32


def _resize_rgb(
    rgb: bytes, w: int, h: int, tw: int, th: int
) -> bytes:
    """Real nearest-neighbor resize of a raw RGB buffer."""
    out = bytearray(tw * th * 3)
    for ty in range(th):
        sy = ty * h // th
        for tx in range(tw):
            sx = tx * w // tw
            si, di = (sy * w + sx) * 3, (ty * tw + tx) * 3
            out[di : di + 3] = rgb[si : si + 3]
    return bytes(out)


@query("multimodal_resize")  # rows-only: binary payloads
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image rows -> REAL fixed-size thumbnails: decode the PNG,
    nearest-neighbor resample to 32x32, re-encode as PNG — all
    stdlib, all executor-side. The modality filter prunes before any
    decode work."""
    d = load(spark, sf_dir, "documents")
    media = with_media(d).filter(F.col("media_type") == "image/png")

    def gen(batches):
        for pdf in batches:
            thumbs = []
            for p in pdf["payload"]:
                w, h, rgb = png_decode(p)
                thumbs.append(
                    png_encode(
                        _resize_rgb(rgb, w, h, TARGET_W, TARGET_H),
                        TARGET_W,
                        TARGET_H,
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": TARGET_W,
                    "height": TARGET_H,
                    "thumb": thumbs,
                }
            )

    return media.mapInPandas(
        gen, "doc_id bigint, width int, height int, thumb binary"
    )


FEAT_DIM = 8


def _image_features(payload: bytes) -> list[float]:
    """Real 8-dim image descriptor: mean R/G/B, 4-bin luma histogram
    fractions, fill ratio — all in [0, 1]."""
    w, h, rgb = png_decode(payload)
    n = w * h
    rs = sum(rgb[0::3]) / n / 255.0
    gs = sum(rgb[1::3]) / n / 255.0
    bs = sum(rgb[2::3]) / n / 255.0
    hist = [0] * 4
    for i in range(0, len(rgb), 3):
        luma = 0.299 * rgb[i] + 0.587 * rgb[i + 1] + 0.114 * rgb[i + 2]
        hist[min(3, int(luma // 64))] += 1
    return [round(v, 6) for v in (rs, gs, bs, *[c / n for c in hist], 1.0)]


def _audio_features(payload: bytes) -> list[float]:
    """Real 8-dim audio descriptor: normalized RMS, mean |amp|, zero-
    crossing rate, peak, 4 coarse energy bands over time — in [0,1]."""
    n, _rate, s = wav_decode(payload)
    norm = [x / 32768.0 for x in s]
    rms = (sum(x * x for x in norm) / n) ** 0.5
    mean_abs = sum(abs(x) for x in norm) / n
    zcr = sum(
        1 for a, b in zip(norm, norm[1:]) if (a < 0) != (b < 0)
    ) / (n - 1)
    peak = max(abs(x) for x in norm)
    q = n // 4
    bands = [
        min(1.0, (sum(x * x for x in norm[i * q : (i + 1) * q]) / q) ** 0.5 * 2)
        for i in range(4)
    ]
    return [round(v, 6) for v in (rms, mean_abs, zcr, peak, *bands)]




def _duck_pyround6(expr: str) -> str:
    """DuckDB expression for Python's round(x, 6): printf '%.6f' is a
    correctly-rounded decimal conversion of the double's EXACT value
    (nearest, ties-to-even) — bit-identical to CPython's dtoa-based
    round. DuckDB's round_even(x, 6) instead scales by 1e6 in double
    arithmetic first, whose rounding error flips ~0.2% of uniformly
    placed boundary values (measured 47/20000 on S/65280 grids vs
    printf's 0/20000). Use THIS for any oracle that must replay a
    Python-side round exactly."""
    return f"CAST(printf('%.6f', {expr}) AS DOUBLE)"


def _duck_img_feat_list(bs: str) -> str:
    """DuckDB: the 8-dim image descriptor list from a 768-byte RGB
    list expr — the arithmetic twin of _image_features: exact integer
    channel sums with deterministic divisions, the float luma fold
    term-ordered like Python, floor-div binning, round-half-even."""
    ch = lambda off: (
        f"CAST(printf('%.6f', CAST(list_sum(list_transform(generate_series(0, 255), "
        f"p -> ({bs})[3 * p + {off}])) AS DOUBLE) / 256 / 255.0) AS DOUBLE)"
    )
    luma = (
        f"CAST(0.299 AS DOUBLE) * ({bs})[3 * p + 1] "
        f"+ CAST(0.587 AS DOUBLE) * ({bs})[3 * p + 2] "
        f"+ CAST(0.114 AS DOUBLE) * ({bs})[3 * p + 3]"
    )
    bins = (
        f"list_transform(generate_series(0, 255), "
        f"p -> least(3, CAST(floor(({luma}) / 64) AS INT)))"
    )
    hist = lambda c: (
        f"CAST(printf('%.6f', CAST(len(list_filter({bins}, b -> b = {c})) AS DOUBLE)"
        f" / 256) AS DOUBLE)"
    )
    return (
        f"[{ch(1)}, {ch(2)}, {ch(3)}, "
        f"{hist(0)}, {hist(1)}, {hist(2)}, {hist(3)}, "
        f"CAST(1.0 AS DOUBLE)]"
    )


def _features_oracle() -> str:
    """Arithmetic replay of multimodal_features for ALL THREE
    modalities from the regenerated synth bytes (no codec): image =
    _duck_img_feat_list over the 768 RGB bytes; audio = exact dyadic
    sums of int16 samples (squares/abs sums are exact doubles below
    2**53, so only the final /400 divisions and sqrts round — the
    identical IEEE steps Python takes); video = per-sampled-frame
    image features (already rounded, like _image_features returns)
    averaged in the explicit src 0,2,4,6 fold order via a pivot, so
    the 4-term float sum is association-identical to Python\'s."""
    img_hashes = (
        "list_transform(generate_series(0, 25), "
        "i -> sha256(seed || ':' || CAST(i AS VARCHAR)))"
    )
    s16 = (
        "CASE WHEN bs[2 * k + 1] + 256 * bs[2 * k + 2] >= 32768 "
        "THEN bs[2 * k + 1] + 256 * bs[2 * k + 2] - 65536 "
        "ELSE bs[2 * k + 1] + 256 * bs[2 * k + 2] END"
    )
    # exact integer aggregates over the 400 samples
    ssq = (
        f"CAST(list_sum(list_transform(generate_series(0, 399), "
        f"k -> ({s16}) * ({s16}))) AS BIGINT)"
    )
    sabs = (
        f"CAST(list_sum(list_transform(generate_series(0, 399), "
        f"k -> abs({s16}))) AS BIGINT)"
    )
    nzc = (
        f"CAST(len(list_filter(generate_series(0, 398), "
        f"k -> (({s16}) < 0) <> "
        f"((CASE WHEN bs[2 * k + 3] + 256 * bs[2 * k + 4] >= 32768 "
        f"THEN bs[2 * k + 3] + 256 * bs[2 * k + 4] - 65536 "
        f"ELSE bs[2 * k + 3] + 256 * bs[2 * k + 4] END) < 0))) AS BIGINT)"
    )
    peak = (
        f"CAST(list_max(list_transform(generate_series(0, 399), "
        f"k -> abs({s16}))) AS BIGINT)"
    )
    band = lambda i: (
        # min(1, 2*sqrt((sum_sq_band / 2^30) / 100)), band i = samples
        # [100 i, 100 i + 99]
        f"CAST(printf('%.6f', least(CAST(1.0 AS DOUBLE), "
        f"sqrt((CAST(list_sum(list_transform("
        f"generate_series({100 * i}, {100 * i + 99}), "
        f"k -> ({s16}) * ({s16}))) AS DOUBLE) / 1073741824) / 100) * 2)) AS DOUBLE)"
    )
    audio_feats = (
        f"[CAST(printf('%.6f', sqrt((CAST({ssq} AS DOUBLE) / 1073741824) / 400)) AS DOUBLE), "
        f"CAST(printf('%.6f', (CAST({sabs} AS DOUBLE) / 32768) / 400) AS DOUBLE), "
        f"CAST(printf('%.6f', CAST({nzc} AS DOUBLE) / 399) AS DOUBLE), "
        f"CAST(printf('%.6f', CAST({peak} AS DOUBLE) / 32768) AS DOUBLE), "
        f"{band(0)}, {band(1)}, {band(2)}, {band(3)}]"
    )
    frame_hashes = lambda src: (
        f"list_transform(generate_series(0, 23), "
        f"j -> sha256(seed || ':frame{src}:' || CAST(j AS VARCHAR)))"
    )
    vf = lambda src: (
        f"SELECT doc_id, {src} AS src, "
        f"{_duck_img_feat_list('bs')} AS f FROM (SELECT doc_id, "
        f"{_duck_stream_bytes(frame_hashes(src))} AS bs "
        f"FROM base WHERE mt = 'video/mpng')"
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id,
         ['image/png', 'audio/wav', 'video/mpng'][CAST(doc_id % 3 AS INT) + 1]
           AS mt,
         sha256(CAST(doc_id AS VARCHAR) || ':' || text) AS seed
  FROM documents
), img AS (
  SELECT doc_id, {_duck_img_feat_list('bs')} AS feature
  FROM (SELECT doc_id, {_duck_stream_bytes(img_hashes)} AS bs
        FROM base WHERE mt = 'image/png')
), aud AS (
  SELECT doc_id, {audio_feats} AS feature
  FROM (SELECT doc_id, {_duck_stream_bytes(img_hashes)} AS bs
        FROM base WHERE mt = 'audio/wav')
), vfr AS (
  {vf(0)} UNION ALL {vf(2)} UNION ALL {vf(4)} UNION ALL {vf(6)}
), vp AS (
  SELECT doc_id,
         MAX(CASE WHEN src = 0 THEN f END) AS f0,
         MAX(CASE WHEN src = 2 THEN f END) AS f2,
         MAX(CASE WHEN src = 4 THEN f END) AS f4,
         MAX(CASE WHEN src = 6 THEN f END) AS f6
  FROM vfr GROUP BY doc_id
), vid AS (
  SELECT doc_id,
         list_transform(generate_series(1, 8),
           c -> CAST(printf('%.6f', (((f0[c] + f2[c]) + f4[c]) + f6[c]) / 4) AS DOUBLE))
           AS feature
  FROM vp
)
SELECT doc_id,
       feature[1] AS f1, feature[2] AS f2, feature[3] AS f3,
       feature[4] AS f4, feature[5] AS f5, feature[6] AS f6,
       feature[7] AS f7, feature[8] AS f8
FROM (SELECT doc_id, feature FROM img
      UNION ALL SELECT doc_id, feature FROM aud
      UNION ALL SELECT doc_id, feature FROM vid)
"""


@query("multimodal_features", oracle=_features_oracle())
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction: media bytes -> fixed-dim float vector.
    REAL descriptors for all three types: PNG color/luma stats, WAV
    energy/ZCR, and for video the mean of the real image descriptor
    over the stride-sampled MPNG frames. Output is join-ready with
    `embeddings` (same Arrow batch shape a learned encoder would
    use)."""
    d = load(spark, sf_dir, "documents")
    media = with_media(d)

    def gen(batches):
        for pdf in batches:
            feats = []
            for mt, p in zip(pdf["media_type"], pdf["payload"]):
                if mt == "image/png":
                    feats.append(_image_features(p))
                elif mt == "audio/wav":
                    feats.append(_audio_features(p))
                else:
                    fs = [
                        _image_features(f)
                        for _src, f in sample_frames(mpng_decode(bytes(p)))
                    ]
                    feats.append(
                        [round(sum(c) / len(fs), 6) for c in zip(*fs)]
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    # 8 SCALAR columns, not array<double>: the driver's pandas
    # canonicalizer cannot hash list cells (pinned by
    # tests/test_registry.py), so an oracled key must stay scalar-only
    wide = media.mapInPandas(
        gen, "doc_id bigint, feature array<double>"
    )
    return wide.select(
        "doc_id",
        *[F.col("feature")[i].alias(f"f{i + 1}") for i in range(FEAT_DIM)],
    )


N_TOTAL_FRAMES = 8
N_FRAMES = 4  # sampled: every (N_TOTAL_FRAMES // N_FRAMES)-th frame
FRAME_STRIDE = N_TOTAL_FRAMES // N_FRAMES


def sample_frames(frames: list[bytes]) -> list[tuple[int, bytes]]:
    """THE sampling policy, shared by frame_sample and features so
    the two can never drift: (source index, frame) for every
    FRAME_STRIDE-th frame."""
    return [(src, frames[src]) for src in range(0, len(frames), FRAME_STRIDE)]


@query("multimodal_frame_sample")  # rows-only: binary frames, not SQL
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame sampling: parse each video's MPNG container
    (mpng_decode validates magic/lengths), stride-sample every 2nd of
    its 8 real PNG frames, and emit (doc_id, sample ordinal, source
    frame index, standalone decodable PNG payload). The 1->N fan-out
    happens executor-side in the same task as the container parse —
    no shuffle between decode and sampling, the shape a 100 TB video
    corpus needs."""
    d = load(spark, sf_dir, "documents")
    media = with_media(d).filter(F.col("media_type") == "video/mpng")

    def gen(batches):
        for pdf in batches:
            ids, idxs, srcs, frames = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                sampled = sample_frames(mpng_decode(bytes(p)))
                for i, (src, frame) in enumerate(sampled):
                    ids.append(doc_id)
                    idxs.append(i)
                    srcs.append(src)
                    frames.append(frame)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "src_frame": srcs,
                    "frame": frames,
                }
            )

    return media.mapInPandas(
        gen, "doc_id bigint, frame_idx int, src_frame int, frame binary"
    )


def ahash64(payload: bytes) -> int:
    """Real average-hash (aHash): decode PNG, nearest-neighbor to 8x8
    luma, threshold at the mean -> 64-bit perceptual fingerprint."""
    w, h, rgb = png_decode(payload)
    small = _resize_rgb(rgb, w, h, 8, 8)
    luma = [
        0.299 * small[i] + 0.587 * small[i + 1] + 0.114 * small[i + 2]
        for i in range(0, len(small), 3)
    ]
    mean = sum(luma) / 64
    bits = 0
    for i, v in enumerate(luma):
        if v >= mean:
            bits |= 1 << i
    return bits - (1 << 64) if bits >= (1 << 63) else bits  # signed int64




def _duck_phash_halves_cte() -> str:
    """Shared CTE chain (base -> streams -> lum -> ph): per image doc
    the aHash's two 32-bit halves, replayed arithmetically — the
    dedup_phash_census kernel, reused by the full dedup_phash
    oracle's banded self-join."""
    img_hashes = (
        "list_transform(generate_series(0, 25), "
        "i -> sha256(seed || ':' || CAST(i AS VARCHAR)))"
    )
    px = f"(((i // 8) * 2) * {IMG_W} + (i % 8) * 2) * 3"
    luma_list = (
        "list_transform(generate_series(0, 63), i -> "
        f"CAST(0.299 AS DOUBLE) * bs[{px} + 1] "
        f"+ CAST(0.587 AS DOUBLE) * bs[{px} + 2] "
        f"+ CAST(0.114 AS DOUBLE) * bs[{px} + 3])"
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, sha256(CAST(doc_id AS VARCHAR) || ':' || text) AS seed
  FROM documents WHERE doc_id % 3 = 0
), streams AS MATERIALIZED (
  SELECT doc_id, {_duck_stream_bytes(img_hashes)} AS bs FROM base
), lum AS (
  SELECT doc_id, ls, list_sum(ls) / 64 AS mn
  FROM (SELECT doc_id, {luma_list} AS ls FROM streams)
), ph AS MATERIALIZED (
  SELECT doc_id,
       CAST(list_sum(list_transform(generate_series(32, 63),
         i -> CASE WHEN ls[i + 1] >= mn THEN (1 << (i - 32)) ELSE 0 END))
         AS BIGINT) AS phash_hi,
       CAST(list_sum(list_transform(generate_series(0, 31),
         i -> CASE WHEN ls[i + 1] >= mn THEN (1 << i) ELSE 0 END))
         AS BIGINT) AS phash_lo
  FROM lum
)"""


def _phash_pairs_oracle() -> str:
    """Full replay of dedup_phash: the census's arithmetic aHash
    halves, then the SAME 4x16-bit banded candidate join + hamming
    <= 10 verify in plain SQL (band keys from the halves; hamming =
    popcount(xor hi) + popcount(xor lo) — identical to the engine's
    bit_count over the recombined signed int64)."""
    return _duck_phash_halves_cte() + """
, bands AS (
  SELECT doc_id, phash_hi, phash_lo, u.b AS band,
         CASE u.b WHEN 0 THEN phash_lo & 65535
                  WHEN 1 THEN phash_lo >> 16
                  WHEN 2 THEN phash_hi & 65535
                  ELSE phash_hi >> 16 END AS band_val
  FROM ph CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) u
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.phash_hi AS ha, a.phash_lo AS la,
         b.phash_hi AS hb, b.phash_lo AS lb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS INT)
         AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 10
"""


@query("dedup_phash", oracle=_phash_pairs_oracle())
def dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs by REAL perceptual hash: every PNG
    is decoded, average-hashed to 64 bits, banded into 4x16-bit
    chunks used as shuffle equi-join keys (same LSH-banding plan as
    dedup_simhash — no all-pairs comparison ever materializes), and
    candidate pairs verify with bit_count(xor) <= 10. At 100 TB the
    decode+hash is one narrow Arrow pass and candidate generation is
    an ordinary banded equi-join."""
    d = load(spark, sf_dir, "documents")
    media = with_media(d).filter(F.col("media_type") == "image/png")

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [ahash64(p) for p in pdf["payload"]],
                }
            )

    # Lazy localCheckpoint: both sides of the banded self-join below
    # descend from this table, and the two sides' exchanges do not
    # canonicalize to one (different output aliases), so without it
    # the Python PNG decode + aHash pass — the expensive part — runs
    # TWICE per action. Measured at sf0.01 (min of 3 warm noop reps):
    # 1.63 -> 0.85 s. Guide §5 reuse-over-recompute; values unchanged.
    sig = media.mapInPandas(gen, "doc_id bigint, phash bigint").localCheckpoint(
        eager=False
    )
    bands = sig.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{b}:"),
                        F.expr(f"(phash >> {16 * b}) & 65535").cast("string"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("band_key"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("ph_a"),
        "band_key",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("ph_b"),
        "band_key",
    )
    return (
        a.join(b, "band_key")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ph_a", "ph_b")
        .distinct()
        .withColumn(
            "hamming", F.expr("bit_count(ph_a ^ ph_b)")
        )
        .filter(F.col("hamming") <= 10)
        .select("doc_a", "doc_b", "hamming")
    )


N_BANDS = 16


def audio_fp(payload: bytes) -> tuple[int, int, float]:
    """Real spectral fingerprint of a WAV payload: rFFT magnitude
    spectrum -> 16 band energies -> 16-bit signature (band above
    median energy), plus dominant band and normalized RMS."""
    import numpy as np

    _n, _rate, samples = wav_decode(payload)
    x = np.asarray(samples, dtype=np.float64) / 32768.0
    mag = np.abs(np.fft.rfft(x))[1:]  # drop DC
    bands = np.array_split(mag, N_BANDS)
    energy = np.array([float((b * b).sum()) for b in bands])
    med = float(np.median(energy))
    fp = 0
    for i, e in enumerate(energy):
        if e > med:
            fp |= 1 << i
    dom = int(energy.argmax())
    rms = float(np.sqrt((x * x).mean()))
    return fp, dom, round(rms, 6)


@query("audio_fingerprint")  # rows-only: FFT fingerprint, not SQL
def audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral fingerprints for every audio doc: decode the REAL WAV
    payload, FFT executor-side (numpy inside the Arrow batch), emit
    the 16-band signature + dominant band + RMS. Identical recordings
    produce identical fingerprints — groupBy(fingerprint) is the
    audio dedup; at 100 TB this is one narrow decode+FFT pass and a
    counts-only shuffle."""
    d = load(spark, sf_dir, "documents")
    media = with_media(d).filter(F.col("media_type") == "audio/wav")

    def gen(batches):
        for pdf in batches:
            fps = [audio_fp(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fingerprint": [f[0] for f in fps],
                    "dominant_band": [f[1] for f in fps],
                    "rms": [f[2] for f in fps],
                }
            )

    return media.mapInPandas(
        gen, "doc_id bigint, fingerprint bigint, dominant_band int, rms double"
    )

VAD_FRAME = 50          # samples per frame (6.25 ms @ 8 kHz)
VAD_THRESH_FRAC = 0.5   # active = frame RMS > frac * clip RMS


def vad_segments(samples: list[int]) -> list[tuple[int, int, float]]:
    """Energy-based voice-activity detection on 16-bit PCM: frame
    RMS against a clip-relative threshold, consecutive active
    frames merged into (start_frame, end_frame_exclusive, mean_rms)
    segments. The relative threshold makes it gain-invariant.

    The activity DECISION is made in EXACT integer arithmetic (r7:
    this is what lets a SQL oracle replay it bit for bit):
    frame_rms > frac * clip_rms with frac = 0.5 is equivalent to
    4 * N * frame_sumsq > VAD_FRAME * clip_sumsq, all int64-exact
    (sumsq <= 400 * 32768^2 ~ 4.3e11). Identical to the old float
    comparison except on the measure-zero boundary where float
    rounding could flip it; reported segment mean RMS values are the
    same deterministic sqrt(exact_int / VAD_FRAME) folds as before."""
    import math

    n = len(samples)
    n_frames = n // VAD_FRAME
    if n_frames == 0:
        return []
    fsq = [
        sum(s * s for s in samples[i * VAD_FRAME : (i + 1) * VAD_FRAME])
        for i in range(n_frames)
    ]
    csq = sum(s * s for s in samples)  # full clip, exact int
    # frac = VAD_THRESH_FRAC = 0.5; the 4 below is 1 / frac^2
    active = [4 * n * f > VAD_FRAME * csq for f in fsq]
    rms = [math.sqrt(f / VAD_FRAME) for f in fsq]
    segs = []
    start = None
    for i, a in enumerate(active):
        if a and start is None:
            start = i
        elif not a and start is not None:
            segs.append((start, i, sum(rms[start:i]) / (i - start)))
            start = None
    if start is not None:
        segs.append(
            (
                start,
                n_frames,
                sum(rms[start:n_frames]) / (n_frames - start),
            )
        )
    return segs


def _vad_oracle() -> str:
    """Arithmetic replay of multimodal_audio_vad from the regenerated
    synth PCM bytes: per-frame exact integer sums of squares, the
    integer-exact activity decision (4 * N * fsq > VAD_FRAME * csq —
    the same inequality vad_segments now evaluates), gaps-and-islands
    segment grouping, segment mean RMS as a frame-ordered left fold
    of deterministic sqrts, and Python's max-first tie-break for the
    loudest segment (ORDER BY mean DESC, start ASC). active_frac
    replays Python round via printf (see _duck_pyround6)."""
    audio_hashes = (
        "list_transform(generate_series(0, 25), "
        "i -> sha256(seed || ':' || CAST(i AS VARCHAR)))"
    )
    s16 = (
        "CASE WHEN bs[2 * k + 1] + 256 * bs[2 * k + 2] >= 32768 "
        "THEN bs[2 * k + 1] + 256 * bs[2 * k + 2] - 65536 "
        "ELSE bs[2 * k + 1] + 256 * bs[2 * k + 2] END"
    )
    n_frames = WAV_SAMPLES // VAD_FRAME
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, sha256(CAST(doc_id AS VARCHAR) || ':' || text) AS seed
  FROM documents WHERE doc_id % 3 = 1
), streams AS MATERIALIZED (
  SELECT doc_id, {_duck_stream_bytes(audio_hashes)} AS bs FROM base
), fr AS MATERIALIZED (
  SELECT doc_id, CAST(t.range AS INT) AS frame,
         CAST(list_sum(list_transform(
           generate_series({VAD_FRAME} * t.range,
                           {VAD_FRAME} * t.range + {VAD_FRAME} - 1),
           k -> ({s16}) * ({s16}))) AS BIGINT) AS fsq
  FROM streams CROSS JOIN range({n_frames}) t
), fl AS (
  SELECT doc_id, frame, fsq,
         4 * {WAV_SAMPLES} * fsq
           > {VAD_FRAME} * (SUM(fsq) OVER (PARTITION BY doc_id)) AS active
  FROM fr
), isl AS (
  SELECT doc_id, frame, fsq, active,
         frame - ROW_NUMBER() OVER (
           PARTITION BY doc_id, active ORDER BY frame) AS grp
  FROM fl
), seg AS (
  SELECT doc_id, CAST(MIN(frame) AS INT) AS s,
         CAST(MAX(frame) + 1 AS INT) AS e,
         list_sum(list(sqrt(CAST(fsq AS DOUBLE) / {VAD_FRAME})
                       ORDER BY frame)) / COUNT(*) AS mean_rms
  FROM isl WHERE active GROUP BY doc_id, grp
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_segments,
         CAST(SUM(e - s) AS BIGINT) AS active_frames,
         FIRST(s ORDER BY mean_rms DESC, s ASC) AS loud_start,
         FIRST(e ORDER BY mean_rms DESC, s ASC) AS loud_end
  FROM seg GROUP BY doc_id
)
SELECT b.doc_id,
       COALESCE(a.n_segments, 0) AS n_segments,
       {_duck_pyround6(f"CAST(COALESCE(a.active_frames, 0) AS DOUBLE) / {n_frames}")}
         AS active_frac,
       CAST(COALESCE(a.loud_start, -1) AS INT) AS loud_start,
       CAST(COALESCE(a.loud_end, -1) AS INT) AS loud_end
FROM base b LEFT JOIN agg a USING (doc_id)
"""


@query("multimodal_audio_vad", oracle=_vad_oracle())
def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity detection over the REAL WAV assets — the
    speech-data curation step that decides which clips carry enough
    signal to transcribe: per audio document, energy segments from
    ``vad_segments`` (frame RMS vs a clip-relative threshold) give
    segment count, active-frame fraction, and the loudest segment's
    bounds. Arrow-batched mapInPandas next to the data — the same
    no-shuffle no-driver plumbing as the other multimodal ops;
    determinism pinned by a synthetic silence+tone test."""
    import pandas as pd

    d = with_media(load(spark, sf_dir, "documents")).filter(
        F.col("media_type") == "audio/wav"
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _n, _rate, samples = wav_decode(bytes(payload))
                segs = vad_segments(samples)
                n_frames = len(samples) // VAD_FRAME
                active = sum(e - s for s, e, _ in segs)
                loud = max(segs, key=lambda t: t[2], default=None)
                rows.append(
                    (
                        int(doc_id),
                        len(segs),
                        round(active / n_frames, 6) if n_frames else 0.0,
                        int(loud[0]) if loud else -1,
                        int(loud[1]) if loud else -1,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_segments",
                    "active_frac",
                    "loud_start",
                    "loud_end",
                ],
            )

    return d.select("doc_id", "payload").mapInPandas(
        gen,
        "doc_id bigint, n_segments int, active_frac double,"
        " loud_start int, loud_end int",
    )

def laplacian_var(gray) -> float:
    """Variance of the 4-neighbour Laplacian response — the standard
    cheap blur score (sharp edges -> high variance). Pure numpy,
    valid-region convolution."""
    import numpy as np

    g = np.asarray(gray, dtype=np.float64)
    lap = (
        -4 * g[1:-1, 1:-1]
        + g[:-2, 1:-1]
        + g[2:, 1:-1]
        + g[1:-1, :-2]
        + g[1:-1, 2:]
    )
    return float(lap.var())




def _blur_oracle() -> str:
    """Arithmetic replay of multimodal_image_blur: per-mille integer
    lumas from the regenerated synth RGB, exact integer Laplacian
    moments over the 14x14 interior, the same /n /n /1e6 float
    division order, printf rounding, and the same < 50 threshold on
    the identical double."""
    img_hashes = (
        "list_transform(generate_series(0, 25), "
        "i -> sha256(seed || ':' || CAST(i AS VARCHAR)))"
    )
    # luma list: 256 entries, 1-based in SQL
    lum = (
        "list_transform(generate_series(0, 255), p -> "
        "299 * bs[3 * p + 1] + 587 * bs[3 * p + 2] + 114 * bs[3 * p + 3])"
    )
    # interior index i in 0..195 -> pixel c = (i // 14 + 1) * 16 + (i % 14 + 1)
    c = "((i // 14 + 1) * 16 + (i % 14 + 1))"
    lap = (
        f"-4 * L[{c} + 1] + L[{c} - 16 + 1] + L[{c} + 16 + 1] "
        f"+ L[{c}] + L[{c} + 2]"
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, sha256(CAST(doc_id AS VARCHAR) || ':' || text) AS seed
  FROM documents WHERE doc_id % 3 = 0
), lums AS MATERIALIZED (
  SELECT doc_id, {lum} AS L
  FROM (SELECT doc_id, {_duck_stream_bytes(img_hashes)} AS bs FROM base)
), mom AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(generate_series(0, 195),
           i -> {lap})) AS BIGINT) AS s1,
         CAST(list_sum(list_transform(generate_series(0, 195),
           i -> ({lap}) * ({lap}))) AS BIGINT) AS s2
  FROM lums
)
SELECT doc_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       {_duck_pyround6("CAST(196 * s2 - s1 * s1 AS DOUBLE) / 196 / 196 / 1000000.0")}
         AS lap_var,
       (CAST(196 * s2 - s1 * s1 AS DOUBLE) / 196 / 196 / 1000000.0) < 50.0
         AS is_blurry
FROM mom
"""


def _luma_scaled(rgb: bytes) -> list[int]:
    """Per-pixel luma at PER-MILLE integer scale (299 r + 587 g +
    114 b) — the exact-arithmetic twin of the 0.299/0.587/0.114
    float luma used by the test-facing helpers; /1000 recovers it."""
    return [
        299 * rgb[3 * p] + 587 * rgb[3 * p + 1] + 114 * rgb[3 * p + 2]
        for p in range(len(rgb) // 3)
    ]


def lap_var_exact(rgb: bytes, w: int, h: int) -> float:
    """Laplacian variance over the valid interior with EXACT integer
    moments on the per-mille luma (r7: what lets a SQL oracle replay
    the blur score bit for bit): var = (n S2 - S1^2) / n^2 on ints,
    floated only by the final /n /n /1e6 divisions. Bounds: |lap| <=
    8 * 255000 ~ 2.04e6, n S2 <= 1.7e17 < 2^63. Equals the float
    laplacian_var up to ~1e-9 relative (pinned by test).

    Float pipeline (r8, ADVICE fix): num may exceed 2^53 (a sharp
    checkerboard reaches ~4e16), so Python's one-step correctly
    rounded ``num / n`` bigint division could differ 1 ulp from the
    oracle's cast-then-divide. We therefore round num to double FIRST
    (``float(num)`` — same round-half-even as DuckDB's CAST(num AS
    DOUBLE)) and then apply the identical /n /n /1e6 sequence, making
    every rounding step bit-identical to the oracle for ALL inputs;
    below 2^53 the conversion is exact, so values are unchanged."""
    L = _luma_scaled(rgb)
    n = (w - 2) * (h - 2)
    s1 = s2 = 0
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            c = y * w + x
            lap = -4 * L[c] + L[c - w] + L[c + w] + L[c - 1] + L[c + 1]
            s1 += lap
            s2 += lap * lap
    num = n * s2 - s1 * s1
    return float(num) / n / n / 1e6


@query("multimodal_image_blur", oracle=_blur_oracle())
def multimodal_image_blur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blur screening over the REAL PNG assets — the image-curation
    twin of the audio VAD: decode to luma, score with the Laplacian
    variance (sharp edges -> high response variance; defocused or
    synthetic-flat images -> low), and flag the bottom against a
    fixed threshold. Arrow-batched mapInPandas next to the data;
    the sharp-vs-blurred ordering is pinned by a synthetic test
    (checkerboard vs its box-blurred copy)."""
    import numpy as np
    import pandas as pd

    d = with_media(load(spark, sf_dir, "documents")).filter(
        F.col("media_type") == "image/png"
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb = png_decode(bytes(payload))
                lv = lap_var_exact(rgb, w, h)
                rows.append((int(doc_id), w, h, round(lv, 6), lv < 50.0))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "lap_var", "is_blurry"],
            )

    return d.select("doc_id", "payload").mapInPandas(
        gen,
        "doc_id bigint, width int, height int, lap_var double,"
        " is_blurry boolean",
    )

SHOT_CUT_FRAC = 2.0  # cut when frame diff > frac * mean diff


def shot_boundaries(lumas) -> list[int]:
    """Shot-boundary detection over a per-frame luma sequence: a cut
    at frame i when the mean absolute luma difference to frame i-1
    exceeds SHOT_CUT_FRAC x the clip's mean frame difference (a
    clip-relative threshold, robust to overall brightness). Returns
    the cut frame indices. Deterministic numpy."""
    import numpy as np

    if len(lumas) < 2:
        return []
    L = np.stack([np.asarray(f, dtype=np.float64) for f in lumas])
    diffs = np.abs(L[1:] - L[:-1]).mean(axis=(1, 2))
    mean_d = diffs.mean() or 1.0
    return [int(i) + 1 for i in np.nonzero(diffs > SHOT_CUT_FRAC * mean_d)[0]]


def _shots_oracle() -> str:
    """Arithmetic replay of multimodal_video_shots: per-frame
    per-mille integer lumas from the regenerated frame streams,
    exact integer inter-frame absolute-difference sums, the
    integer-exact cut rule nd * d_i > 2 * total (the same inequality
    the engine now evaluates), and the /1792 /1e3 float division
    order for the reported mean (printf rounding)."""
    lum = (
        "list_transform(generate_series(0, 255), p -> "
        "299 * fb[3 * p + 1] + 587 * fb[3 * p + 2] + 114 * fb[3 * p + 3])"
    )
    fh = (
        "list_transform(generate_series(0, 23), "
        "j -> sha256(seed || ':frame' || CAST(fi AS VARCHAR) "
        "|| ':' || CAST(j AS VARCHAR)))"
    )
    nd = N_TOTAL_FRAMES - 1
    npx = IMG_W * IMG_H
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, sha256(CAST(doc_id AS VARCHAR) || ':' || text) AS seed
  FROM documents WHERE doc_id % 3 = 2
), fs AS MATERIALIZED (
  SELECT doc_id, CAST(t.range AS INT) AS fi, seed
  FROM base CROSS JOIN range({N_TOTAL_FRAMES}) t
), fr AS MATERIALIZED (
  SELECT doc_id, fi, {lum} AS L
  FROM (SELECT doc_id, fi, {_duck_stream_bytes(fh)} AS fb FROM fs)
), df AS MATERIALIZED (
  SELECT a.doc_id, b.fi AS cut_at,
         CAST(list_sum(list_transform(generate_series(1, {npx}),
           p -> abs(a.L[p] - b.L[p]))) AS BIGINT) AS d
  FROM fr a JOIN fr b ON b.doc_id = a.doc_id AND b.fi = a.fi + 1
), tot AS (
  SELECT doc_id, CAST(SUM(d) AS BIGINT) AS total FROM df GROUP BY doc_id
), cuts AS (
  SELECT df.doc_id, df.cut_at
  FROM df JOIN tot USING (doc_id)
  WHERE {nd} * df.d > 2 * tot.total
), cagg AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_cuts,
         CAST(MIN(cut_at) AS INT) AS first_cut
  FROM cuts GROUP BY doc_id
)
SELECT b.doc_id, CAST({N_TOTAL_FRAMES} AS INT) AS n_frames,
       COALESCE(c.n_cuts, 0) AS n_cuts,
       COALESCE(c.first_cut, -1) AS first_cut,
       {_duck_pyround6(f"CAST(t.total AS DOUBLE) / {nd * npx} / 1000.0")}
         AS mean_frame_diff
FROM base b JOIN tot t USING (doc_id) LEFT JOIN cagg c USING (doc_id)
"""


@query("multimodal_video_shots", oracle=_shots_oracle())
def multimodal_video_shots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over the REAL MPNG videos — the third
    leg of the modality-curation triptych (audio VAD, image blur,
    video shots): decode every container frame to luma, score
    frame-to-frame differences against a clip-relative threshold,
    report cut count, first cut, and mean inter-frame difference.
    The synthetic frames are i.i.d. noise (high uniform differences,
    so few threshold crossings) — the planted-cut behavior is pinned
    by a test that splices two constant scenes. Arrow-batched
    mapInPandas, no shuffle."""
    import numpy as np
    import pandas as pd

    d = with_media(load(spark, sf_dir, "documents")).filter(
        F.col("media_type") == "video/mpng"
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = mpng_decode(bytes(payload))
                lumas = []
                for fr in frames:
                    w, h, rgb = png_decode(fr)
                    lumas.append(_luma_scaled(rgb))
                # exact integer inter-frame diffs; the cut rule
                # nd * d_i > 2 * total is the integer-exact form of
                # shot_boundaries' d_i > 2 * mean(d) (r7: SQL-replayable)
                nd = len(lumas) - 1
                npx = len(lumas[0]) if lumas else 0
                diffs = [
                    sum(abs(a - b) for a, b in zip(lumas[i], lumas[i + 1]))
                    for i in range(nd)
                ]
                total = sum(diffs)
                cuts = [
                    i + 1 for i, d in enumerate(diffs) if nd * d > 2 * total
                ]
                mean_diff = (
                    total / (nd * npx) / 1000.0 if nd > 0 else 0.0
                )
                rows.append(
                    (
                        int(doc_id),
                        len(lumas),
                        len(cuts),
                        cuts[0] if cuts else -1,
                        round(mean_diff, 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_frames",
                    "n_cuts",
                    "first_cut",
                    "mean_frame_diff",
                ],
            )

    return d.select("doc_id", "payload").mapInPandas(
        gen,
        "doc_id bigint, n_frames int, n_cuts int, first_cut int,"
        " mean_frame_diff double",
    )


def _duck_img_stream() -> str:
    """DuckDB: the 768 RGB bytes of an image doc's synth stream."""
    img_hashes = (
        "list_transform(generate_series(0, 25), "
        "i -> sha256(seed || ':' || CAST(i AS VARCHAR)))"
    )
    return f"list_slice({_duck_stream_bytes(img_hashes)}, 1, {IMG_W * IMG_H * 3})"


@query(
    "multimodal_histogram_census",
    oracle=f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, sha256(CAST(doc_id AS VARCHAR) || ':' || text) AS seed
  FROM documents WHERE doc_id % 3 = 0
), streams AS MATERIALIZED (
  SELECT doc_id, {_duck_img_stream()} AS bs FROM base
)
SELECT doc_id, CAST(t.bin AS INTEGER) AS bin,
       CAST(len(list_filter(bs, b -> b // 32 = t.bin)) AS BIGINT)
         AS n_bytes
FROM streams, unnest(generate_series(0, 7)) t(bin)
""",
)
def multimodal_histogram_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pixel-value histogram census — the second hash-checked
    projection of the image pipeline (multimodal_decode_census gates
    the luma-weighted MEAN; this gates the byte-value DISTRIBUTION,
    which a palette/channel corruption can break while preserving
    the mean): decode every REAL PNG payload and bucket all
    {IMG_W}x{IMG_H}x3 channel bytes into 8 value bins. The oracle
    regenerates the synth stream by the same hex-chained sha256 and
    counts bins arithmetically — any bit drift anywhere in the
    encode/decode round trip moves a count. Exact integers only.
    Scale shape: one Arrow mapInPandas next to the data emitting 8
    rows per image doc; one hash aggregate."""
    d = load(spark, sf_dir, "documents")
    media = with_media(d).filter(F.col("media_type") == "image/png")

    def gen(batches):
        for pdf in batches:
            ids, bins, counts = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb = png_decode(p)
                hist = [0] * 8
                for b in rgb:
                    hist[b // 32] += 1
                for k in range(8):
                    ids.append(doc_id)
                    bins.append(k)
                    counts.append(hist[k])
            yield pd.DataFrame(
                {"doc_id": ids, "bin": bins, "n_bytes": counts}
            )

    return media.mapInPandas(
        gen, "doc_id bigint, bin int, n_bytes bigint"
    )


def _duck_wav_stream() -> str:
    """DuckDB: the 800 PCM bytes of an audio doc's synth stream."""
    wav_hashes = (
        "list_transform(generate_series(0, 25), "
        "i -> sha256(seed || ':' || CAST(i AS VARCHAR)))"
    )
    return f"list_slice({_duck_stream_bytes(wav_hashes)}, 1, {WAV_SAMPLES * 2})"


_WAV_SMP = (
    "(CASE WHEN bs[2 * {k} + 1] + 256 * bs[2 * {k} + 2] >= 32768 "
    "THEN bs[2 * {k} + 1] + 256 * bs[2 * {k} + 2] - 65536 "
    "ELSE bs[2 * {k} + 1] + 256 * bs[2 * {k} + 2] END)"
)


@query(
    "multimodal_audio_energy_census",
    oracle=f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, sha256(CAST(doc_id AS VARCHAR) || ':' || text) AS seed
  FROM documents WHERE doc_id % 3 = 1
), streams AS MATERIALIZED (
  SELECT doc_id, {_duck_wav_stream()} AS bs FROM base
)
SELECT doc_id, CAST(t.w AS INTEGER) AS win,
       CAST(list_sum(list_transform(generate_series(50 * t.w, 50 * t.w + 49),
            k -> abs({_WAV_SMP.format(k="k")}))) AS BIGINT) AS abs_sum,
       CAST(list_sum(list_transform(generate_series(50 * t.w, 50 * t.w + 48),
            k -> CASE WHEN ({_WAV_SMP.format(k="k")} >= 0)
                       != ({_WAV_SMP.format(k="(k + 1)")} >= 0)
                 THEN 1 ELSE 0 END)) AS BIGINT) AS zero_crossings
FROM streams, unnest(generate_series(0, 7)) t(w)
""",
)
def multimodal_audio_energy_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Windowed audio-energy census — the hash-checked projection of
    the AUDIO pipeline front end (multimodal_decode_census gates the
    whole-file mean amplitude; this gates the per-window energy
    PROFILE that multimodal_audio_vad thresholds on, in 8 windows of
    50 samples): decode every REAL WAV payload (stdlib wave module,
    the full RIFF round trip) and report each window's exact integer
    |amplitude| sum and zero-crossing count. The oracle regenerates
    the synth PCM bytes by the same hex-chained sha256 and computes
    both integers arithmetically (two's-complement little-endian
    16-bit reconstruction in SQL) — any bit drift anywhere in the
    WAV encode/decode round trip moves a count. EXACT INTEGERS ONLY
    — no float enters the gate. Scale shape: one Arrow mapInPandas
    next to the data emitting 8 rows per audio doc; no shuffle."""
    d = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 1
    )
    media = with_media(d)

    def gen(batches):
        for pdf in batches:
            ids, wins, sums, zcs = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                _n, _rate, samples = wav_decode(p)
                for w in range(8):
                    seg = samples[50 * w : 50 * w + 50]
                    ids.append(doc_id)
                    wins.append(w)
                    sums.append(sum(abs(s) for s in seg))
                    zcs.append(
                        sum(
                            1
                            for a, b in zip(seg, seg[1:])
                            if (a >= 0) != (b >= 0)
                        )
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "win": wins,
                    "abs_sum": sums,
                    "zero_crossings": zcs,
                }
            )

    return media.mapInPandas(
        gen,
        "doc_id bigint, win int, abs_sum bigint, zero_crossings bigint",
    )


def _duck_frame_stream(i_expr: str) -> str:
    """DuckDB: the 768 RGB bytes of video frame ``i_expr``'s synth
    stream (24 hex-chained sha256 hashes, exactly _synth_payload's
    per-frame derivation)."""
    frame_hashes = (
        f"list_transform(generate_series(0, 23), "
        f"j -> sha256(seed || ':frame' || CAST({i_expr} AS VARCHAR) "
        f"|| ':' || CAST(j AS VARCHAR)))"
    )
    return f"list_slice({_duck_stream_bytes(frame_hashes)}, 1, {IMG_W * IMG_H * 3})"


@query(
    "multimodal_video_motion_census",
    oracle=f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, sha256(CAST(doc_id AS VARCHAR) || ':' || text) AS seed
  FROM documents WHERE doc_id % 3 = 2
), fr AS MATERIALIZED (
  SELECT doc_id, t.i AS frame, {_duck_frame_stream("t.i")} AS bs
  FROM base, unnest(generate_series(0, {N_TOTAL_FRAMES - 1})) t(i)
)
SELECT a.doc_id, CAST(a.frame AS INTEGER) AS frame,
       CAST(list_sum(list_transform(generate_series(1, {IMG_W * IMG_H * 3}),
            p -> abs(a.bs[p] - b.bs[p]))) AS BIGINT) AS motion_abs_sum
FROM fr a JOIN fr b ON b.doc_id = a.doc_id AND b.frame = a.frame - 1
""",
)
def multimodal_video_motion_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Frame-to-frame motion census — the hash gate for the video
    FRAME-SEQUENCE path (multimodal_decode_census gates frame 0
    only; multimodal_video_shots' rows-only shot detector thresholds
    exactly this inter-frame energy): parse every REAL MPNG
    container, PNG-decode ALL {N_TOTAL_FRAMES} frames, and report
    each consecutive pair's exact integer sum of absolute RGB
    differences. The oracle regenerates every frame's synth bytes by
    the same hex-chained sha256 and computes the differences
    arithmetically — a bit drift in ANY frame (not just the first)
    now moves a gated count. EXACT INTEGERS ONLY. Scale shape: one
    Arrow mapInPandas next to the data emitting
    {N_TOTAL_FRAMES - 1} rows per video doc; no shuffle."""
    d = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 2
    )
    media = with_media(d)

    def gen(batches):
        for pdf in batches:
            ids, frames, sums = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                rgbs = [
                    png_decode(fp)[2] for fp in mpng_decode(p)
                ]
                for i in range(1, len(rgbs)):
                    a, b = rgbs[i], rgbs[i - 1]
                    ids.append(doc_id)
                    frames.append(i)
                    sums.append(
                        sum(abs(x - y) for x, y in zip(a, b))
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame": frames,
                    "motion_abs_sum": sums,
                }
            )

    return media.mapInPandas(
        gen, "doc_id bigint, frame int, motion_abs_sum bigint"
    )


# --- round-7 census twins (r6 verdict item 5): hash-gate the full ---------
# --- perceptual-hash and audio-decode paths via the sha256 synth chain ----


def _phash_census_oracle() -> str:
    """Arithmetic replay of the ENTIRE dedup_phash signature path with
    no codec: regenerate the synth RGB bytes by the hex-chained
    sha256 (the multimodal_decode_census machinery), replay the 16x16
    -> 8x8 nearest-neighbor pick (pixel (2x, 2y)), the luma fold, the
    mean threshold, and the 64-bit aHash — emitted as two 32-bit
    halves so no signed-int64 wraparound is ever needed in SQL. Every
    float op (0.299r + 0.587g + 0.114b products, the left-fold sum,
    the /64) is the identical IEEE sequence in both engines, so the
    >= mean threshold bit decisions replay bit-for-bit."""
    img_hashes = (
        "list_transform(generate_series(0, 25), "
        "i -> sha256(seed || ':' || CAST(i AS VARCHAR)))"
    )
    # luma of aHash cell i (0-based): source pixel (2*(i%8), 2*(i//8))
    px = f"(((i // 8) * 2) * {IMG_W} + (i % 8) * 2) * 3"
    luma_list = (
        "list_transform(generate_series(0, 63), i -> "
        f"CAST(0.299 AS DOUBLE) * bs[{px} + 1] "
        f"+ CAST(0.587 AS DOUBLE) * bs[{px} + 2] "
        f"+ CAST(0.114 AS DOUBLE) * bs[{px} + 3])"
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, sha256(CAST(doc_id AS VARCHAR) || ':' || text) AS seed
  FROM documents WHERE doc_id % 3 = 0
), streams AS MATERIALIZED (
  SELECT doc_id, {_duck_stream_bytes(img_hashes)} AS bs FROM base
), lum AS (
  SELECT doc_id, ls, list_sum(ls) / 64 AS mn
  FROM (SELECT doc_id, {luma_list} AS ls FROM streams)
)
SELECT doc_id,
       CAST(list_sum(list_transform(generate_series(32, 63),
         i -> CASE WHEN ls[i + 1] >= mn THEN (1 << (i - 32)) ELSE 0 END))
         AS BIGINT) AS phash_hi,
       CAST(list_sum(list_transform(generate_series(0, 31),
         i -> CASE WHEN ls[i + 1] >= mn THEN (1 << i) ELSE 0 END))
         AS BIGINT) AS phash_lo
FROM lum
"""


@query("dedup_phash_census", oracle=_phash_census_oracle())
def dedup_phash_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked census of the dedup_phash signature path: the
    REAL pipeline (synth -> PNG encode -> CRC-checked decode -> 8x8
    nearest-neighbor resize -> luma fold -> mean-threshold aHash)
    runs in the engine; the oracle replays the expected 64 bits with
    pure arithmetic from the regenerated synth bytes. A corruption
    anywhere — PNG framing, the resize's pixel picks, the luma
    coefficients, the threshold tie direction — flips a bit on the
    affected doc and fails the hash. The banded pair join above this
    signature (dedup_phash) is plain relational algebra, so the
    signature census is the load-bearing gate. Emitted as two 32-bit
    halves (shiftrightunsigned / mask) to keep both engines in
    non-negative BIGINT space."""
    d = load(spark, sf_dir, "documents")
    media = with_media(d).filter(F.col("media_type") == "image/png")

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [ahash64(p) for p in pdf["payload"]],
                }
            )

    sig = media.mapInPandas(gen, "doc_id bigint, phash bigint")
    return sig.select(
        "doc_id",
        F.expr("shiftrightunsigned(phash, 32)").alias("phash_hi"),
        F.expr("phash & 4294967295").alias("phash_lo"),
    )


def _audio_census_oracle() -> str:
    """Replay audio_fingerprint's decoded-sample view with exact
    integer arithmetic: regenerate the synth PCM bytes, reassemble
    the signed 16-bit little-endian samples, and emit the EXACT
    integer sum of squares (any single-sample corruption changes it)
    plus the normalized RMS derived from it by one deterministic
    sqrt. The FFT band signature stays engine-only (transcendental
    twiddle factors are the documented cross-engine 1-ulp risk); the
    decode/unpack layer it feeds is what this census pins."""
    audio_hashes = (
        "list_transform(generate_series(0, 25), "
        "i -> sha256(seed || ':' || CAST(i AS VARCHAR)))"
    )
    s16 = (
        "CASE WHEN bs[2 * k + 1] + 256 * bs[2 * k + 2] >= 32768 "
        "THEN bs[2 * k + 1] + 256 * bs[2 * k + 2] - 65536 "
        "ELSE bs[2 * k + 1] + 256 * bs[2 * k + 2] END"
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, sha256(CAST(doc_id AS VARCHAR) || ':' || text) AS seed
  FROM documents WHERE doc_id % 3 = 1
), streams AS MATERIALIZED (
  SELECT doc_id, {_duck_stream_bytes(audio_hashes)} AS bs FROM base
), ss AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(generate_series(0, {WAV_SAMPLES} - 1),
           k -> ({s16}) * ({s16}))) AS BIGINT) AS sum_sq
  FROM streams
)
SELECT doc_id, sum_sq,
       {_duck_pyround6(f"sqrt(CAST(sum_sq AS DOUBLE) / {WAV_SAMPLES}) / 32768.0")}
         AS rms
FROM ss
"""


@query("audio_fingerprint_census", oracle=_audio_census_oracle())
def audio_fingerprint_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked census of audio_fingerprint's decode layer: the
    engine runs the REAL path (synth -> stdlib WAV encode -> wave
    decode -> int16 samples) and reports the exact integer sum of
    squares + the normalized RMS computed from it; the oracle
    reassembles the same samples arithmetically from the regenerated
    synth bytes. A byte swapped anywhere in the PCM framing, a sign
    error in the unpack, or a dropped sample lands as an integer
    mismatch on the affected doc. rms here is bit-identical to
    audio_fp's rounded value because both divide the same exact
    integer by the same constants before one correctly-rounded
    sqrt."""
    d = load(spark, sf_dir, "documents")
    media = with_media(d).filter(F.col("media_type") == "audio/wav")

    def gen(batches):
        import math

        for pdf in batches:
            sums, rmss = [], []
            for p in pdf["payload"]:
                _n, _rate, samples = wav_decode(p)
                ss = sum(s * s for s in samples)
                sums.append(ss)
                rmss.append(round(math.sqrt(ss / WAV_SAMPLES) / 32768.0, 6))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "sum_sq": sums, "rms": rmss}
            )

    return media.mapInPandas(
        gen, "doc_id bigint, sum_sq bigint, rms double"
    )


def _resize_census_oracle() -> str:
    """Arithmetic replay of multimodal_resize: the 32x32 thumb is a
    2x2 nearest-neighbor replication of the 16x16 source (sy = ty//2,
    sx = tx//2), so every thumb byte is a known synth byte. The
    census value is the position-weighted integer checksum
    sum((p+1) * byte_p) over the 3072 decoded thumb bytes — any
    moved, dropped, or altered byte anywhere in decode -> resize ->
    re-encode -> decode changes it. Bounded: 3072 * 3072 * 255
    ~ 2.4e9 < 2^63."""
    img_hashes = (
        "list_transform(generate_series(0, 25), "
        "i -> sha256(seed || ':' || CAST(i AS VARCHAR)))"
    )
    # thumb byte p (0-based, p = (ty*32 + tx)*3 + c):
    # source byte = ((ty//2)*16 + tx//2)*3 + c
    srcb = (
        "bs[((((p // 3) // 32) // 2) * 16 + ((p // 3) % 32) // 2) * 3"
        " + (p % 3) + 1]"
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, sha256(CAST(doc_id AS VARCHAR) || ':' || text) AS seed
  FROM documents WHERE doc_id % 3 = 0
), streams AS MATERIALIZED (
  SELECT doc_id, {_duck_stream_bytes(img_hashes)} AS bs FROM base
)
SELECT doc_id, CAST({TARGET_W} AS INT) AS width,
       CAST({TARGET_H} AS INT) AS height,
       CAST(list_sum(list_transform(
         generate_series(0, {TARGET_W * TARGET_H * 3} - 1),
         p -> (p + 1) * {srcb})) AS BIGINT) AS thumb_checksum
FROM streams
"""


@query("multimodal_resize_census", oracle=_resize_census_oracle())
def multimodal_resize_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked census of multimodal_resize: the engine runs the
    REAL pipeline (synth -> PNG -> decode -> nearest-neighbor 32x32
    -> PNG re-encode -> CRC-checked decode) and reports the
    position-weighted integer checksum of the decoded thumb bytes;
    the oracle computes the same checksum from the regenerated synth
    bytes via the resize index arithmetic — no codec. Only the
    DEFLATE-compressed thumb length stays engine-only (the same
    n_bytes carve-out as multimodal_decode_census)."""
    d = load(spark, sf_dir, "documents")
    media = with_media(d).filter(F.col("media_type") == "image/png")

    def gen(batches):
        for pdf in batches:
            ids, cks = [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb = png_decode(bytes(p))
                thumb_png = png_encode(
                    _resize_rgb(rgb, w, h, TARGET_W, TARGET_H),
                    TARGET_W,
                    TARGET_H,
                )
                tw, th, trgb = png_decode(thumb_png)
                assert (tw, th) == (TARGET_W, TARGET_H)
                ids.append(int(doc_id))
                cks.append(sum((i + 1) * b for i, b in enumerate(trgb)))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": TARGET_W,
                    "height": TARGET_H,
                    "thumb_checksum": cks,
                }
            )

    return media.mapInPandas(
        gen,
        "doc_id bigint, width int, height int, thumb_checksum bigint",
    )


def _frame_sample_census_oracle() -> str:
    """Arithmetic replay of multimodal_frame_sample: sampled ordinal i
    maps to source frame 2 i (FRAME_STRIDE = 2 of N_TOTAL_FRAMES = 8),
    and each sampled frame's decoded RGB is the 768-byte frame stream
    — checksummed position-weighted like the resize census. Gates the
    container parse, the stride policy, and every frame byte."""
    fh = (
        "list_transform(generate_series(0, 23), "
        "j -> sha256(seed || ':frame' || CAST(2 * t.range AS VARCHAR) "
        "|| ':' || CAST(j AS VARCHAR)))"
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, sha256(CAST(doc_id AS VARCHAR) || ':' || text) AS seed
  FROM documents WHERE doc_id % 3 = 2
), fs AS MATERIALIZED (
  SELECT doc_id, CAST(t.range AS INT) AS frame_idx,
         CAST(2 * t.range AS INT) AS src_frame,
         {_duck_stream_bytes(fh)} AS fb
  FROM base CROSS JOIN range({N_FRAMES}) t
)
SELECT doc_id, frame_idx, src_frame,
       CAST(list_sum(list_transform(generate_series(0, 767),
         p -> (p + 1) * fb[p + 1])) AS BIGINT) AS frame_checksum
FROM fs
"""


@query(
    "multimodal_frame_sample_census",
    oracle=_frame_sample_census_oracle(),
)
def multimodal_frame_sample_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hash-checked census of multimodal_frame_sample: the engine
    parses the REAL MPNG container, stride-samples, PNG-decodes each
    sampled frame and reports its position-weighted RGB checksum; the
    oracle regenerates the same bytes from the frame hash chains. A
    frame served out of order, a mis-parsed length prefix, or one
    corrupted byte lands as a mismatch on the exact (doc, ordinal)."""
    d = load(spark, sf_dir, "documents")
    media = with_media(d).filter(F.col("media_type") == "video/mpng")

    def gen(batches):
        for pdf in batches:
            ids, idxs, srcs, cks = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                sampled = sample_frames(mpng_decode(bytes(p)))
                for i, (src, frame) in enumerate(sampled):
                    _w, _h, rgb = png_decode(frame)
                    ids.append(int(doc_id))
                    idxs.append(i)
                    srcs.append(src)
                    cks.append(
                        sum((k + 1) * b for k, b in enumerate(rgb))
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "src_frame": srcs,
                    "frame_checksum": cks,
                }
            )

    return media.mapInPandas(
        gen,
        "doc_id bigint, frame_idx int, src_frame int,"
        " frame_checksum bigint",
    )


# ---------------------------------------------------------------------------
# audio_fingerprint exact-DFT twin (r8 verdict item 5)

_DFT_N = 16       # samples per doc: exact DFT enumerates at this size
_DFT_BINS = 8     # non-DC rFFT bins at N=16 (k = 1..8)
_DFT_SCALE = 1000  # twiddle quantization: |x|<=32768, |c|<=1000 ->
#                    |re| <= 16*32768*1000 ~ 5.3e8; re^2+im^2 <= 5.6e17;
#                    band energy (2 bins) <= 1.2e18 -- all safely int64.


def _dft_twiddles() -> list[tuple[int, int, int, int]]:
    """(k, n, c, s) scaled-integer twiddle factors for the N=16 real
    DFT, k = 1..8 (DC dropped exactly as audio_fp drops bin 0):
    c = round(cos(2*pi*k*n/16) * SCALE), s = -round(sin(...) * SCALE).
    Computed ONCE here and embedded verbatim in BOTH the Spark
    broadcast table and the DuckDB VALUES list, so the two engines
    share bit-identical constants by construction."""
    import math

    rows = []
    for k in range(1, _DFT_BINS + 1):
        for n in range(_DFT_N):
            ang = 2.0 * math.pi * k * n / _DFT_N
            rows.append(
                (k, n, round(math.cos(ang) * _DFT_SCALE),
                 -round(math.sin(ang) * _DFT_SCALE))
            )
    return rows


def _dft_exhaustive_oracle() -> str:
    tw_values = ",\n    ".join(
        f"({k}, {n}, {c}, {s})" for k, n, c, s in _dft_twiddles()
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, sha256(CAST(doc_id AS VARCHAR) || ':' || text) AS seed
  FROM documents WHERE doc_id % 3 = 1
), streams AS MATERIALIZED (
  SELECT doc_id, {_duck_wav_stream()} AS bs FROM base
), smp AS MATERIALIZED (
  SELECT doc_id,
         list_transform(generate_series(0, {_DFT_N - 1}),
                        k -> CAST({_WAV_SMP.format(k="k")} AS BIGINT)) AS sv
  FROM streams
), tw(k, n, c, s) AS (
  VALUES {tw_values}
), bins AS (
  SELECT doc_id, tw.k,
         SUM(sv[tw.n + 1] * tw.c) AS re,
         SUM(sv[tw.n + 1] * tw.s) AS im
  FROM smp, tw GROUP BY doc_id, tw.k
), bands AS (
  SELECT doc_id, CAST((k - 1) // 2 AS INT) AS b,
         SUM(re * re + im * im) AS e
  FROM bins GROUP BY doc_id, CAST((k - 1) // 2 AS INT)
), ranked AS (
  SELECT doc_id, b, e,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY e, b) AS rn,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY e DESC, b) AS rd
  FROM bands
), med AS (
  SELECT doc_id,
         SUM(CASE WHEN rn IN (2, 3) THEN e ELSE 0 END) AS med2
  FROM ranked GROUP BY doc_id
)
SELECT r.doc_id,
       CAST(SUM(CASE WHEN 2 * r.e > m.med2 THEN (1 << r.b) ELSE 0 END)
            AS INT) AS fingerprint,
       CAST(SUM(CASE WHEN r.rd = 1 THEN r.b ELSE 0 END) AS INT)
         AS dominant_band,
       CAST(SUM(CASE WHEN r.b = 0 THEN r.e ELSE 0 END) AS BIGINT) AS band_e0,
       CAST(SUM(CASE WHEN r.b = 1 THEN r.e ELSE 0 END) AS BIGINT) AS band_e1,
       CAST(SUM(CASE WHEN r.b = 2 THEN r.e ELSE 0 END) AS BIGINT) AS band_e2,
       CAST(SUM(CASE WHEN r.b = 3 THEN r.e ELSE 0 END) AS BIGINT) AS band_e3
FROM ranked r JOIN med m USING (doc_id)
GROUP BY r.doc_id
"""


@query("audio_fingerprint_dft_exhaustive", oracle=_dft_exhaustive_oracle())
def audio_fingerprint_dft_exhaustive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT scaled-integer-DFT twin of audio_fingerprint (r8 verdict
    item 5) — hash-gates the last un-oracled arithmetic in the audio
    path: the FFT band signature of audio_fp (this file, ~line 829),
    which stays rows-only because np.fft over 400 samples is not
    SQL-replayable. This twin replays the SAME semantic pipeline
    (spectrum -> band energies -> median threshold -> signature bits
    -> dominant band) on the first N=16 REAL decoded samples of every
    WAV payload with a size-16 exact DFT: integer twiddle factors
    round(cos/sin * 1000) shared verbatim by both engines, so every
    value (re, im, energies, the 2x-median comparison, the bit pack)
    is EXACT int64 arithmetic — no float enters the gate, the
    div_kcenter_outliers_exhaustive doctrine. The oracle regenerates
    the PCM bytes by the hex-chained sha256 (as the audio censuses
    do) and unrolls the DFT over a 128-row constant twiddle VALUES
    table. tests/test_llm.py cross-checks the quantized DFT against
    np.fft.rfft on the same windows, tying this gate back to
    audio_fp's production FFT. Scale shape: one decode pass emitting
    16 rows/doc, a 128-row broadcast join, then per-doc aggregation —
    no shuffle wider than doc_id."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)
    media = with_media(d)

    def gen(batches):
        for pdf in batches:
            ids, ns, xs = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                _n, _rate, samples = wav_decode(bytes(p))
                for n, x in enumerate(samples[:_DFT_N]):
                    ids.append(int(doc_id))
                    ns.append(n)
                    xs.append(int(x))
            yield pd.DataFrame({"doc_id": ids, "n": ns, "x": xs})

    smp = media.mapInPandas(gen, "doc_id bigint, n int, x bigint")
    tw = spark.createDataFrame(
        _dft_twiddles(), "k int, n int, c bigint, s bigint"
    )
    bins = (
        smp.join(F.broadcast(tw), "n")
        .groupBy("doc_id", "k")
        .agg(
            F.sum(F.col("x") * F.col("c")).alias("re"),
            F.sum(F.col("x") * F.col("s")).alias("im"),
        )
    )
    bands = (
        bins.select(
            "doc_id",
            F.expr("CAST((k - 1) div 2 AS INT)").alias("b"),
            (F.col("re") * F.col("re") + F.col("im") * F.col("im")).alias(
                "m2"
            ),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("m2").alias("e"))
    )
    # bounded: both windows partition by doc_id over exactly 4 band rows
    ranked = bands.select(
        "doc_id",
        "b",
        "e",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy("e", "b"))
        .alias("rn"),
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy(F.desc("e"), "b"))
        .alias("rd"),
    )
    # med2 as a same-partition window sum (NOT a groupBy + self-join,
    # which would recompute the decode branch on both join sides)
    withmed = ranked.withColumn(
        "med2",
        F.sum(
            F.when(F.col("rn").isin(2, 3), F.col("e")).otherwise(F.lit(0))
        ).over(Window.partitionBy("doc_id")),
    )
    return (
        withmed.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    2 * F.col("e") > F.col("med2"),
                    F.expr("shiftleft(1, b)"),
                ).otherwise(F.lit(0))
            )
            .cast("int")
            .alias("fingerprint"),
            F.sum(F.when(F.col("rd") == 1, F.col("b")).otherwise(F.lit(0)))
            .cast("int")
            .alias("dominant_band"),
            F.sum(F.when(F.col("b") == 0, F.col("e")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("band_e0"),
            F.sum(F.when(F.col("b") == 1, F.col("e")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("band_e1"),
            F.sum(F.when(F.col("b") == 2, F.col("e")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("band_e2"),
            F.sum(F.when(F.col("b") == 3, F.col("e")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("band_e3"),
        )
    )
