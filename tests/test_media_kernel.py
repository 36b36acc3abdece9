"""kernel/media.py — pure-Python codec round trips and header parses."""

import struct
import zlib

import numpy as np
import pytest

from vulnerablecode_spark.kernel import media as M


def _rng(seed=7):
    return np.random.default_rng(seed)


class TestPngRoundTrip:
    @pytest.mark.parametrize("shape", [(5, 3), (5, 3, 1), (4, 7, 2),
                                       (6, 2, 3), (3, 3, 4), (1, 1, 3),
                                       (13, 17, 3)])
    def test_roundtrip_exact(self, shape):
        px = _rng().integers(0, 256, size=shape, dtype=np.uint8)
        out = M.decode_png(M.encode_png(px))
        want = px[:, :, None] if px.ndim == 2 else px
        assert out.shape == want.shape
        assert np.array_equal(out, want)

    def test_all_filter_types_decode(self):
        # Hand-build a PNG whose five rows use filter types 0..4 so the
        # decoder's Sub/Up/Average/Paeth paths are each exercised.
        w, h = 4, 5
        px = _rng(3).integers(0, 256, size=(h, w), dtype=np.uint8)
        rows = bytearray()
        prev = np.zeros(w, dtype=np.uint8)
        for y in range(h):
            row = px[y]
            f = y % 5
            rows.append(f)
            if f == 0:
                enc = row
            elif f == 1:  # Sub
                enc = np.concatenate([row[:1], (row[1:].astype(int)
                                                - row[:-1]) % 256])
            elif f == 2:  # Up
                enc = (row.astype(int) - prev) % 256
            elif f == 3:  # Average
                enc = np.empty(w, dtype=int)
                for x in range(w):
                    left = int(row[x - 1]) if x else 0
                    enc[x] = (int(row[x]) - (left + int(prev[x])) // 2) % 256
            else:  # Paeth
                enc = np.empty(w, dtype=int)
                for x in range(w):
                    a = int(row[x - 1]) if x else 0
                    b = int(prev[x])
                    c = int(px[y - 1, x - 1]) if (x and y) else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc[x] = (int(row[x]) - pred) % 256
            rows.extend(np.asarray(enc, dtype=np.uint8).tobytes())
            prev = row

        def chunk(ctype, data):
            crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
            return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        payload = (M.PNG_SIG + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", zlib.compress(bytes(rows)))
                   + chunk(b"IEND", b""))
        assert np.array_equal(M.decode_png(payload)[:, :, 0], px)

    def test_palette_expansion(self):
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
        idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
        rows = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

        def chunk(ctype, data):
            crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
            return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
        payload = (M.PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
                   + chunk(b"IDAT", zlib.compress(rows)) + chunk(b"IEND", b""))
        out = M.decode_png(payload)
        assert out[0, 0].tolist() == [255, 0, 0]
        assert out[0, 1].tolist() == [0, 255, 0]
        assert out[1, 0].tolist() == [0, 0, 255]

    def test_header_parse(self):
        b = M.encode_png(np.zeros((9, 11, 3), dtype=np.uint8))
        meta = M.parse_media_header(b)
        assert meta["media_format"] == "png"
        assert (meta["width"], meta["height"]) == (11, 9)
        assert meta["n_channels"] == 3 and meta["bit_depth"] == 8
        assert meta["n_frames"] == 1

    def test_rejects_garbage(self):
        with pytest.raises(M.MediaError):
            M.decode_png(b"not a png at all")


class TestBmpRoundTrip:
    @pytest.mark.parametrize("shape", [(3, 3, 3), (5, 2, 3), (2, 5, 3),
                                       (7, 7, 3)])
    def test_roundtrip_exact(self, shape):
        px = _rng(11).integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(M.decode_bmp(M.encode_bmp(px)), px)

    def test_header_parse(self):
        b = M.encode_bmp(np.zeros((4, 6, 3), dtype=np.uint8))
        meta = M.parse_media_header(b)
        assert meta["media_format"] == "bmp"
        assert (meta["width"], meta["height"]) == (6, 4)
        assert meta["bit_depth"] == 24


class TestWavRoundTrip:
    def test_roundtrip_exact(self):
        s = _rng(5).integers(-32768, 32767, size=(100, 2), dtype=np.int16)
        out, rate = M.decode_wav(M.encode_wav(s, 16000))
        assert rate == 16000
        assert np.array_equal(out, s)

    def test_mono_1d(self):
        s = np.arange(-50, 50, dtype=np.int16)
        out, rate = M.decode_wav(M.encode_wav(s, 8000))
        assert out.shape == (100, 1)
        assert np.array_equal(out[:, 0], s)

    def test_header_parse(self):
        b = M.encode_wav(np.zeros((250, 2), dtype=np.int16), 44100)
        meta = M.parse_media_header(b)
        assert meta["media_format"] == "wav"
        assert meta["sample_rate"] == 44100
        assert meta["n_channels"] == 2
        assert meta["bit_depth"] == 16
        assert meta["n_samples"] == 250


class TestJpegGifHeaders:
    def test_jpeg_sof_parse(self):
        # Minimal-but-valid marker stream: SOI, APP0, DQT(fake), SOF0, SOS.
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
        sof0 = (b"\xff\xc0" + struct.pack(">H", 17) + bytes([8])
                + struct.pack(">HH", 120, 200) + bytes([3])
                + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
        payload = b"\xff\xd8" + app0 + sof0 + b"\xff\xda" + struct.pack(">H", 2)
        meta = M.parse_media_header(payload)
        assert meta["media_format"] == "jpeg"
        assert (meta["width"], meta["height"]) == (200, 120)
        assert meta["n_channels"] == 3 and meta["bit_depth"] == 8

    def test_jpeg_without_sof_degrades_to_bin(self):
        # header parsing is TOTAL over mixed binary columns: corrupt
        # payloads degrade to the opaque row, they never raise
        meta = M.parse_media_header(b"\xff\xd8\xff\xda" + struct.pack(">H", 2))
        assert meta["media_format"] == "bin"
        assert meta["width"] is None

    def test_truncated_headers_never_raise(self):
        for blob in (b"GIF89a", b"BM" + b"\x00" * 25,
                     b"RIFF\x04\x00\x00\x00WAVE", M.PNG_SIG + b"trunc"):
            M.parse_media_header(blob)  # total: any outcome but a raise

    def test_decoders_raise_media_error_on_truncation(self):
        blobs = [
            (M.decode_png, M.PNG_SIG + b"\x00\x00\x00\x0dIHDR" + b"\x00" * 6),
            (M.decode_wav, b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
             + struct.pack("<I", 16)
             + struct.pack("<HHIIHH", 1, 0, 0, 0, 0, 16)
             + b"data" + struct.pack("<I", 0)),
            (M.decode_bmp, M.encode_bmp(
                __import__("numpy").zeros((4, 4, 3), "uint8"))[:40]),
        ]
        for fn, blob in blobs:
            with pytest.raises(M.MediaError):  # never struct.error/ValueError
                fn(blob)

    def test_rle8_long_skip_roundtrip(self):
        # regression: a >255-pixel unchanged span before a late change
        # must not desynchronize encoder x from the decoder canvas
        np = __import__("numpy")
        f0 = np.zeros((3, 600), np.uint8)
        f1 = f0.copy(); f1[2, 500] = 77
        frames, _ = M.decode_avi_rle8(M.encode_avi_rle8(np.stack([f0, f1])))
        assert (frames[1][..., 0] == f1).all()
        assert (frames[0][..., 0] == f0).all()

    def _gif(self, n_frames, local_ct=False, gct=True):
        packed = 0x80 | 0x01 if gct else 0x00  # GCT flag, size 2<<1
        out = bytearray(b"GIF89a" + struct.pack("<HH", 33, 21)
                        + bytes([packed, 0, 0]))
        if gct:
            out += bytes(3 * 4)
        # graphic-control extension before each frame
        for _ in range(n_frames):
            out += b"\x21\xf9\x04" + bytes(4) + b"\x00"
            lpacked = 0x81 if local_ct else 0  # local table size 2<<1
            out += (b"\x2c" + struct.pack("<HHHH", 0, 0, 33, 21)
                    + bytes([lpacked]))
            if local_ct:
                out += bytes(3 * 4)
            out += bytes([2])             # LZW min code size
            out += bytes([3, 1, 2, 3, 0])  # one data sub-block + terminator
        out += b"\x3b"
        return bytes(out)

    @pytest.mark.parametrize("n,local_ct", [(1, False), (3, False),
                                            (2, True), (5, True)])
    def test_gif_frame_count(self, n, local_ct):
        meta = M.parse_media_header(self._gif(n, local_ct=local_ct))
        assert meta["media_format"] == "gif"
        assert (meta["width"], meta["height"]) == (33, 21)
        assert meta["n_frames"] == n


class TestResize:
    def test_downscale_exact_factor(self):
        px = np.arange(64, dtype=np.uint8).reshape(8, 8)
        out = M.resize_nearest(px, 4, 4)
        assert out.shape == (4, 4)
        assert np.array_equal(out, px[::2, ::2])

    def test_upscale(self):
        px = np.array([[1, 2], [3, 4]], dtype=np.uint8)
        out = M.resize_nearest(px, 4, 4)
        assert out.shape == (4, 4)
        assert np.array_equal(out, np.repeat(np.repeat(px, 2, 0), 2, 1))

    def test_channels_preserved(self):
        px = _rng(2).integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
        assert M.resize_nearest(px, 3, 5).shape == (5, 3, 3)


class TestSniff:
    def test_formats(self):
        assert M.sniff_format(M.encode_png(np.zeros((1, 1), np.uint8))) == "png"
        assert M.sniff_format(M.encode_bmp(np.zeros((1, 1, 3), np.uint8))) == "bmp"
        assert M.sniff_format(M.encode_wav(np.zeros(4, np.int16), 8000)) == "wav"
        assert M.sniff_format(b"GIF89a" + bytes(10)) == "gif"
        assert M.sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"
        assert M.sniff_format(b"plain text") == "bin"
        assert M.sniff_format(b"") == "bin"

    def test_total_over_garbage(self):
        meta = M.parse_media_header(b"\x00\x01\x02")
        assert meta["media_format"] == "bin"
        assert meta["width"] is None


class TestGifDecode:
    def test_roundtrip_multi_frame(self):
        f = _rng(21).integers(0, 256, size=(4, 7, 11), dtype=np.uint8)
        out = M.decode_gif(M.encode_gif(f))
        assert out.shape == (4, 7, 11, 3)
        for ch in range(3):  # gray palette: every channel equals the index
            assert np.array_equal(out[..., ch], f)

    def test_interlaced(self):
        f = _rng(22).integers(0, 256, size=(1, 16, 5), dtype=np.uint8)
        out = M.decode_gif(M.encode_gif(f, interlace=True))
        assert np.array_equal(out[0, :, :, 0], f[0])

    def test_known_minimal_lzw_stream(self):
        # canonical "smallest GIF" LZW payload: mcs=2, bytes 4C 01 → [1]
        assert M._lzw_decode(2, bytes([0x4C, 0x01]), 1) == [1]

    def test_lzw_code_growth_and_reset(self):
        pix = _rng(23).integers(0, 250, size=30000, dtype=np.uint8)
        enc = M._lzw_encode(8, pix)
        assert M._lzw_decode(8, enc, len(pix)) == pix.tolist()
        rep = np.tile(np.arange(16, dtype=np.uint8), 2000)  # 32k pixels
        enc_rep = M._lzw_encode(8, rep)
        assert M._lzw_decode(8, enc_rep, len(rep)) == rep.tolist()
        assert len(enc_rep) < len(rep) // 4  # actually compresses repeats

    def test_subrect_frame_composes_on_canvas(self):
        # frame 2 only covers a 1×2 region at (1,1); rest keeps frame 1
        base = np.zeros((1, 3, 4), dtype=np.uint8) + 7
        b = bytearray(M.encode_gif(base))
        # append a second image descriptor: left=1, top=1 sub-rectangle
        assert b.endswith(b"\x3b")
        del b[-1:]
        sub = np.array([[5, 6]], dtype=np.uint8)
        body = M._lzw_encode(8, sub.ravel())
        b += (b"\x2c" + struct.pack("<HHHH", 1, 1, 2, 1) + bytes([0])
              + bytes([8]) + bytes([len(body)]) + body + b"\x00\x3b")
        out = M.decode_gif(bytes(b))
        assert out.shape[0] == 2
        assert np.array_equal(out[0, :, :, 0], np.full((3, 4), 7))
        want = np.full((3, 4), 7)
        want[1, 1:3] = [5, 6]
        assert np.array_equal(out[1, :, :, 0], want)

    def test_transparency_keeps_canvas(self):
        base = np.full((1, 2, 2), 9, dtype=np.uint8)
        b = bytearray(M.encode_gif(base))
        del b[-1:]
        # GCE with transparency flag, transparent index 3
        b += b"\x21\xf9\x04\x01\x00\x00\x03\x00"
        sub = np.array([[3, 4], [3, 4]], dtype=np.uint8)  # 3s transparent
        body = M._lzw_encode(8, sub.ravel())
        b += (b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + bytes([0])
              + bytes([8]) + bytes([len(body)]) + body + b"\x00\x3b")
        out = M.decode_gif(bytes(b))
        assert out[1, :, :, 0].tolist() == [[9, 4], [9, 4]]

    def test_frame_count_matches_decode(self):
        f = _rng(24).integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
        payload = M.encode_gif(f)
        assert M.parse_media_header(payload)["n_frames"] == 5
        assert M.decode_gif(payload).shape[0] == 5

    def test_rejects_garbage(self):
        with pytest.raises(M.MediaError):
            M.decode_gif(b"GIF89a" + bytes(20))


class TestJpegCodec:
    """Real baseline JPEG: exact on constant 8×8 blocks, bounded error in
    general, spec-shaped failure modes."""

    def test_constant_blocks_roundtrip_exact(self):
        rng = np.random.default_rng(7)
        for _ in range(10):
            h8, w8 = int(rng.integers(1, 4)), int(rng.integers(1, 4))
            vals = rng.integers(0, 256, size=(h8, w8))
            img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
            dec = M.decode_jpeg(M.encode_jpeg(img))
            assert dec.shape == (h8 * 8, w8 * 8, 1)
            assert np.array_equal(dec[:, :, 0], img)

    def test_arbitrary_image_error_bounded(self):
        # all-ones quant table: only FDCT rounding loss — ±0.5 per
        # coefficient bounds the pixel error to a few counts
        img = np.random.default_rng(11).integers(
            0, 256, size=(37, 29), dtype=np.uint8)
        dec = M.decode_jpeg(M.encode_jpeg(img))[:, :, 0]
        assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 4

    def test_non_multiple_of_8_dims_crop(self):
        img = np.full((9, 17), 200, dtype=np.uint8)
        dec = M.decode_jpeg(M.encode_jpeg(img))
        assert dec.shape == (9, 17, 1)
        assert np.array_equal(dec[:, :, 0], img)

    def test_header_parse_of_own_output(self):
        enc = M.encode_jpeg(np.zeros((16, 24), dtype=np.uint8))
        meta = M.parse_media_header(enc)
        assert (meta["media_format"], meta["width"], meta["height"],
                meta["n_channels"], meta["bit_depth"]) == ("jpeg", 24, 16,
                                                           1, 8)

    def test_decode_image_dispatches_jpeg(self):
        img = np.full((8, 8), 77, dtype=np.uint8)
        assert np.array_equal(
            M.decode_image(M.encode_jpeg(img))[:, :, 0], img)

    def test_truncated_scan_raises(self):
        enc = M.encode_jpeg(np.full((8, 8), 130, dtype=np.uint8))
        with pytest.raises(M.MediaError):
            M.decode_jpeg(enc[:len(enc) - 4] )

    def test_color_roundtrip_bounded(self):
        # JFIF YCbCr 4:4:4: two rounded color transforms + FDCT rounding
        rgb = np.random.default_rng(3).integers(
            0, 256, size=(24, 16, 3), dtype=np.uint8)
        dec = M.decode_jpeg(M.encode_jpeg(rgb))
        assert dec.shape == (24, 16, 3)
        assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= 3

    def test_color_header_parse(self):
        enc = M.encode_jpeg(np.zeros((32, 24, 3), dtype=np.uint8))
        meta = M.parse_media_header(enc)
        assert (meta["width"], meta["height"], meta["n_channels"]) == (
            24, 32, 3)

    def test_sof_sos_component_mismatch_rejected(self):
        # SOF claiming 3 components over a 1-component scan must refuse
        enc = bytearray(M.encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
        sof = enc.find(b"\xff\xc0")
        enc[sof + 9] = 3  # ncomp
        with pytest.raises(M.MediaError):
            M.decode_jpeg(bytes(enc))

    def test_420_constant_color(self):
        # constant chroma → the 2×2 box average is lossless; only the two
        # color transforms and FDCT rounding remain
        rgb = np.full((20, 28, 3), (180, 40, 99), dtype=np.uint8)
        dec = M.decode_jpeg(M.encode_jpeg(rgb, subsampling="420"))
        assert dec.shape == (20, 28, 3)
        assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= 2

    def test_420_preserves_luma_detail(self):
        # a gray gradient carried in a color container: chroma is flat 128,
        # so 4:2:0 must reproduce the full-resolution luma exactly
        g = np.fromfunction(lambda y, x: (x * 3 + y * 2) % 256,
                            (24, 40)).astype(np.uint8)
        rgb = np.stack([g, g, g], axis=-1)
        dec = M.decode_jpeg(M.encode_jpeg(rgb, subsampling="420"))
        assert np.array_equal(dec, rgb)

    def test_420_odd_dims(self):
        rgb = np.random.default_rng(9).integers(
            0, 256, size=(13, 17, 3), dtype=np.uint8)
        dec = M.decode_jpeg(M.encode_jpeg(rgb, subsampling="420"))
        assert dec.shape == (13, 17, 3)

    def test_422_roundtrip(self):
        # 4:2:2: horizontal-only chroma halving (the broadcast-video layout)
        rgb = np.full((20, 28, 3), (180, 40, 99), dtype=np.uint8)
        dec = M.decode_jpeg(M.encode_jpeg(rgb, subsampling="422"))
        assert dec.shape == (20, 28, 3)
        assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= 2
        g = np.fromfunction(lambda y, x: (x * 3 + y * 2) % 256,
                            (24, 40)).astype(np.uint8)
        gray_rgb = np.stack([g, g, g], axis=-1)
        dec = M.decode_jpeg(M.encode_jpeg(gray_rgb, subsampling="422"))
        assert np.array_equal(dec, gray_rgb)  # luma detail fully preserved

    def test_unsupported_sampling_rejected(self):
        # vertical-only 1×2 chroma halving: outside the supported layouts
        enc = bytearray(M.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
        sof = enc.find(b"\xff\xc0")
        enc[sof + 11] = 0x12  # component 1 sampling → 1×2
        with pytest.raises(M.MediaError):
            M.decode_jpeg(bytes(enc))


class TestAviMjpeg:
    """Motion-JPEG AVI: real container walk + per-frame JPEG decode."""

    def test_roundtrip_bounded(self):
        frames = np.stack([
            np.full((16, 24, 3), (40 * i + 10, 200 - 30 * i, 90),
                    dtype=np.uint8)
            for i in range(4)
        ])
        dec, fps = M.decode_avi_mjpeg(M.encode_avi_mjpeg(frames, fps=12))
        assert dec.shape == (4, 16, 24, 3) and fps == 12
        assert int(np.abs(dec.astype(int) - frames.astype(int)).max()) <= 2

    def test_header_parse(self):
        frames = np.zeros((3, 8, 16, 3), dtype=np.uint8)
        meta = M.parse_media_header(M.encode_avi_mjpeg(frames, fps=25))
        assert (meta["media_format"], meta["width"], meta["height"],
                meta["n_frames"], meta["sample_rate"]) == ("avi", 16, 8,
                                                           3, 25)

    def test_gray_frames_as_video(self):
        g = np.random.default_rng(13).integers(
            0, 256, size=(3, 16, 16), dtype=np.uint8)
        dec, _ = M.decode_avi_mjpeg(M.encode_avi_mjpeg(
            g, subsampling="444"))
        assert int(np.abs(dec[..., 0].astype(int) - g.astype(int)).max()) <= 3

    def test_rejects_wav(self):
        wav = M.encode_wav(np.zeros((10, 1), dtype=np.int16), 8000)
        with pytest.raises(M.MediaError):
            M.decode_avi_mjpeg(wav)

    def test_truncated_raises(self):
        enc = M.encode_avi_mjpeg(np.zeros((2, 8, 8, 3), dtype=np.uint8))
        with pytest.raises(M.MediaError):
            M.decode_avi_mjpeg(enc[:60] )


class TestAviRle8:
    """Microsoft RLE8 AVI: a REAL inter-frame codec — delta/skip escapes
    reuse the persistent canvas (temporal prediction), frame 0 keys."""

    @staticmethod
    def _sprite_frames(n=8, h=32, w=48, seed=11):
        rng = np.random.default_rng(seed)
        bg = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        frames = []
        for t in range(n):
            f = bg.copy()
            f[5:12, 4 + 4 * t:10 + 4 * t] = 255
            frames.append(f)
        return np.stack(frames)

    def test_roundtrip_exact(self):
        frames = self._sprite_frames()
        dec, fps = M.decode_avi(M.encode_avi_rle8(frames, fps=12))
        assert fps == 12
        assert np.array_equal(dec, frames[..., None].repeat(3, 3))

    def test_delta_frames_are_small(self):
        # static background + moving sprite: every non-key frame must be
        # an order of magnitude smaller than the key frame — the
        # inter-frame property itself, asserted on the wire
        frames = self._sprite_frames()
        flipped = frames[:, ::-1, :]
        key = len(M._rle8_encode_frame(flipped[0], None))
        deltas = [len(M._rle8_encode_frame(flipped[i], flipped[i - 1]))
                  for i in range(1, len(frames))]
        assert all(d < key / 5 for d in deltas), (key, deltas)

    def test_random_frames_roundtrip(self):
        rnd = np.random.default_rng(7).integers(
            0, 256, size=(3, 17, 23), dtype=np.uint8)
        dec, _ = M.decode_avi(M.encode_avi_rle8(rnd))
        assert np.array_equal(dec, rnd[..., None].repeat(3, 3))

    def test_header_parse(self):
        meta = M.parse_media_header(M.encode_avi_rle8(
            np.zeros((3, 8, 16), dtype=np.uint8), fps=25))
        assert (meta["media_format"], meta["width"], meta["height"],
                meta["n_frames"], meta["sample_rate"]) == ("avi", 16, 8,
                                                           3, 25)

    def test_dispatcher_routes_both_codecs(self):
        rgb = np.zeros((2, 8, 8, 3), dtype=np.uint8)
        mjpg, _ = M.decode_avi(M.encode_avi_mjpeg(rgb))
        rle, _ = M.decode_avi(M.encode_avi_rle8(rgb))
        assert mjpg.shape == rle.shape == (2, 8, 8, 3)

    def test_unknown_compression_rejected(self):
        enc = bytearray(M.encode_avi_rle8(np.zeros((1, 8, 8),
                                                   dtype=np.uint8)))
        strf = enc.find(b"strf")
        # biCompression lives 16 bytes into the BITMAPINFOHEADER
        enc[strf + 8 + 16:strf + 8 + 20] = b"H264"
        with pytest.raises(M.MediaError):
            M.decode_avi(bytes(enc))


class TestAviRle8Properties:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.integers(1, 5), st.integers(1, 24), st.integers(1, 24),
           st.integers(0, 2**32 - 1))
    @settings(max_examples=30, deadline=None)
    def test_roundtrip_any_shape(self, n, h, w, seed):
        frames = np.random.default_rng(seed).integers(
            0, 256, size=(n, h, w), dtype=np.uint8)
        dec, _ = M.decode_avi(M.encode_avi_rle8(frames))
        assert np.array_equal(dec, frames[..., None].repeat(3, 3))

    @given(st.integers(0, 2**32 - 1), st.integers(2, 6))
    @settings(max_examples=20, deadline=None)
    def test_sparse_deltas_roundtrip(self, seed, n):
        # frames that differ from their predecessor in a few random
        # rectangles — the skip/delta escape paths under fuzz
        rng = np.random.default_rng(seed)
        h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
        frames = [rng.integers(0, 256, size=(h, w)).astype(np.uint8)]
        for _ in range(n - 1):
            f = frames[-1].copy()
            for _ in range(int(rng.integers(0, 4))):
                y0 = int(rng.integers(0, h)); x0 = int(rng.integers(0, w))
                y1 = int(rng.integers(y0, h)) + 1
                x1 = int(rng.integers(x0, w)) + 1
                f[y0:y1, x0:x1] = int(rng.integers(0, 256))
            frames.append(f)
        frames = np.stack(frames)
        dec, _ = M.decode_avi(M.encode_avi_rle8(frames))
        assert np.array_equal(dec, frames[..., None].repeat(3, 3))


class TestMediaProperties:
    """Hypothesis properties: codec round trips over arbitrary shapes and
    totality of the header parser over arbitrary bytes."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.integers(1, 24), st.integers(1, 24),
           st.sampled_from([1, 2, 3, 4]), st.integers(0, 2**32 - 1))
    @settings(max_examples=60, deadline=None)
    def test_png_roundtrip_any_shape(self, h, w, ch, seed):
        px = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, ch), dtype=np.uint8)
        assert np.array_equal(M.decode_png(M.encode_png(px)), px)

    @given(st.integers(1, 16), st.integers(1, 16), st.integers(1, 4),
           st.integers(0, 2**32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_gif_roundtrip_any_shape(self, h, w, n, seed):
        f = np.random.default_rng(seed).integers(
            0, 256, size=(n, h, w), dtype=np.uint8)
        out = M.decode_gif(M.encode_gif(f))
        assert out.shape == (n, h, w, 3)
        assert np.array_equal(out[..., 0], f)

    @given(st.integers(1, 500), st.sampled_from([1, 2, 4]),
           st.sampled_from([8000, 16000, 44100]), st.integers(0, 2**32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_wav_roundtrip_any_shape(self, n, ch, rate, seed):
        s = np.random.default_rng(seed).integers(
            -32768, 32768, size=(n, ch), dtype=np.int16)
        out, got_rate = M.decode_wav(M.encode_wav(s, rate))
        assert got_rate == rate and np.array_equal(out, s)

    @given(st.binary(max_size=2048))
    @settings(max_examples=300, deadline=None)
    def test_header_parse_total_over_garbage(self, b):
        # over arbitrary bytes the parser either returns typed metadata or
        # raises MediaError — never IndexError/struct.error/infinite loop
        try:
            meta = M.parse_media_header(b)
        except M.MediaError:
            return
        # the full documented codomain — 'avi' included (RIFF/'AVI ')
        assert meta["media_format"] in ("png", "jpeg", "gif", "bmp",
                                        "wav", "avi", "bin")

    @given(st.binary(max_size=2048))
    @settings(max_examples=200, deadline=None)
    def test_png_decoder_total_over_garbage(self, b):
        # arbitrary bytes behind a PNG signature: decode either succeeds
        # or raises MediaError (zlib/struct/range errors all wrapped)
        try:
            M.decode_png(b"\x89PNG\r\n\x1a\n" + b)
        except M.MediaError:
            pass

    @given(st.integers(2, 8), st.lists(st.integers(0, 3), min_size=1,
                                       max_size=2000))
    @settings(max_examples=60, deadline=None)
    def test_lzw_roundtrip(self, mcs, pixels):
        enc = M._lzw_encode(mcs, pixels)
        assert M._lzw_decode(mcs, enc, len(pixels)) == pixels

    @given(st.binary(max_size=2048))
    @settings(max_examples=200, deadline=None)
    def test_jpeg_decoder_total_over_garbage(self, b):
        # arbitrary bytes behind a JPEG SOI: decode either succeeds or
        # raises MediaError — never an unwrapped IndexError/struct.error
        try:
            M.decode_jpeg(b"\xff\xd8\xff" + b)
        except M.MediaError:
            pass


class TestJpegProgressive:
    """Spectral-selection progressive JPEG (SOF2, Ah=Al=0)."""

    def test_gray_constant_blocks_exact(self):
        rng = np.random.default_rng(21)
        vals = rng.integers(0, 256, size=(2, 3))
        img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
        dec = M.decode_jpeg(M.encode_jpeg_progressive(img))
        assert np.array_equal(dec[:, :, 0], img)

    def test_matches_sequential_decode(self):
        # same source, same tables: the two scan scripts must reconstruct
        # the identical image
        g = np.random.default_rng(22).integers(
            0, 256, size=(19, 27), dtype=np.uint8)
        seq = M.decode_jpeg(M.encode_jpeg(g))
        prog = M.decode_jpeg(M.encode_jpeg_progressive(g))
        assert np.array_equal(seq, prog)

    def test_color_roundtrip_bounded(self):
        rgb = np.random.default_rng(23).integers(
            0, 256, size=(24, 16, 3), dtype=np.uint8)
        dec = M.decode_jpeg(M.encode_jpeg_progressive(rgb))
        assert dec.shape == (24, 16, 3)
        assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= 3

    def test_eob_run_spans_blocks(self):
        # Hand-craft an AC scan that covers BOTH all-zero-AC blocks with a
        # single EOB2 symbol (r=1 + one 0 extension bit) — the EOBn path a
        # foreign progressive encoder emits but ours does not.
        img = np.full((8, 16), 77, dtype=np.uint8)  # 2 constant blocks
        enc = bytearray(M.encode_jpeg_progressive(img))
        # locate the AC scan: second SOS marker
        first = enc.find(b"\xff\xda")
        second = enc.find(b"\xff\xda", first + 2)
        assert second > 0
        (seglen,) = __import__("struct").unpack_from(">H", enc, second + 2)
        ac_codes = M._huff_codes(M._JPEG_AC_BITS, M._JPEG_AC_SYMS)
        code, length = ac_codes[0x10]  # EOB2
        assert length == 8
        bits = f"{code:08b}" + "0"       # + 1 extension bit (value 0)
        bits += "1" * (16 - len(bits))   # pad to 2 bytes with 1s
        payload = bytes(int(bits[i:i + 8], 2) for i in (0, 8))
        crafted = (bytes(enc[:second + 2 + seglen]) + payload
                   + b"\xff\xd9")
        dec = M.decode_jpeg(crafted)
        assert np.array_equal(dec[:, :, 0], img)

    def test_inconsistent_approximation_rejected(self):
        # Ah must equal Al+1 in a refinement scan — Ah=3/Al=1 is malformed
        img = np.full((8, 8), 10, dtype=np.uint8)
        enc = bytearray(M.encode_jpeg_progressive(img))
        sos = enc.find(b"\xff\xda")
        (seglen,) = __import__("struct").unpack_from(">H", enc, sos + 2)
        enc[sos + 2 + seglen - 1] = 0x31  # Ah/Al byte of the DC scan
        with pytest.raises(M.MediaError):
            M.decode_jpeg(bytes(enc))


class TestJpegSuccessiveApproximation:
    """Progressive scans with point transform + refinement (Ah=Al+1) —
    the scan structure virtually every real-world progressive JPEG uses."""

    def test_decode_equals_non_sa_decode(self):
        # SA transmits every coefficient bit across scans, so the decoded
        # image must be IDENTICAL to the Ah=Al=0 decode of the same source
        rng = np.random.default_rng(31)
        img = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
        base = M.decode_jpeg(M.encode_jpeg_progressive(img))
        for al in (1, 2, 3):
            sa = M.decode_jpeg(M.encode_jpeg_progressive(img, point_al=al))
            assert np.array_equal(base, sa), f"al={al}"

    def test_color_decode_equals_non_sa(self):
        rgb = np.random.default_rng(32).integers(
            0, 256, size=(24, 16, 3), dtype=np.uint8)
        base = M.decode_jpeg(M.encode_jpeg_progressive(rgb))
        sa = M.decode_jpeg(M.encode_jpeg_progressive(rgb, point_al=2))
        assert np.array_equal(base, sa)

    def test_constant_blocks_exact(self):
        # DC-only content survives the full SA scan script bit-exactly
        vals = np.random.default_rng(33).integers(0, 256, size=(2, 3))
        img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
        dec = M.decode_jpeg(M.encode_jpeg_progressive(img, point_al=2))
        assert np.array_equal(dec[:, :, 0], img)

    def test_sparse_high_frequency_exercises_zrl_refinement(self):
        # one bright pixel per block → long zero runs in every AC band,
        # driving the ZRL / correction-bit interleave in refinement scans
        img = np.zeros((24, 24), dtype=np.uint8)
        img[::8, ::8] = 255
        base = M.decode_jpeg(M.encode_jpeg_progressive(img))
        sa = M.decode_jpeg(M.encode_jpeg_progressive(img, point_al=3))
        assert np.array_equal(base, sa)


class TestJpegSaProperties:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**32 - 1),
           st.integers(1, 3))
    @settings(max_examples=40, deadline=None)
    def test_sa_decode_equals_non_sa_any_shape(self, h, w, seed, al):
        px = np.random.default_rng(seed).integers(
            0, 256, size=(h, w), dtype=np.uint8)
        base = M.decode_jpeg(M.encode_jpeg_progressive(px))
        sa = M.decode_jpeg(M.encode_jpeg_progressive(px, point_al=al))
        assert np.array_equal(base, sa)


class TestJpegProperties:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**32 - 1),
           st.booleans())
    @settings(max_examples=40, deadline=None)
    def test_gray_roundtrip_bounded_any_shape(self, h, w, seed, progressive):
        px = np.random.default_rng(seed).integers(
            0, 256, size=(h, w), dtype=np.uint8)
        enc = (M.encode_jpeg_progressive(px) if progressive
               else M.encode_jpeg(px))
        dec = M.decode_jpeg(enc)
        assert dec.shape == (h, w, 1)
        assert int(np.abs(dec[:, :, 0].astype(int) - px.astype(int)).max()) <= 4

    @given(st.integers(1, 16), st.integers(1, 16), st.integers(0, 2**32 - 1),
           st.sampled_from(["444", "422", "420"]))
    @settings(max_examples=30, deadline=None)
    def test_color_roundtrip_bounded_any_shape(self, h, w, seed, sub):
        # constant-color images: subsampling is lossless on flat chroma, so
        # every layout must stay within transform+DCT rounding error
        rgb = np.full((h, w, 3), np.random.default_rng(seed).integers(
            0, 256, size=3), dtype=np.uint8)
        dec = M.decode_jpeg(M.encode_jpeg(rgb, subsampling=sub))
        assert dec.shape == (h, w, 3)
        assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= 2


class TestMcdc:
    """MCDC: motion-compensated DCT-residual video (the H.26x structural
    shape — macroblock motion search + transform-coded residual against
    the previous RECONSTRUCTION, closed-loop)."""

    def _frames(self):
        np = __import__("numpy")
        rng = np.random.default_rng(7)
        base = rng.integers(0, 255, (48, 64)).astype(np.uint8)
        return np, base

    def test_near_lossless_at_q1(self):
        np, base = self._frames()
        moved = np.roll(base, (3, -2), axis=(0, 1))
        blob = M.encode_avi_mcdc(np.stack([base, moved]), q=1)
        frames, fps = M.decode_avi_mcdc(blob)
        assert frames.shape == (2, 48, 64, 3) and fps == 10
        for i, ref in enumerate((base, moved)):
            err = np.abs(frames[i][..., 0].astype(int) - ref.astype(int))
            assert err.max() <= 2  # float DCT round trip, q=1

    def test_motion_compensation_carries_translation(self):
        # a pure ±window translation is fully captured by the motion
        # search: the P-frame residual is ~zero and its payload is a
        # fraction of the I-frame's
        np, base = self._frames()
        moved = np.roll(base, (5, 5), axis=(0, 1))
        blob_p = M.encode_avi_mcdc(np.stack([base, moved]), q=4)
        blob_ii = M.encode_avi_mcdc(np.stack([base, base]), q=4)
        # locate the two 00dc chunks and compare sizes
        import re
        sizes = [len(m.group(1)) for m in
                 re.finditer(b"00dc(....)", blob_p)]  # header only
        frames, _ = M.decode_avi_mcdc(blob_p)
        interior = np.abs(
            frames[1][8:-8, 8:-8, 0].astype(int)
            - moved[8:-8, 8:-8].astype(int))
        assert interior.max() <= 16  # q=4 quantization, no motion blur

    def test_dispatcher_routes_mcdc(self):
        np, base = self._frames()
        blob = M.encode_avi_mcdc(base[None], q=2)
        frames, _ = M.decode_avi(blob)  # via the fourcc dispatcher
        assert frames.shape == (1, 48, 64, 3)
        meta = M.parse_media_header(blob)
        assert meta["media_format"] == "avi"
        assert (meta["width"], meta["height"], meta["n_frames"]) == (64, 48, 1)

    def test_static_scene_p_frames_cheap(self):
        # a noise I-frame doesn't compress (no entropy coder by design);
        # static-scene P-frames carry only quantization-error refinement
        # toward the source (closed-loop behavior) — five of them must
        # cost far less than one more intra frame
        np, base = self._frames()
        one = len(M.encode_avi_mcdc(base[None], q=4))
        six = len(M.encode_avi_mcdc(np.stack([base] * 6), q=4))
        assert six < one * 1.5  # +5 P-frames ≪ +5 I-frames (+500%)

    def test_non_multiple_of_16_dims(self):
        np, _ = self._frames()
        rng = np.random.default_rng(3)
        odd = rng.integers(0, 255, (2, 37, 53)).astype(np.uint8)
        frames, _ = M.decode_avi_mcdc(M.encode_avi_mcdc(odd, q=2))
        assert frames.shape == (2, 37, 53, 3)
        err = np.abs(frames[0][..., 0].astype(int) - odd[0].astype(int))
        assert err.max() <= 8

    def test_truncated_payload_raises_media_error(self):
        np, base = self._frames()
        blob = M.encode_avi_mcdc(base[None], q=2)
        with pytest.raises(M.MediaError):
            M.decode_avi_mcdc(blob[:len(blob) // 2])


class TestMcdcProperties:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.integers(1, 3), st.integers(9, 40), st.integers(9, 40),
           st.integers(1, 12), st.integers(0, 2**31 - 1))
    @settings(max_examples=25, deadline=None)
    def test_roundtrip_error_bounded_by_quantizer(self, n, h, w, q, seed):
        rng = np.random.default_rng(seed)
        frames = rng.integers(0, 255, (n, h, w)).astype(np.uint8)
        out, fps = M.decode_avi_mcdc(M.encode_avi_mcdc(frames, q=q))
        assert out.shape == (n, h, w, 3)
        err = np.abs(out[..., 0].astype(int) - frames.astype(int))
        # orthonormal DCT: per-coefficient quantization error ≤ q/2;
        # loose per-pixel bound 4q+2 holds with margin across shapes
        assert err.max() <= 4 * q + 2, (err.max(), q)


class TestByteEntropy:
    def test_uniform_and_constant(self, spark):
        from vulnerablecode_spark.llm.multimodal import byte_entropy

        uniform = bytes(range(256)) * 4        # all 16 bins equal
        constant = b"\x00" * 512               # one bin only
        df = spark.createDataFrame(
            [(1, uniform), (2, constant), (3, b"")],
            "doc_id long, payload binary")
        rows = {r.doc_id: r for r in byte_entropy(df).collect()}
        # uniform over 16 bins: H = ln 16 = 2.7725887... -> ~2772589 e6
        # (quantized terms: A=floor(ln1024*1e6+.5), B per bin c=64)
        assert abs(rows[1].h_e6 - 2_772_589) <= 2
        # single-bin payload: true H = 0; the B div t floor leaves the
        # quantization residue 0..1 micro-nat (deterministic)
        assert 0 <= rows[2].h_e6 <= 1
        assert 3 not in rows  # empty payload excluded
        assert rows[1].t_bytes == 1024 and rows[2].t_bytes == 512
