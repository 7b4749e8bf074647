"""Native C++ image decoder (libjpeg/libpng) vs the PIL oracle.

The native decoder replaces the reference's stb_image path
(load_image_from_file, vit.cpp:109-127): forced 3-channel RGB, HWC u8.
Tests build the shared library on first use; if the toolchain is absent
the suite skips (the engine falls back to PIL either way).
"""

import numpy as np
import pytest
from PIL import Image

decoder = pytest.importorskip("vit_cpp_tpu.native.decoder")

import os

MAGPIE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets",
    "magpie.jpeg",
)


def _rand_img(rng, h, w):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


class TestJpeg:
    def test_matches_pil(self):
        got = decoder.decode_rgb(MAGPIE)
        with Image.open(MAGPIE) as im:
            want = np.asarray(im.convert("RGB"), dtype=np.uint8)
        assert got is not None
        assert got.shape == want.shape
        # same libjpeg under both — bit exact
        np.testing.assert_array_equal(got, want)

    def test_grayscale_jpeg_forced_rgb(self, tmp_path):
        rng = np.random.default_rng(0)
        p = tmp_path / "gray.jpg"
        Image.fromarray(_rand_img(rng, 40, 60)).convert("L").save(p)
        got = decoder.decode_rgb(str(p))
        assert got is not None and got.shape == (40, 60, 3)
        # gray replicated into all three channels
        np.testing.assert_array_equal(got[..., 0], got[..., 1])

    def test_decode_bytes(self):
        with open(MAGPIE, "rb") as f:
            data = f.read()
        got = decoder.decode_rgb_bytes(data)
        assert got is not None and got.shape[2] == 3


class TestPng:
    @pytest.mark.parametrize("mode", ["RGB", "RGBA", "L", "P"])
    def test_png_variants(self, tmp_path, mode):
        rng = np.random.default_rng(1)
        img = Image.fromarray(_rand_img(rng, 21, 33)).convert(mode)
        p = tmp_path / f"{mode}.png"
        img.save(p)
        got = decoder.decode_rgb(str(p))
        want = np.asarray(img.convert("RGB"), dtype=np.uint8)
        assert got is not None
        np.testing.assert_array_equal(got, want)

    def test_16bit_png(self, tmp_path):
        rng = np.random.default_rng(2)
        arr16 = rng.integers(0, 65536, (10, 12), dtype=np.uint16)
        p = tmp_path / "deep.png"
        Image.fromarray(arr16, mode="I;16").save(p)
        got = decoder.decode_rgb(str(p))
        assert got is not None and got.shape == (10, 12, 3)


class TestBatch:
    def test_batch_with_failures(self, tmp_path):
        rng = np.random.default_rng(3)
        paths = []
        for i in range(4):
            p = tmp_path / f"{i}.png"
            Image.fromarray(_rand_img(rng, 8 + i, 9 + i)).save(p)
            paths.append(str(p))
        bad = tmp_path / "bad.jpg"
        bad.write_bytes(b"not an image at all")
        paths.insert(2, str(bad))
        outs = decoder.decode_batch(paths, n_threads=3)
        assert len(outs) == 5
        assert outs[2] is None  # failed decode -> skip, like the harness
        for i, j in [(0, 0), (1, 1), (3, 2), (4, 3)]:
            assert outs[i].shape == (8 + j, 9 + j, 3)

    def test_batch_matches_single(self):
        single = decoder.decode_rgb(MAGPIE)
        (batched,) = decoder.decode_batch([MAGPIE])
        np.testing.assert_array_equal(single, batched)


class TestBmpPnm:
    """Native BMP/PNM decode — the stb_image format breadth the reference
    inherits via stbi_load (vit.h:5)."""

    @pytest.mark.parametrize("ext", ["bmp", "ppm", "pgm"])
    def test_matches_pil(self, tmp_path, ext):
        rng = np.random.default_rng(7)
        arr = _rand_img(rng, 23, 31)
        img = Image.fromarray(arr)
        if ext == "pgm":
            img = img.convert("L")
        p = tmp_path / f"img.{ext}"
        img.save(p)
        got = decoder.decode_rgb(str(p))
        want = np.asarray(img.convert("RGB"), dtype=np.uint8)
        assert got is not None
        np.testing.assert_array_equal(got, want)

    def test_truncated_bmp_rejected(self, tmp_path):
        rng = np.random.default_rng(8)
        p = tmp_path / "t.bmp"
        Image.fromarray(_rand_img(rng, 16, 16)).save(p)
        data = p.read_bytes()
        p.write_bytes(data[: len(data) // 2])
        assert decoder.decode_rgb(str(p)) is None


class TestBatchFallback:
    def test_pil_retry_for_non_native_format(self, tmp_path):
        """A GIF in a batch must come back decoded (per-file PIL retry),
        not None — the whole-batch native path alone would skip it."""
        from vit_cpp_tpu.io.image import load_images_rgb_batch

        rng = np.random.default_rng(9)
        jpg = tmp_path / "a.jpg"
        Image.fromarray(_rand_img(rng, 12, 14)).save(jpg)
        gif = tmp_path / "b.gif"
        gif_img = Image.fromarray(_rand_img(rng, 9, 11))
        gif_img.save(gif)
        bad = tmp_path / "c.jpg"
        bad.write_bytes(b"not an image")
        outs = load_images_rgb_batch([str(jpg), str(gif), str(bad)])
        assert outs[0] is not None and outs[0].shape == (12, 14, 3)
        assert outs[1] is not None and outs[1].shape == (9, 11, 3)
        assert outs[2] is None


class TestEngineIntegration:
    def test_load_image_rgb_uses_native(self):
        from vit_cpp_tpu.io.image import load_image_rgb

        native = load_image_rgb(MAGPIE, prefer_native=True)
        pil = load_image_rgb(MAGPIE, prefer_native=False)
        np.testing.assert_array_equal(native, pil)


def test_pil_fallback_when_native_unavailable(monkeypatch):
    """load_image_rgb must fall back to PIL if the native lib can't load."""
    import builtins
    import sys as _sys

    from vit_cpp_tpu.io.image import load_image_rgb

    real_import = builtins.__import__

    def broken_import(name, *a, **k):
        if name.startswith("vit_cpp_tpu.native"):
            raise ImportError("simulated missing toolchain")
        return real_import(name, *a, **k)

    monkeypatch.delitem(_sys.modules, "vit_cpp_tpu.native.decoder", raising=False)
    monkeypatch.delitem(_sys.modules, "vit_cpp_tpu.native", raising=False)
    monkeypatch.setattr(builtins, "__import__", broken_import)
    img = load_image_rgb(MAGPIE)
    assert img.shape == (470, 500, 3)


class TestExoticFormats:
    """r3: native TGA/GIF/PSD/HDR — the remaining stb_image format
    breadth (vit.h:5 -> stb_image.h supports them; r2 covered them only
    via the per-file PIL fallback, and PIL cannot read HDR at all)."""

    @pytest.mark.parametrize("kwargs", [{}, {"rle": True}])
    def test_tga_matches_pil(self, tmp_path, kwargs):
        rng = np.random.default_rng(11)
        arr = _rand_img(rng, 37, 53)
        p = tmp_path / "t.tga"
        Image.fromarray(arr).save(p, **kwargs)
        got = decoder.decode_rgb(str(p))
        assert got is not None
        np.testing.assert_array_equal(got, arr)

    def test_tga_grayscale(self, tmp_path):
        rng = np.random.default_rng(12)
        g = _rand_img(rng, 21, 19)[:, :, 0]
        p = tmp_path / "g.tga"
        Image.fromarray(g, "L").save(p)
        got = decoder.decode_rgb(str(p))
        assert got is not None
        np.testing.assert_array_equal(got, np.stack([g] * 3, axis=-1))

    @pytest.mark.parametrize("interlace", [False, True])
    def test_gif_matches_pil(self, tmp_path, interlace):
        rng = np.random.default_rng(13)
        arr = _rand_img(rng, 37, 53)
        p = tmp_path / "t.gif"
        Image.fromarray(arr).quantize(64).save(p, interlace=interlace)
        want = np.asarray(Image.open(p).convert("RGB"), dtype=np.uint8)
        got = decoder.decode_rgb(str(p))
        assert got is not None
        np.testing.assert_array_equal(got, want)

    @staticmethod
    def _psd_bytes(img, compression):
        import struct

        h, w = img.shape[:2]
        head = (
            b"8BPS" + struct.pack(">H", 1) + b"\0" * 6
            + struct.pack(">HIIHH", 3, h, w, 8, 3)
            + struct.pack(">I", 0) * 3  # color data / resources / layers
        )
        if compression == 0:
            data = struct.pack(">H", 0) + b"".join(
                img[:, :, c].tobytes() for c in range(3)
            )
            return head + data

        def packbits(row):
            out = b""
            i = 0
            while i < len(row):
                n = min(128, len(row) - i)
                out += bytes([n - 1]) + row[i : i + n].tobytes()
                i += n
            return out

        rows = [
            packbits(img[y, :, c]) for c in range(3) for y in range(h)
        ]
        return (
            head + struct.pack(">H", 1)
            + b"".join(struct.pack(">H", len(r)) for r in rows)
            + b"".join(rows)
        )

    @pytest.mark.parametrize("compression", [0, 1])
    def test_psd(self, tmp_path, compression):
        rng = np.random.default_rng(14)
        arr = _rand_img(rng, 17, 29)
        data = self._psd_bytes(arr, compression)
        got = decoder.decode_rgb_bytes(data)
        assert got is not None
        np.testing.assert_array_equal(got, arr)
        # cross-check the raw layout against PIL's PSD reader
        p = tmp_path / "t.psd"
        p.write_bytes(self._psd_bytes(arr, 0))
        want = np.asarray(Image.open(p).convert("RGB"), dtype=np.uint8)
        np.testing.assert_array_equal(got, want)

    @staticmethod
    def _hdr_bytes(rgbe, rle):
        h, w = rgbe.shape[:2]
        head = (
            b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
            + f"-Y {h} +X {w}\n".encode()
        )
        if not rle:
            return head + rgbe.tobytes()
        out = [head]
        for y in range(h):
            out.append(bytes([2, 2, w >> 8, w & 0xFF]))
            for c in range(4):
                row = rgbe[y, :, c].tobytes()
                i = 0
                while i < len(row):  # literal chunks <= 128
                    n = min(128, len(row) - i)
                    out.append(bytes([n]) + row[i : i + n])
                    i += n
        return b"".join(out)

    @pytest.mark.parametrize("rle", [False, True])
    def test_hdr_tonemap(self, rle):
        """Radiance RGBE -> LDR with stb's default tone map (linear
        scale 1, gamma 2.2); PIL has no HDR reader, so the oracle is the
        scalar formula itself."""
        rng = np.random.default_rng(15)
        h, w = 17, 29
        vals = rng.uniform(0, 2, (h, w, 3)).astype(np.float32)
        m = vals.max(-1)
        nz = m >= 1e-32
        e = np.zeros_like(m, np.int32)
        e[nz] = np.ceil(np.log2(m[nz])).astype(np.int32) + 1
        scale = np.where(nz, 2.0 ** (-e + 8), 0)
        rgbe = np.zeros((h, w, 4), np.uint8)
        rgbe[..., :3] = np.clip(vals * scale[..., None], 0, 255).astype(np.uint8)
        rgbe[..., 3] = np.where(nz, e + 128, 0)
        got = decoder.decode_rgb_bytes(self._hdr_bytes(rgbe, rle))
        assert got is not None
        f = np.ldexp(1.0, rgbe[..., 3].astype(np.int32) - 136)
        lin = rgbe[..., :3] * f[..., None]
        want = np.clip(np.round(np.power(lin, 1 / 2.2) * 255), 0, 255).astype(
            np.uint8
        )
        want[rgbe[..., 3] == 0] = 0
        np.testing.assert_array_equal(got, want)

    def test_truncated_exotics_rejected(self):
        rng = np.random.default_rng(16)
        arr = _rand_img(rng, 16, 16)
        psd = self._psd_bytes(arr, 1)
        assert decoder.decode_rgb_bytes(psd[: len(psd) // 2]) is None
        import io as _io

        buf = _io.BytesIO()
        Image.fromarray(arr).save(buf, format="GIF")
        gif = buf.getvalue()
        assert decoder.decode_rgb_bytes(gif[: len(gif) // 2]) is None
