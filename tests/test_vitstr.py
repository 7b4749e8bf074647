"""ViTSTR extension: grayscale preprocess, sequence head, greedy decode, CLI.

Reference behavior from extensions/vitstr.cpp (SURVEY.md C18-C20):
Rec.601 grayscale, truncating bilinear resize, [-1,1] normalize
(vitstr.cpp:128-181); 25-position head; greedy decode from position 1
stopping at '[s]' with product-of-max confidence (vitstr.cpp:1029-1051).
"""

import subprocess
import sys

import numpy as np
import pytest

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models.vitstr import (
    EOS_ID,
    VITSTR_SEQ_LEN,
    VITSTR_VOCAB,
    decode_tokens,
    greedy_decode,
    greedy_decode_device,
    preprocess_grayscale,
    vitstr_id2label,
)


def _ref_preprocess(img_u8: np.ndarray, target: int) -> np.ndarray:
    """Scalar-loop replica of the reference's ViTSTR preprocessing
    (vitstr.cpp:135-181) used to validate the matmul formulation."""
    ny, nx = img_u8.shape[:2]
    gray = np.empty((ny, nx), dtype=np.uint8)
    for y in range(ny):
        for x in range(nx):
            r, g, b = (float(v) for v in img_u8[y, x])
            gray[y, x] = np.uint8(int(0.299 * r + 0.587 * g + 0.114 * b))
    out = np.zeros((target, target), dtype=np.float32)
    xs, ys = nx / target, ny / target
    for y in range(target):
        for x in range(target):
            gx, gy = x * xs, y * ys
            gxi, gyi = int(gx), int(gy)
            u, v = gx - gxi, gy - gyi
            px0 = max(0, min(gxi, nx - 2))
            py0 = max(0, min(gyi, ny - 2))
            val = (
                (1 - u) * (1 - v) * gray[py0, px0]
                + u * (1 - v) * gray[py0, px0 + 1]
                + (1 - u) * v * gray[py0 + 1, px0]
                + u * v * gray[py0 + 1, px0 + 1]
            )
            out[y, x] = (val / 255.0 - 0.5) * 2.0
    return out


class TestVitstrVocab:
    def test_vocab_layout(self):
        # ['[GO]', '[s]'] + string.printable[:-6] = 96 tokens
        # (extensions/vitstr.cpp/convert-pth-to-ggml.py:233-235).
        assert len(VITSTR_VOCAB) == 96
        assert VITSTR_VOCAB[0] == "[GO]"
        assert VITSTR_VOCAB[1] == "[s]"
        assert VITSTR_VOCAB[2] == "0"
        assert vitstr_id2label()[12] == "a"


class TestVitstrPreprocess:
    @pytest.mark.parametrize("hw", [(32, 48), (100, 70), (224, 224)])
    def test_matches_scalar_reference(self, hw):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
        ref = _ref_preprocess(img, 64)
        got = np.asarray(preprocess_grayscale(img, 64))
        assert got.shape == (1, 64, 64)
        np.testing.assert_allclose(got[0], ref, atol=1e-4)


class TestGreedyDecode:
    def _probs(self, ids, n_tokens=96, p=0.9):
        """Build a (S, V) prob grid whose per-position argmax follows ids."""
        s = len(ids)
        probs = np.full((s, n_tokens), (1 - p) / (n_tokens - 1), dtype=np.float64)
        for i, t in enumerate(ids):
            probs[i, t] = p
        return probs

    def test_stops_at_eos(self):
        id2label = vitstr_id2label()
        ids = [0, 12, 13, 14, EOS_ID, 20, 21]  # 'abc' then [s]
        text, conf = greedy_decode(self._probs(ids), id2label)
        assert text == "abc"
        # confidence excludes position 0 and the EOS position
        np.testing.assert_allclose(conf, 0.9**3, rtol=1e-6)

    def test_no_eos_runs_full_length(self):
        id2label = vitstr_id2label()
        ids = [0] + [12] * (VITSTR_SEQ_LEN - 1)
        text, conf = greedy_decode(self._probs(ids), id2label)
        assert text == "a" * (VITSTR_SEQ_LEN - 1)

    def test_device_decode_matches_host(self):
        id2label = vitstr_id2label()
        rng = np.random.default_rng(3)
        # peaked distributions (like real softmax outputs) — a uniform random
        # grid would underflow the f32 confidence product over 24 positions
        batch = rng.random((4, VITSTR_SEQ_LEN, 96)).astype(np.float32)
        peak = rng.integers(0, 96, (4, VITSTR_SEQ_LEN))
        for b in range(4):
            batch[b, np.arange(VITSTR_SEQ_LEN), peak[b]] += 20.0
        batch /= batch.sum(-1, keepdims=True)
        toks, valid, conf = greedy_decode_device(batch)
        for i in range(4):
            t_host, c_host = greedy_decode(batch[i], id2label)
            t_dev = decode_tokens(np.asarray(toks[i]), np.asarray(valid[i]), id2label)
            assert t_dev == t_host
            np.testing.assert_allclose(float(conf[i]), c_host, rtol=1e-5)


@pytest.fixture(scope="module")
def vitstr_model(tmp_path_factory):
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=96,
        patch_size=16,
        img_size=96,
        in_chans=1,
        seq_len=VITSTR_SEQ_LEN,
    )
    path = tmp_path_factory.mktemp("vitstr") / "vitstr.gguf"
    write_synthetic_model(str(path), hp, ftype=1, seed=7, id2label=vitstr_id2label())
    return str(path), hp


class TestVitstrEngine:
    def test_detects_vitstr_and_recognizes(self, vitstr_model, tmp_path):
        from PIL import Image

        from vit_cpp_tpu.engine import VitstrEngine

        path, hp = vitstr_model
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (40, 120, 3), dtype=np.uint8)
        img_path = tmp_path / "word.png"
        Image.fromarray(img).save(img_path)

        engine = VitstrEngine(path, verbose=False)
        assert engine.hp.in_chans == 1
        assert engine.hp.seq_len == VITSTR_SEQ_LEN
        text, conf = engine.recognize_file(str(img_path), verbose=False)
        assert isinstance(text, str)
        assert 0.0 <= conf <= 1.0
        # seq-len readout: probability grid has one row per position
        probs = engine.predict_probs_batch(engine.preprocess_image(img)[None])
        assert probs.shape == (1, VITSTR_SEQ_LEN, 96)
        np.testing.assert_allclose(
            np.asarray(probs).sum(-1), 1.0, rtol=1e-4
        )

    def test_cli_smoke(self, vitstr_model, tmp_path):
        from PIL import Image

        path, hp = vitstr_model
        img_path = tmp_path / "word.png"
        rng = np.random.default_rng(1)
        Image.fromarray(
            rng.integers(0, 256, (32, 100, 3), dtype=np.uint8)
        ).save(img_path)
        proc = subprocess.run(
            [
                sys.executable,
                "-m",
                "vit_cpp_tpu.cli.vitstr",
                "-m",
                path,
                "-i",
                str(img_path),
                "-s",
                "42",
            ],
            capture_output=True,
            text=True,
            timeout=600,
            env=__import__("conftest").CLI_SUBPROCESS_ENV,
        )
        assert proc.returncode == 0, proc.stderr
        assert "score :" in proc.stdout
        assert "model load time" in proc.stderr


class TestVitstrServing:
    def test_batched_preprocess_matches_single(self):
        from vit_cpp_tpu.models.vitstr import (
            preprocess_grayscale,
            preprocess_grayscale_batch,
        )

        rng = np.random.default_rng(4)
        imgs = [
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in [(40, 120), (64, 64), (200, 90)]
        ]
        batched = np.asarray(preprocess_grayscale_batch(imgs, 48))
        assert batched.shape == (3, 1, 48, 48)
        for i, img in enumerate(imgs):
            single = np.asarray(preprocess_grayscale(img, 48))
            np.testing.assert_allclose(batched[i], single, atol=1e-4)

    def test_recognize_files_matches_engine(self, vitstr_model, tmp_path):
        from PIL import Image

        from vit_cpp_tpu.engine import VitstrEngine
        from vit_cpp_tpu.serve import recognize_files

        path, hp = vitstr_model
        rng = np.random.default_rng(5)
        paths = []
        for i in range(5):
            p = tmp_path / f"w{i}.png"
            Image.fromarray(
                rng.integers(0, 256, (30 + i, 90, 3), dtype=np.uint8)
            ).save(p)
            paths.append(str(p))
        bad = tmp_path / "bad.png"
        bad.write_bytes(b"x")
        paths.insert(1, str(bad))

        engine = VitstrEngine(path, verbose=False)
        results = list(recognize_files(engine, paths, batch=3))
        assert [r.path for r in results] == paths
        assert results[1].confidence == -1.0
        for r in results:
            if r.confidence < 0:
                continue
            want_text, want_conf = engine.recognize_file(r.path, verbose=False)
            assert r.text == want_text
            np.testing.assert_allclose(r.confidence, want_conf, rtol=1e-4)
