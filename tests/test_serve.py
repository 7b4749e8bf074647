"""Serving pipeline: batched canvas preprocessing + double-buffered serve.

preprocess_batch must be numerically identical to the per-image parity path
(same resampling weights, u8 re-rounding, normalize — vit.cpp:130-287
semantics) while compiling once per (batch, canvas-bucket); serve_files
must preserve input order, mark failed decodes, and agree with the
single-image engine path.
"""

import numpy as np
import pytest
from PIL import Image

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.ops.preprocess import canvas_bucket, preprocess, preprocess_batch
from vit_cpp_tpu.testing.synthetic import write_synthetic_model


class TestCanvasPreprocess:
    def test_bucketing(self):
        assert canvas_bucket(100, 200) == 256
        assert canvas_bucket(257, 100) == 512
        assert canvas_bucket(256, 256) == 256

    @pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
    def test_matches_per_image_path(self, mode):
        rng = np.random.default_rng(0)
        sizes = [(40, 60), (200, 150), (224, 224), (100, 250)]
        imgs = [
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for h, w in sizes
        ]
        batched = np.asarray(preprocess_batch(imgs, 32, mode=mode))
        assert batched.shape == (4, 3, 32, 32)
        for i, img in enumerate(imgs):
            single = np.asarray(preprocess(img, 32, mode=mode))
            np.testing.assert_allclose(batched[i], single, atol=1e-5)

    def test_mixed_buckets_use_max(self):
        rng = np.random.default_rng(1)
        imgs = [
            rng.integers(0, 256, (40, 60, 3), dtype=np.uint8),
            rng.integers(0, 256, (300, 200, 3), dtype=np.uint8),
        ]
        out = np.asarray(preprocess_batch(imgs, 16))
        for i, img in enumerate(imgs):
            np.testing.assert_allclose(
                out[i], np.asarray(preprocess(img, 16)), atol=1e-5
            )


@pytest.fixture(scope="module")
def serve_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=5,
        patch_size=8,
        img_size=32,
    )
    model = root / "model.gguf"
    write_synthetic_model(str(model), hp, ftype=1, seed=2)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(7):
        p = root / f"img_{i}.png"
        Image.fromarray(
            rng.integers(0, 256, (30 + 3 * i, 40, 3), dtype=np.uint8)
        ).save(p)
        paths.append(str(p))
    bad = root / "broken.jpg"
    bad.write_bytes(b"nope")
    paths.insert(3, str(bad))
    return str(model), paths


class TestServe:
    def test_order_failures_and_parity(self, serve_setup):
        from vit_cpp_tpu.engine import VitEngine
        from vit_cpp_tpu.serve import serve_files

        model, paths = serve_setup
        engine = VitEngine(model, verbose=False)
        results = list(serve_files(engine, paths, batch=3, keep_probs=True))
        assert len(results) == len(paths)
        # failed decode marked, good files classified
        by_path = {r.path: r for r in results}
        assert by_path[paths[3]].top1 == -1
        for p in paths:
            if p == paths[3]:
                continue
            r = by_path[p]
            want = engine.classify_file(p, topk=1, verbose=False)[0]
            assert r.top1 == want[0]
            np.testing.assert_allclose(r.prob, want[1], atol=1e-5)

    def test_producer_exception_propagates(self, serve_setup, monkeypatch):
        """A crash in the producer thread must surface in the consumer
        instead of hanging it forever on q.get()."""
        import vit_cpp_tpu.serve as serve_mod
        from vit_cpp_tpu.engine import VitEngine

        model, paths = serve_setup
        engine = VitEngine(model, verbose=False)

        def boom(*a, **k):
            raise RuntimeError("decode stage exploded")

        monkeypatch.setattr(serve_mod, "preprocess_batch", boom)
        with pytest.raises(RuntimeError, match="decode stage exploded"):
            list(serve_mod.serve_files(engine, paths, batch=3))

    def test_throughput_helper(self, serve_setup):
        from vit_cpp_tpu.engine import VitEngine
        from vit_cpp_tpu.serve import throughput

        model, paths = serve_setup
        engine = VitEngine(model, verbose=False)
        ips = throughput(engine, paths, batch=4)
        assert ips > 0

    def test_embed_files_parity_and_failures(self, serve_setup):
        """embed_files yields the same vectors as the engine's own
        embed_file parity path, in input order, with failed decodes
        marked vector=None."""
        from vit_cpp_tpu.engine import VitEngine
        from vit_cpp_tpu.serve import embed_files

        model, paths = serve_setup
        engine = VitEngine(model, verbose=False)
        results = list(embed_files(engine, paths, batch=3))
        assert [e.path for e in results] == paths
        by_path = {e.path: e for e in results}
        assert by_path[paths[3]].vector is None
        for p in paths:
            if p == paths[3]:
                continue
            vec = by_path[p].vector
            assert vec.shape == (engine.hp.hidden_size,)
            np.testing.assert_allclose(
                vec, engine.embed_file(p), atol=1e-5
            )


class TestServeCli:
    def test_cli_smoke(self, serve_setup, capsys):
        from vit_cpp_tpu.cli.serve import main

        model, paths = serve_setup
        rc = main(["-m", model, "--dtype", "f32", "--attn", "xla", "-b", "4", *paths[:4]])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) >= 3  # broken.jpg goes to stderr
        assert all("\t" in l for l in out)

    @pytest.mark.slow
    def test_cli_static_act_scales(self, serve_setup, capsys):
        """--act static --calib-dir serves through the calibrated path
        (or falls back to dynamic with the guardrail message) and still
        classifies every decodable image."""
        from vit_cpp_tpu.cli.serve import main

        model, paths = serve_setup
        good = [p for i, p in enumerate(paths) if i != 3][:4]
        rc = main(
            ["-m", model, "--attn", "xla", "--mm", "int8", "-b", "4",
             "--act", "static", "--calib-dir",
             str(__import__("os").path.dirname(good[0])), *good]
        )
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 4 and all("\t" in l for l in out)

    def test_cli_embed_writes_npy_and_paths(self, serve_setup, tmp_path):
        from vit_cpp_tpu.cli.serve import main
        from vit_cpp_tpu.engine import VitEngine

        model, paths = serve_setup
        out = str(tmp_path / "feats.npy")
        rc = main(
            ["-m", model, "--dtype", "f32", "--attn", "xla", "--mm", "xla",
             "-b", "4", "--embed", out, *paths]
        )
        assert rc == 0
        feats = np.load(out)
        kept = (tmp_path / "feats.paths.txt").read_text().splitlines()
        assert len(kept) == len(paths) - 1  # broken.jpg skipped
        engine = VitEngine(model, verbose=False)
        assert feats.shape == (len(kept), engine.hp.hidden_size)
        np.testing.assert_allclose(
            feats[0], engine.embed_file(kept[0]), atol=1e-5
        )


class TestServeVitstrAutoDetect:
    def test_serve_cli_dispatches_vitstr(self, tmp_path, capsys):
        from PIL import Image

        from vit_cpp_tpu.cli.serve import main
        from vit_cpp_tpu.hparams import VitHParams
        from vit_cpp_tpu.models.vitstr import vitstr_id2label
        from vit_cpp_tpu.testing.synthetic import write_synthetic_model

        hp = VitHParams(
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_classes=96,
            patch_size=16,
            img_size=96,
            in_chans=1,
            seq_len=25,
        )
        model = tmp_path / "vitstr.gguf"
        write_synthetic_model(
            str(model), hp, ftype=1, seed=3, id2label=vitstr_id2label()
        )
        rng = np.random.default_rng(0)
        paths = []
        for i in range(2):
            p = tmp_path / f"w{i}.png"
            Image.fromarray(
                rng.integers(0, 256, (30, 90, 3), dtype=np.uint8)
            ).save(p)
            paths.append(str(p))
        rc = main(["-m", str(model), "--dtype", "f32", "--attn", "xla", *paths])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 2  # path<TAB>text<TAB>conf per file

    def test_classifier_engine_rejects_vitstr_model(self, tmp_path):
        import pytest as _pytest

        from vit_cpp_tpu.engine import VitEngine
        from vit_cpp_tpu.hparams import VitHParams
        from vit_cpp_tpu.testing.synthetic import write_synthetic_model

        hp = VitHParams(
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_classes=96,
            patch_size=16,
            img_size=96,
            in_chans=1,
            seq_len=25,
        )
        model = tmp_path / "vitstr.gguf"
        write_synthetic_model(str(model), hp, ftype=1, seed=3)
        eng = VitEngine(str(model), verbose=False)
        with _pytest.raises(ValueError, match="sequence head"):
            eng.classify_file("/nonexistent.jpg")


class TestServeCliMesh:
    def test_cli_mesh_sharded_serving(self, serve_setup, capsys):
        """--mesh DPxTP shards the engine over the (virtual) device mesh;
        per-image results must match the single-device CLI run."""
        from vit_cpp_tpu.cli.serve import main

        model, paths = serve_setup
        good = [p for p in paths if "broken" not in p][:4]
        args = ["-m", model, "--dtype", "f32", "--attn", "xla", "-b", "4"]
        rc = main([*args, *good])
        assert rc == 0
        single = capsys.readouterr().out.strip().splitlines()
        rc = main([*args, "--mesh", "4x2", *good])
        assert rc == 0
        sharded = capsys.readouterr().out.strip().splitlines()
        assert sharded == single

    def test_cli_mesh_rejects_bad_spec(self, serve_setup, capsys):
        from vit_cpp_tpu.cli.serve import main

        model, paths = serve_setup
        assert main(["-m", model, "--mesh", "wat", paths[0]]) == 1
        assert main(["-m", model, "--mesh", "3x2", "-b", "4", paths[0]]) == 1
