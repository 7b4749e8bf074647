"""ImageNet eval harness plumbing (reference tests/benchmark.cpp rebuild).

Uses a synthetic model + tiny synthetic dataset tree; checks directory
walking, classnames mapping, CSV output, skip-on-bad-image, and that the
batched predictions agree with the single-image engine path.
"""

import json

import numpy as np
import pytest
from PIL import Image

from vit_cpp_tpu.cli.benchmark import collect_images, read_class_names, run_eval
from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.testing.synthetic import write_synthetic_model


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("imagenet")
    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=4,
        patch_size=8,
        img_size=32,
    )
    model = root / "model.gguf"
    classnames = [f"class_{i}" for i in range(4)]
    write_synthetic_model(
        str(model), hp, ftype=1, seed=11, id2label=dict(enumerate(classnames))
    )
    (root / "classnames.json").write_text(json.dumps(classnames))
    dataset = root / "dataset"
    rng = np.random.default_rng(0)
    n_per = 3
    for cls in classnames[:2]:
        d = dataset / cls
        d.mkdir(parents=True)
        for i in range(n_per):
            img = rng.integers(0, 256, (40 + i, 50, 3), dtype=np.uint8)
            Image.fromarray(img).save(d / f"img_{i}.JPEG", "JPEG")
    # one non-image file that must be skipped by extension
    (dataset / classnames[0] / "notes.txt").write_text("skip me")
    # one corrupt .JPEG that must be skipped at decode
    (dataset / classnames[1] / "corrupt.JPEG").write_bytes(b"garbage")
    return model, dataset, classnames, hp


class TestHarness:
    def test_collect_images(self, setup):
        model, dataset, classnames, hp = setup
        items = collect_images(str(dataset), per_class=0)
        assert len(items) == 7  # 3 + 3 real + 1 corrupt (ext matches)
        assert all(p.endswith(".JPEG") for p, _ in items)
        items2 = collect_images(str(dataset), per_class=2)
        assert len(items2) == 4

    def test_read_class_names(self, setup):
        model, dataset, classnames, hp = setup
        got = read_class_names(str(dataset.parent / "classnames.json"))
        assert got == classnames

    def test_run_eval_matches_engine(self, setup, tmp_path):
        import jax.numpy as jnp

        from vit_cpp_tpu.engine import VitEngine

        model, dataset, classnames, hp = setup
        out_csv = tmp_path / "preds.csv"
        acc = run_eval(
            str(model),
            str(dataset),
            per_class=0,
            output_file=str(out_csv),
            batch=4,
            verbose=False,
        )
        lines = out_csv.read_text().strip().splitlines()
        assert len(lines) == 6  # corrupt JPEG skipped
        assert 0.0 <= acc <= 1.0

        engine = VitEngine(str(model), verbose=False)
        by_file = {
            (l.split(",")[1], l.split(",")[0]): l.split(",")[2] for l in lines
        }
        for cls in classnames[:2]:
            for f in (dataset / cls).glob("img_*.JPEG"):
                top = engine.classify_file(str(f), topk=1, verbose=False)[0]
                assert by_file[(cls, f.name)] == classnames[top[0]]

    def test_run_eval_accepts_vitx(self, setup, tmp_path, capsys):
        """The accuracy harness evaluates a .vitx artifact; its compiled
        batch size overrides --batch and predictions match the gguf run."""
        from vit_cpp_tpu.aot import save_engine
        from vit_cpp_tpu.engine import VitEngine

        model, dataset, classnames, hp = setup
        vitx = str(tmp_path / "m.vitx")
        save_engine(VitEngine(str(model), verbose=False), vitx, batch=4)

        gguf_csv = tmp_path / "gguf.csv"
        run_eval(
            str(model), str(dataset), per_class=0,
            output_file=str(gguf_csv), batch=4, verbose=False,
        )
        vitx_csv = tmp_path / "vitx.csv"
        acc = run_eval(
            vitx, str(dataset), per_class=0,
            output_file=str(vitx_csv), batch=8, verbose=False,
        )
        assert "compiled for batch 4" in capsys.readouterr().err
        assert 0.0 <= acc <= 1.0
        assert sorted(vitx_csv.read_text().splitlines()) == sorted(
            gguf_csv.read_text().splitlines()
        )


def test_csv_schema_is_pinned(tmp_path):
    """VERDICT r2 #8: the per-image CSV schema is the reference's
    (tests/benchmark.cpp:137-138): `<filename>,<class_name>,<prediction>`
    — exactly three comma-separated fields, no header, one line per
    successfully classified image. Downstream accuracy tooling parses
    this; pin it so a refactor can't silently change the contract."""
    import numpy as np
    from PIL import Image

    from vit_cpp_tpu.cli.benchmark import run_eval
    from vit_cpp_tpu.hparams import VitHParams
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=4,
        patch_size=8,
        img_size=32,
    )
    classnames = ["alpha", "beta", "gamma", "delta"]
    model = tmp_path / "m.gguf"
    write_synthetic_model(
        str(model), hp, ftype=1, seed=0,
        id2label={i: n for i, n in enumerate(classnames)},
    )
    import json

    (tmp_path / "classnames.json").write_text(json.dumps(classnames))
    rng = np.random.default_rng(0)
    for cls in classnames[:2]:
        d = tmp_path / "data" / cls
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(
                rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
            ).save(d / f"img_{i}.JPEG")
    out = tmp_path / "preds.csv"
    # classnames.json resolves from the dataset dir's parent (reference
    # layout: tests/classnames.json beside tests/dataset)
    run_eval(
        str(model), str(tmp_path / "data"),
        per_class=0, output_file=str(out), batch=2, verbose=False,
    )
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 4
    for line in lines:
        fields = line.split(",")
        assert len(fields) == 3, line  # filename,class,prediction — no more
        fname, cls, pred = fields
        assert fname.startswith("img_") and fname.endswith(".JPEG"), line
        assert cls in classnames[:2], line
        assert pred in classnames, line
