"""AOT deployment artifacts: one file = compiled program + weights + meta.

`export_engine` constant-folds an engine's parameters into its jitted
serving function and serializes the result with `jax.export` (StableHLO +
embedded weights). The `.vitx` artifact can then be served by `AotEngine`
in a process that needs NO model code, NO gguf file, and NO re-trace —
deserialization restores the compiled-and-ready program. This is the TPU
analogue of shipping the reference's ggml file + binary as one unit, with
the trace/compile cost paid at build time instead of at serving start
(complementary to utils/compile_cache.py, which caches per-machine).

File layout:  b"VITX\\x01" | u32 json_len | meta json | jax.export blob(s)

The exported program is pinned to a fixed (batch, C, S, S) input (batch
padding is the serving layer's job — serve.py and server.py already pad
to a fixed batch) and to the lowering platform(s) recorded at export.

An artifact may carry SEVERAL batch sizes (`vit-export -b 1,64`): one
exported program per size, concatenated after the metadata
(meta["batches"] + meta["blob_lengths"] index them). One file then
serves both the latency path (the single-image CLIs pick the smallest
batch instead of broadcasting into the big program) and the throughput
path (serve/server use meta["batch"] = the largest). Weights are
constant-folded into EACH program, so N batch entries cost ~N x the
model size on disk — the price of a zero-trace deploy artifact.
"""

from __future__ import annotations

import dataclasses
import json
import struct
from typing import Any, Dict, Tuple

import numpy as np

MAGIC = b"VITX\x01"


def export_engine(engine, batch, platforms=None) -> bytes:
    """Serialize `engine`'s serving function for fixed batch size(s).

    `batch` is an int or a list of ints — one exported program per size
    in one artifact (docstring above: latency + throughput in one file).

    Weights are closed over (constant-folded into the artifact); the
    exported callable maps (batch, in_chans, S, S) f32 pixels ->
    probabilities. Pallas custom calls (the fused attention kernel) are
    allowed through export's compatibility check — the artifact is tied
    to a compatible runtime, which is the normal contract for a deploy
    artifact.

    `platforms` (e.g. ["cpu", "tpu"]) cross-lowers for targets other
    than the exporting process's backend — export on a CPU dev box,
    serve on TPU. Pallas-kernel configs can only lower for their own
    backend; use attn_impl="xla"/mm_impl="xla" engines for portable
    artifacts, or export on the serving platform.

    SHARDED engines (VitEngine.shard(mesh)) export a multi-chip program:
    the serving batch is sharded over the mesh's 'data' axis and the
    parameters keep their megatron TP shardings — jax.export records the
    full GSPMD partitioning, so the artifact replays the same collectives
    at load. The mesh shape is recorded in the metadata and AotEngine
    rebuilds an identical mesh from the serving process's devices (the
    device COUNT must match; serving 8-way artifacts needs 8 chips)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    from vit_cpp_tpu.models.vit import forward, predict_probs

    params, hp = engine.params, engine.hp
    attn_impl, mm_impl = engine._attn_impl, engine._mm_impl
    precision = engine.matmul_precision
    tome = getattr(engine, "_tome", 0)
    mesh = getattr(engine, "mesh", None)
    # headless encoders (num_classes=0) export the FEATURES program —
    # their only serving surface is embeddings
    headless = hp.seq_len is None and hp.num_classes == 0

    def serve_fn(images):
        with jax.default_matmul_precision(precision):
            if headless:
                return forward(
                    params, images, hp, attn_impl=attn_impl,
                    mm_impl=mm_impl, features=True, tome=tome,
                )
            return predict_probs(
                params, images, hp, attn_impl=attn_impl, mm_impl=mm_impl,
                tome=tome,
            )

    batches = sorted(
        {int(b) for b in (batch if isinstance(batch, (list, tuple)) else [batch])}
    )
    if not batches or batches[0] < 1:
        raise ValueError(f"batch sizes must be >= 1, got {batches}")

    jit_kw: Dict[str, Any] = {}
    x_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        x_sharding = NamedSharding(mesh, P("data"))
        jit_kw = dict(in_shardings=x_sharding, out_shardings=x_sharding)
    disabled = [
        jex.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        jex.DisabledSafetyCheck.custom_call("Mosaic"),
    ]
    blobs = []
    exp_platforms = None
    for b in batches:
        x = jax.ShapeDtypeStruct(
            (b, hp.in_chans, hp.img_size, hp.img_size),
            jnp.float32,
            sharding=x_sharding,
        )
        exp = jex.export(
            jax.jit(serve_fn, **jit_kw),
            platforms=platforms,
            disabled_checks=disabled,
        )(x)
        exp_platforms = list(exp.platforms)
        blobs.append(exp.serialize())
    # Optional hparam overrides (mlp_hidden) are omitted when unset so a
    # standard-geometry artifact's meta stays readable by pre-override
    # VitHParams(**d) readers; the reader side additionally drops unknown
    # keys, so future writer fields cannot brick a deployed reader.
    hp_dict = {
        k: v
        for k, v in dataclasses.asdict(hp).items()
        if not (k == "mlp_hidden" and v is None)
    }
    meta = {
        # "batch" stays the single serving batch (the largest): readers
        # that predate "batches" keep working on SINGLE-batch artifacts
        # (the default); multi-batch artifacts need a "batches"-aware
        # reader to slice blob_lengths
        "batch": batches[-1],
        "batches": batches,
        "blob_lengths": [len(b) for b in blobs],
        "hparams": hp_dict,
        "id2label": {str(k): v for k, v in engine.id2label.items()},
        "platforms": exp_platforms,
        "attn_impl": attn_impl,
        "mm_impl": mm_impl,
        # what the blobs compute: the classifier softmax, or the pooled
        # features for headless encoders (readers predating this key
        # never see it on classifier artifacts — it is only written
        # non-default here for artifacts they could not serve anyway)
        **({"program": "features"} if headless else {}),
        # ToMe token merging baked into the graph (readers predating
        # the key serve non-tome artifacts identically)
        **({"tome": tome} if tome else {}),
    }
    if mm_impl == "int8":
        from vit_cpp_tpu.quant.int8 import params_have_static_scales

        meta["act"] = (
            "static" if params_have_static_scales(params) else "dynamic"
        )
    if mesh is not None:
        meta["mesh"] = {
            "axis_names": list(mesh.axis_names),
            "axis_sizes": [int(mesh.shape[a]) for a in mesh.axis_names],
        }
    mj = json.dumps(meta).encode()
    return MAGIC + struct.pack("<I", len(mj)) + mj + b"".join(blobs)


def save_engine(engine, path: str, batch, platforms=None) -> Dict[str, Any]:
    blob = export_engine(engine, batch, platforms=platforms)
    with open(path, "wb") as f:
        f.write(blob)
    meta, _ = _split(blob)
    return meta


def _split(data: bytes) -> Tuple[Dict[str, Any], bytes]:
    if data[: len(MAGIC)] != MAGIC:
        raise ValueError("not a VITX artifact (bad magic)")
    off = len(MAGIC) + 4
    if len(data) < off:
        raise ValueError("truncated VITX artifact (header)")
    (n,) = struct.unpack_from("<I", data, len(MAGIC))
    if len(data) < off + n:
        raise ValueError("truncated VITX artifact (metadata)")
    try:
        meta = json.loads(data[off : off + n])
    except ValueError as e:
        raise ValueError(f"corrupt VITX metadata: {e}") from None
    return meta, data[off + n :]


def read_meta(path: str) -> Dict[str, Any]:
    """Parse just the metadata header (no full-file read — artifacts
    embed the weights and can be GB-sized)."""
    with open(path, "rb") as f:
        head = f.read(len(MAGIC) + 4)
        if head[: len(MAGIC)] != MAGIC:
            raise ValueError("not a VITX artifact (bad magic)")
        if len(head) < len(MAGIC) + 4:
            raise ValueError("truncated VITX artifact (header)")
        (n,) = struct.unpack("<I", head[len(MAGIC) :])
        mj = f.read(n)
    if len(mj) < n:
        raise ValueError("truncated VITX artifact (metadata)")
    try:
        return json.loads(mj)
    except ValueError as e:
        raise ValueError(f"corrupt VITX metadata: {e}") from None


def is_vitx(path: str) -> bool:
    """True when `path` is a .vitx artifact (by magic, not extension) —
    lets the serving CLIs accept either a gguf checkpoint or an artifact
    through the same -m flag."""
    try:
        with open(path, "rb") as f:
            return f.read(len(MAGIC)) == MAGIC
    except OSError:
        return False


class AotEngine:
    """Serve a .vitx artifact: drop-in for VitEngine's serving surface
    (hp / id2label / preprocess_image / predict_probs_batch) with FIXED
    batch size(s) — pair with serve_files(..., batch=engine.batch) or the
    HTTP daemon's MicroBatcher(batch=engine.batch). Multi-batch artifacts
    expose every exported size through `.batches`; `.batch` is the
    largest (the throughput batch) and the single-image front ends use
    the smallest (the latency batch)."""

    def __init__(self, path: str):
        import time

        import jax
        from jax import export as jex

        from vit_cpp_tpu.hparams import VitHParams

        t0 = time.perf_counter()

        with open(path, "rb") as f:
            meta, blob = _split(f.read())
        self.meta = meta
        self.batch = int(meta["batch"])
        self.batches = [int(b) for b in meta.get("batches", [self.batch])]
        blob_lengths = meta.get("blob_lengths", [len(blob)])
        if sum(blob_lengths) != len(blob):
            raise ValueError(
                f"{path}: blob_lengths {blob_lengths} do not cover the "
                f"{len(blob)}-byte program section (truncated artifact?)"
            )
        # drop hparam keys this build doesn't know (a newer writer's
        # optional fields must not brick an older serving host)
        known = {f.name for f in dataclasses.fields(VitHParams)}
        self.hp = VitHParams(
            **{k: v for k, v in meta["hparams"].items() if k in known}
        )
        self.id2label = {int(k): v for k, v in meta["id2label"].items()}
        # fail at load, not per-request: platform mismatch is a deploy
        # error (vit-export --platforms cross-lowers for other targets).
        # jax.default_backend() says 'gpu' where export records the
        # lowering platform 'cuda'/'rocm' — accept either alias.
        backend = jax.default_backend()
        accepted = {"gpu": {"cuda", "rocm"}}.get(backend, {backend})
        if accepted.isdisjoint(meta["platforms"]):
            want = "/".join(sorted(accepted))
            raise ValueError(
                f"{path} was exported for platforms {meta['platforms']} "
                f"but this process runs on {backend!r}; re-export with "
                f"vit-export --platforms {want} (or export on the "
                "serving platform)"
            )
        self._programs = {}
        off = 0
        for b, n in zip(self.batches, blob_lengths):
            self._programs[b] = jex.deserialize(blob[off : off + n])
            off += n
        self._batch_sharding = None
        if "mesh" in meta:
            # sharded artifact: rebuild the export-time mesh over this
            # process's devices so the recorded GSPMD program replays
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            sizes = meta["mesh"]["axis_sizes"]
            names = tuple(meta["mesh"]["axis_names"])
            n = 1
            for s in sizes:
                n *= s
            devs = jax.devices()
            if len(devs) < n:
                raise ValueError(
                    f"{path} is a sharded artifact for {n} devices "
                    f"(mesh {dict(zip(names, sizes))}); this process has "
                    f"{len(devs)} — re-export single-chip or serve on a "
                    f"{n}-device host"
                )
            mesh = Mesh(np.array(devs[:n]).reshape(sizes), names)
            self.mesh = mesh
            self._batch_sharding = NamedSharding(mesh, P("data"))
        self.load_ms = (time.perf_counter() - t0) * 1000.0

    def preprocess_image(self, img_u8: np.ndarray):
        from vit_cpp_tpu.ops.preprocess import preprocess_batch

        if self.hp.seq_len is not None:
            from vit_cpp_tpu.models.vitstr import preprocess_grayscale_batch

            return preprocess_grayscale_batch([img_u8], self.hp.img_size)[0]
        from vit_cpp_tpu.ops.preprocess import norm_constants

        mean, std = norm_constants(getattr(self.hp, "pixel_norm", "imagenet"))
        return preprocess_batch(
            [img_u8], self.hp.img_size, mode=self.hp.interpolation,
            mean=mean, std=std,
        )[0]

    def predict_probs_batch(self, images):
        if self.meta.get("program") == "features":
            # the blobs compute pooled features — returning them under a
            # probability-named surface would feed nonsense to generic
            # serving code (review r3); features_batch is the entry point
            raise ValueError(
                "this artifact is a headless encoder (features program) — "
                "call features_batch / serve embeddings"
            )
        return self._run_batch(images)

    def _run_batch(self, images):
        import jax.numpy as jnp

        prog = self._programs.get(int(images.shape[0]))
        if prog is None:
            raise ValueError(
                f"artifact is compiled for batch"
                f"{'es' if len(self.batches) > 1 else ''} "
                f"{'/'.join(map(str, self.batches))}, got {images.shape[0]} "
                "(pad at the serving layer)"
            )
        images = jnp.asarray(images, jnp.float32)
        if self._batch_sharding is not None:
            import jax

            images = jax.device_put(images, self._batch_sharding)
        return prog.call(images)

    # -- single-image front ends (the vit / vitstr CLIs accept .vitx) ------

    def _predict_one(self, path: str, verbose: bool):
        import jax.numpy as jnp

        from vit_cpp_tpu.io.image import load_image_rgb

        img = load_image_rgb(path)
        if verbose:
            print(
                f"load_image_from_file: loaded image '{path}' "
                f"({img.shape[1]} x {img.shape[0]})"
            )
        pixels = self.preprocess_image(img)
        if verbose:
            print(
                f"processed, out dims : ({self.hp.img_size} x {self.hp.img_size})"
            )
        # use the smallest exported batch (the latency program of a
        # multi-batch artifact; the one program otherwise): broadcast the
        # image and read row 0
        b = min(self.batches)
        stacked = jnp.broadcast_to(pixels[None], (b,) + pixels.shape)
        return np.asarray(self.predict_probs_batch(stacked)[0])

    def features_batch(self, images):
        """Embedding serving for headless-encoder artifacts (the exported
        program IS the features program there)."""
        if self.meta.get("program") != "features":
            raise ValueError(
                "this artifact exports the classifier program; embeddings "
                "need a headless-encoder checkpoint (vit-export one, or "
                "serve the gguf)"
            )
        return self._run_batch(images)

    def classify_file(self, path: str, topk: int = 5, verbose: bool = True):
        """[(class_id, prob, label)] — VitEngine.classify_file's surface;
        preprocessing is the canvas batch path (serving semantics), not
        the per-size parity path."""
        if self.hp.seq_len is not None:
            raise ValueError(
                "this artifact has a sequence head (ViTSTR); use the "
                "vitstr CLI / recognize_file instead of the classifier"
            )
        if self.meta.get("program") == "features":
            raise ValueError(
                "this artifact is a headless encoder (features program) — "
                "serve embeddings (vit-serve --embed / the daemon's "
                "/v1/embed route)"
            )
        probs = self._predict_one(path, verbose)
        order = np.argsort(-probs, kind="stable")[:topk]
        return [
            (int(i), float(probs[i]), self.id2label.get(int(i), f"LABEL_{i}"))
            for i in order
        ]

    def recognize_file(self, path: str, verbose: bool = True):
        """(text, confidence) via greedy decode — VitstrEngine's surface."""
        from vit_cpp_tpu.models.vitstr import greedy_decode

        if self.hp.seq_len is None:
            raise ValueError(
                "this artifact is a classifier; use classify_file / the vit CLI"
            )
        probs = self._predict_one(path, verbose)
        return greedy_decode(probs, self.id2label)
