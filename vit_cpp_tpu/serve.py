"""Throughput serving: a double-buffered decode -> preprocess -> predict
pipeline over a stream of image files.

The reference processes one image per process invocation (main.cpp:26-113);
its only throughput story is re-running the CLI N times
(scripts/benchmark.sh:45-55). This module is the serving mode the TPU
design calls for (SURVEY.md §7 step 4): while batch k runs on device,
batch k+1 decodes on the native C++ thread pool and stages onto the host —
the classic double-buffer, here across the host/device boundary. Device
work per batch is one canvas-bucketed preprocessing einsum
(ops/preprocess.py) plus one jitted batched forward; JAX's async dispatch
overlaps the device programs with the next host stage automatically.

    engine = VitEngine(model, dtype=jnp.bfloat16)
    for result in serve_files(engine, paths, batch=64):
        ...  # result.path, result.top1, result.probs

serve_files / recognize_files / embed_files are thin wrappers over ONE
shared pipeline (_stream): the chunking, prefetch queue, producer-thread
error forwarding, pad-to-batch and ok-mask bookkeeping live in a single
place, parameterized by the per-batch preprocess and compute stages.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Callable, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from vit_cpp_tpu.engine import VitEngine
from vit_cpp_tpu.io.image import load_images_rgb_batch
from vit_cpp_tpu.ops.preprocess import preprocess_batch


@dataclasses.dataclass
class Prediction:
    path: str
    top1: int
    prob: float
    probs: Optional[np.ndarray] = None


class _ProducerError:
    """Queue marker carrying an exception out of the producer thread."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def _decode_many(paths: Sequence[str], n_threads: int) -> List[Optional[np.ndarray]]:
    return load_images_rgb_batch(paths, n_threads=n_threads)


def _stream(
    paths: Iterable[str],
    *,
    batch: int,
    decode_threads: int,
    prefetch: int,
    preprocess: Callable,
    compute: Callable,
):
    """The shared double-buffered pipeline.

    A producer thread decodes each chunk on the native thread pool, pads
    short chunks to the full batch (so preprocess AND forward compile
    exactly once) and stages the device transfer + preprocessing einsum —
    which overlaps the consumer's forward pass. The consumer runs
    `compute(pixels, n_ok)` (must return a per-kept-image indexable) and
    yields (path, ok, row) in input order, row=None for failed decodes.

    Invariants owned HERE, for every wrapper: any producer failure is
    re-raised in the consumer (a silently dead producer would leave the
    consumer blocked on q.get() forever), and the stop event tears the
    producer down when the consumer is closed early.
    """
    import os

    if decode_threads <= 0:
        decode_threads = os.cpu_count() or 1
    paths = list(paths)
    chunks = [paths[i : i + batch] for i in range(0, len(paths), batch)]
    q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
    stop = threading.Event()

    def producer():
        try:
            for chunk in chunks:
                if stop.is_set():
                    return
                images = _decode_many(chunk, decode_threads)
                ok = [im is not None for im in images]
                pixels = None
                if any(ok):
                    imgs = [im for im in images if im is not None]
                    while len(imgs) < batch:
                        imgs.append(imgs[0])
                    pixels = preprocess(imgs)
                q.put((chunk, ok, pixels))
            q.put(None)
        except BaseException as e:  # re-raised in the consumer
            q.put(_ProducerError(e))

    threading.Thread(target=producer, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, _ProducerError):
                raise item.exc
            chunk, ok, pixels = item
            rows = compute(pixels, sum(ok)) if pixels is not None else None
            j = 0
            for p, good in zip(chunk, ok):
                if not good:
                    yield p, False, None
                else:
                    yield p, True, rows[j]
                    j += 1
    finally:
        stop.set()


def serve_files(
    engine: VitEngine,
    paths: Iterable[str],
    *,
    batch: int = 64,
    decode_threads: int = 0,
    prefetch: int = 2,
    keep_probs: bool = False,
) -> Iterator[Prediction]:
    """Classify a stream of files; yields Predictions in input order.

    Failed decodes yield top1 == -1 (the harness-style skip marker,
    reference tests/benchmark.cpp:108-125).
    """

    from vit_cpp_tpu.ops.preprocess import norm_constants

    mean, std = norm_constants(engine.hp.pixel_norm)

    def compute(pixels, n):
        return np.asarray(engine.predict_probs_batch(pixels))[:n]

    for p, good, pr in _stream(
        paths,
        batch=batch,
        decode_threads=decode_threads,
        prefetch=prefetch,
        preprocess=lambda imgs: preprocess_batch(
            imgs, engine.hp.img_size, mode=engine.hp.interpolation,
            mean=mean, std=std,
        ),
        compute=compute,
    ):
        if not good:
            yield Prediction(p, -1, 0.0)
            continue
        t1 = int(pr.argmax())
        yield Prediction(
            p, t1, float(pr[t1]), probs=pr if keep_probs else None
        )


@dataclasses.dataclass
class Recognition:
    path: str
    text: str
    confidence: float


def recognize_files(
    engine,
    paths: Iterable[str],
    *,
    batch: int = 64,
    decode_threads: int = 0,
    prefetch: int = 2,
) -> Iterator[Recognition]:
    """Batched ViTSTR scene-text serving, same pipeline shape as
    serve_files: native threaded decode + canvas-batched grayscale
    preprocessing double-buffered against the jitted forward; token
    selection and confidence run on device (greedy_decode_device), only
    (B, seq) ids/flags come back to the host. Failed decodes yield
    text='' / confidence=-1.0."""
    from vit_cpp_tpu.models.vitstr import (
        decode_tokens,
        greedy_decode_device,
        preprocess_grayscale_batch,
    )

    def compute(pixels, n):
        toks, valid, conf = greedy_decode_device(
            engine.predict_probs_batch(pixels)
        )
        return list(
            zip(np.asarray(toks)[:n], np.asarray(valid)[:n], np.asarray(conf)[:n])
        )

    for p, good, row in _stream(
        paths,
        batch=batch,
        decode_threads=decode_threads,
        prefetch=prefetch,
        preprocess=lambda imgs: preprocess_grayscale_batch(
            imgs, engine.hp.img_size
        ),
        compute=compute,
    ):
        if not good:
            yield Recognition(p, "", -1.0)
            continue
        toks, valid, conf = row
        yield Recognition(
            p, decode_tokens(toks, valid, engine.id2label), float(conf)
        )


@dataclasses.dataclass
class Embedding:
    path: str
    vector: Optional[np.ndarray]  # (hidden,) f32, or None on decode failure


def embed_files(
    engine: VitEngine,
    paths: Iterable[str],
    *,
    batch: int = 64,
    decode_threads: int = 0,
    prefetch: int = 2,
) -> Iterator[Embedding]:
    """Bulk feature extraction: the serve_files pipeline with the head
    replaced by the final-LN pooled encoder output (engine.features_batch)
    — the index-building counterpart of the daemon's /v1/embed route.
    Yields (path, (hidden,) f32 vector) in input order; failed decodes
    yield vector=None. Sequence-head models yield (seq_len, hidden)."""
    if engine.hp.seq_len is not None:
        from vit_cpp_tpu.models.vitstr import preprocess_grayscale_batch

        preprocess = lambda imgs: preprocess_grayscale_batch(  # noqa: E731
            imgs, engine.hp.img_size
        )
    else:
        from vit_cpp_tpu.ops.preprocess import norm_constants

        mean, std = norm_constants(engine.hp.pixel_norm)
        preprocess = lambda imgs: preprocess_batch(  # noqa: E731
            imgs, engine.hp.img_size, mode=engine.hp.interpolation,
            mean=mean, std=std,
        )

    def compute(pixels, n):
        return np.asarray(engine.features_batch(pixels), dtype=np.float32)[:n]

    for p, good, vec in _stream(
        paths,
        batch=batch,
        decode_threads=decode_threads,
        prefetch=prefetch,
        preprocess=preprocess,
        compute=compute,
    ):
        yield Embedding(p, vec if good else None)


def throughput(
    engine: VitEngine, paths: Sequence[str], *, batch: int = 64, **kw
) -> float:
    """Images/sec over a full serve_files pass (wall clock, end to end)."""
    import time

    t0 = time.perf_counter()
    n = sum(1 for r in serve_files(engine, paths, batch=batch, **kw) if r.top1 >= 0)
    dt = time.perf_counter() - t0
    return n / max(dt, 1e-9)
