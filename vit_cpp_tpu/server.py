"""HTTP serving daemon with micro-batching.

The reference has "no serving daemon" (SURVEY.md §0) — its only serving
story is re-running the CLI per image. This is the long-running production
front end for the TPU engine: a stdlib ThreadingHTTPServer accepts one
image per request, and a device worker coalesces concurrent requests into
fixed-size batches (padding the tail, so exactly ONE program is ever
compiled — same trick as serve.py's file pipeline) before running the
jitted forward. Decode + preprocess run in the per-request handler
threads, so host work overlaps device compute exactly as in serve.py.

Endpoints (single model, create_server):
  GET  /healthz               -> {"ok": true, "model": ..., ...}
  GET  /stats                 -> request/batch counters (JSON)
  GET  /metrics               -> the same counters in Prometheus text
                                 format (scrape endpoint): requests/
                                 batches/rejected/padded-rows/predict-
                                 seconds counters + queue-depth gauge,
                                 labeled by model and route
  POST /v1/classify[?topk=K]  -> {"topk": [{"id", "label", "prob"}, ...]}
  POST /v1/recognize          -> {"text", "confidence"}   (ViTSTR models)
  POST /v1/embed              -> {"shape": [...], "embedding": [floats]}
                                 (final-LN pooled features. Live engines
                                 ride an unwarmed companion MicroBatcher:
                                 same --max-queue/timeout semantics as
                                 classify, first request pays the
                                 features-program compile. Headless
                                 engines/artifacts serve /v1/embed as
                                 their ONLY route through the warmed main
                                 batcher; classifier .vitx artifacts have
                                 no features program and no embed route)

Multi-model (create_multi_server, `vit-server -m name=path` repeated):
each model gets its own MicroBatcher and POST routes
/v1/<name>/classify|recognize + /v1/<name>/embed; /healthz and /stats
report per model.

Request body = raw image bytes (JPEG/PNG/BMP/PNM via the native decoder,
anything else via PIL).
"""

from __future__ import annotations

import io
import json
import queue
import threading
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler
from http.server import ThreadingHTTPServer as _StdThreadingHTTPServer


class ThreadingHTTPServer(_StdThreadingHTTPServer):
    """Stdlib server with a production listen backlog: the default
    request_queue_size of 5 RSTs concurrent connects the moment more
    than a handful of clients arrive in one scheduling quantum (measured
    by the 64-client soak, tests/test_server_soak.py — ConnectionReset
    storms on a 1-core host). 128 matches the micro-batcher's admission
    bound scale; overload is then handled by the 503 path, not the
    kernel."""

    request_queue_size = 128
from typing import Optional

import numpy as np


def decode_rgb_from_bytes(data: bytes) -> Optional[np.ndarray]:
    """bytes -> (H, W, 3) uint8 RGB; native decoder first, PIL fallback."""
    try:
        from vit_cpp_tpu.native import decoder

        img = decoder.decode_rgb_bytes(data)
        if img is not None:
            return img
    except Exception:
        pass
    try:
        from PIL import Image

        with Image.open(io.BytesIO(data)) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
    except Exception:
        return None


class OverloadedError(RuntimeError):
    """Raised by MicroBatcher.submit when the queue exceeds max_queue —
    the handler maps it to HTTP 503 so clients back off instead of
    timing out inside an unbounded backlog."""


class MicroBatcher:
    """Coalesce concurrent single-image requests into fixed-size batches.

    submit() enqueues preprocessed pixels and returns a Future; one device
    worker drains the queue — it blocks for the first item, then gathers
    up to `batch` more for at most `max_wait_ms` — pads the tail by
    repeating the first item (shape-stable: no recompiles, same rationale
    as serve.py), runs `predict`, and resolves each Future with its row.

    `max_queue` > 0 bounds the backlog: a submit() that would exceed it
    fails fast with OverloadedError (-> 503) instead of letting every
    request wait out the full timeout under overload. 0 = unbounded.

    `buckets=True` pads to the next power of two >= the coalesced count
    (capped at `batch`) instead of always the full batch, so a lone
    request at light load runs the batch-1 program (~30x less compute at
    ViT-B/16 batch 64) instead of paying for `batch` rows. Costs one
    compiled program per bucket (warmed up front by create_server);
    off by default to keep the one-program contract. An explicit list of
    sizes (e.g. a multi-batch .vitx artifact's baked `batches`) buckets
    over exactly those shapes; it must contain `batch`.
    """

    _SENTINEL = object()

    def __init__(
        self,
        predict,
        batch: int = 8,
        max_wait_ms: float = 5.0,
        max_queue: int = 0,
        buckets=False,
    ):
        self._predict = predict
        self.batch = int(batch)
        if isinstance(buckets, (list, tuple)):
            sizes = sorted(int(b) for b in buckets)
            if not sizes or sizes[-1] != self.batch:
                raise ValueError(
                    f"bucket sizes {sizes} must be non-empty and end at "
                    f"batch {self.batch}"
                )
            self.buckets = sizes
        else:
            self.buckets = bool(buckets)
        self.max_queue = int(max_queue)
        self.max_wait = float(max_wait_ms) / 1000.0
        self._q: "queue.SimpleQueue" = queue.SimpleQueue()
        self.n_requests = 0
        self.n_batches = 0
        self.n_rejected = 0
        self.n_padded_rows = 0  # rows computed but not requested
        self.predict_seconds = 0.0  # wall time inside the device call
        # optional companion batcher (the embed route's) closed with this
        # one, so callers keep the one-close() contract
        self.child: Optional["MicroBatcher"] = None
        self._closed = False
        self._stats_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, pixels) -> Future:
        fut: Future = Future()
        if self._closed:  # fail fast instead of waiting out the timeout
            fut.set_exception(RuntimeError("server shutting down"))
            return fut
        if self.max_queue and self._q.qsize() >= self.max_queue:
            # qsize is approximate under concurrency — a soft admission
            # bound, which is all an overload guard needs
            with self._stats_lock:
                self.n_rejected += 1
            fut.set_exception(
                OverloadedError(
                    f"server overloaded (~{self._q.qsize()} requests "
                    f"queued, limit {self.max_queue})"
                )
            )
            return fut
        self._q.put((pixels, fut))
        if self._closed:
            # close() may have finished its final drain between the check
            # above and the put; drain again so THIS future resolves now
            # rather than at the handler's full request timeout
            self._drain_failed(preserve_sentinel=True)
        return fut

    def close(self) -> None:
        self._closed = True  # before the sentinel: submit() races close()
        self._q.put(self._SENTINEL)
        self._worker.join(timeout=5.0)
        self._drain_failed()  # anything enqueued after the sentinel
        if self.child is not None:
            self.child.close()

    def _drain_failed(self, preserve_sentinel: bool = False) -> None:
        """Fail-fast every queued Future so in-flight handler threads get
        an immediate error instead of blocking out their full timeout
        (close() can race handlers: httpd.shutdown() stops the accept
        loop but does not wait for active handler threads).

        A handler-side drain (submit() racing close()) must NOT consume
        the shutdown sentinel — the worker may still be blocked in
        _q.get() waiting for it, and dropping it would hang close()'s
        join for its full timeout and leak the thread. preserve_sentinel
        re-enqueues it and stops; the worker (or close()'s post-join
        drain) handles anything queued behind it."""
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                return
            if item is self._SENTINEL:
                if preserve_sentinel:
                    self._q.put(item)
                    return
            else:
                item[1].set_exception(RuntimeError("server shutting down"))

    def _run(self) -> None:
        import time

        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                self._drain_failed()
                return
            items = [item]
            deadline = time.monotonic() + self.max_wait
            while len(items) < self.batch:
                try:
                    nxt = self._q.get(timeout=max(0.0, deadline - time.monotonic()))
                except queue.Empty:
                    break
                if nxt is self._SENTINEL:
                    self._flush(items)
                    self._drain_failed()
                    return
                items.append(nxt)
            self._flush(items)

    def bucket_sizes(self):
        """The padded batch shapes this batcher can run: an explicit size
        list, powers of two up to `batch`, or just `batch` when off."""
        if isinstance(self.buckets, list):
            return self.buckets
        if not self.buckets:
            return [self.batch]
        sizes, b = [], 1
        while b < self.batch:
            sizes.append(b)
            b <<= 1
        return sizes + [self.batch]

    def _flush(self, items) -> None:
        import time

        import jax.numpy as jnp

        pixels = [p for p, _ in items]
        target = self.batch
        if self.buckets:
            target = next(b for b in self.bucket_sizes() if b >= len(pixels))
        pad = target - len(pixels)
        stacked = jnp.stack(pixels + [pixels[0]] * pad)
        t0 = time.perf_counter()
        try:
            out = np.asarray(self._predict(stacked))
        except Exception as e:  # resolve every waiter, don't hang clients
            for _, fut in items:
                fut.set_exception(e)
            return
        dt = time.perf_counter() - t0
        with self._stats_lock:  # handler threads read /stats concurrently
            self.n_requests += len(items)
            self.n_batches += 1
            self.n_padded_rows += pad
            self.predict_seconds += dt
        for i, (_, fut) in enumerate(items):
            fut.set_result(out[i])


class _Model:
    """One served model: engine + its micro-batcher + routing kind."""

    def __init__(self, name, engine, batcher: MicroBatcher):
        self.name = name
        self.engine = engine
        self.batcher = batcher
        # headless encoder (num_classes=0, e.g. MAE/DINO pretrained): the
        # MAIN batcher wraps features_batch (create_server) and /v1/embed
        # is the only route — no classify program exists to compile
        self.is_headless = _is_headless(engine)
        # Embeddings ride their OWN batcher so they share the admission
        # bound / request timeout / single-compile serialization with
        # classify — but it is NOT warmed up: the features program only
        # compiles if the route is ever hit (first /v1/embed pays it).
        # Classifier .vitx artifacts have NO features program (AotEngine
        # carries a guard method, so hasattr alone is not capability —
        # review r3): their embed route must 404, not 500 per request.
        self.embed_batcher: Optional[MicroBatcher] = None
        aot_meta = getattr(engine, "meta", None)
        can_embed = hasattr(engine, "features_batch") and (
            aot_meta is None or aot_meta.get("program") == "features"
        )
        if not self.is_headless and can_embed:
            # deliberately NOT bucketed: the features program is lazy (only
            # compiles if /v1/embed is ever hit), so bucketing would turn
            # that one cold compile into one per bucket mid-traffic —
            # breaking the "every bucket warmed pre-bind" guarantee that
            # only covers the classify program (review r3)
            self.embed_batcher = MicroBatcher(
                engine.features_batch,
                batch=batcher.batch,
                max_wait_ms=batcher.max_wait * 1000.0,
                max_queue=batcher.max_queue,
            )
            batcher.child = self.embed_batcher  # closed with the main one
        # hp-based so AotEngine (aot.py) routes the same as VitstrEngine:
        # a sequence head means the recognize route + grayscale preprocess
        self.is_vitstr = engine.hp.seq_len is not None

    def preprocess(self, img):
        # canvas-bucketed batch path, NOT the per-size parity path: one
        # compiled program per 256-px source bucket instead of one per
        # distinct (H, W) — arbitrary client image sizes must not grow
        # the jit cache per request (ops/preprocess.py docstring; same
        # reason serve.py uses preprocess_batch)
        if self.is_vitstr:
            from vit_cpp_tpu.models.vitstr import preprocess_grayscale_batch

            return preprocess_grayscale_batch([img], self.engine.hp.img_size)[0]
        from vit_cpp_tpu.ops.preprocess import norm_constants, preprocess_batch

        mean, std = norm_constants(
            getattr(self.engine.hp, "pixel_norm", "imagenet")
        )
        return preprocess_batch(
            [img],
            self.engine.hp.img_size,
            mode=self.engine.hp.interpolation,
            mean=mean,
            std=std,
        )[0]

    def health(self):
        hp = self.engine.hp
        kind = "vitstr" if self.is_vitstr else "vit"
        if self.is_headless:
            kind = "vit-encoder"
        h = {
            "model": kind,
            "hidden_size": hp.hidden_size,
            "img_size": hp.img_size,
            "batch": self.batcher.batch,
        }
        if self.batcher.buckets:
            h["buckets"] = self.batcher.bucket_sizes()
        return h


def _prometheus_metrics(models) -> str:
    """The /stats counters in Prometheus text exposition format, labeled
    by model and route (classify|recognize|embed)."""
    metrics = [
        ("vit_requests_total", "counter", "requests served",
         lambda b: b.n_requests),
        ("vit_batches_total", "counter", "device batches executed",
         lambda b: b.n_batches),
        ("vit_rejected_total", "counter",
         "requests rejected by the admission bound (503)",
         lambda b: b.n_rejected),
        ("vit_padded_rows_total", "counter",
         "batch rows computed as padding", lambda b: b.n_padded_rows),
        ("vit_predict_seconds_total", "counter",
         "wall seconds inside device predict calls",
         lambda b: round(b.predict_seconds, 6)),
        ("vit_queue_depth", "gauge", "requests waiting for the device",
         lambda b: b._q.qsize()),
    ]
    def esc(label: str) -> str:
        # exposition-format label escaping: backslash, quote, newline
        return (
            label.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
        )

    rows, seen = [], set()
    for m in models:
        if id(m) in seen:  # a model backs several routes in the dict
            continue
        seen.add(id(m))
        name = esc(m.name or "default")
        if m.is_vitstr:
            route = "recognize"
        elif getattr(m, "is_headless", False):
            route = "embed"  # headless: the main batcher serves /v1/embed
        else:
            route = "classify"
        rows.append((name, route, m.batcher))
        if m.embed_batcher is not None:
            rows.append((name, "embed", m.embed_batcher))
    out = []
    for metric, typ, help_, get in metrics:
        out.append(f"# HELP {metric} {help_}")
        out.append(f"# TYPE {metric} {typ}")
        for name, route, b in rows:
            out.append(f'{metric}{{model="{name}",route="{route}"}} {get(b)}')
    return "\n".join(out) + "\n"


def make_handler(
    engine,
    batcher: MicroBatcher,
    timeout_s: float = 30.0,
    max_body_bytes: int = 32 * 1024 * 1024,
):
    """Single-model request handler (legacy routes /v1/classify|recognize)."""
    m = _Model(None, engine, batcher)
    if m.is_headless:
        routes = {"/v1/embed": (m, "embed")}
    else:
        routes = {
            ("/v1/recognize" if m.is_vitstr else "/v1/classify"): (m, None)
        }
        if m.embed_batcher is not None:
            routes["/v1/embed"] = (m, "embed")
    return _make_handler(routes, single=m, timeout_s=timeout_s,
                         max_body_bytes=max_body_bytes)


def make_multi_handler(
    models,
    timeout_s: float = 30.0,
    max_body_bytes: int = 32 * 1024 * 1024,
):
    """Multi-model handler: routes /v1/<name>/classify|recognize (+ embed)
    per model."""
    routes = {}
    for m in models:
        if m.is_headless:
            routes[f"/v1/{m.name}/embed"] = (m, "embed")
            continue
        kind = "recognize" if m.is_vitstr else "classify"
        routes[f"/v1/{m.name}/{kind}"] = (m, None)
        if m.embed_batcher is not None:
            routes[f"/v1/{m.name}/embed"] = (m, "embed")
    return _make_handler(routes, single=None, timeout_s=timeout_s,
                         max_body_bytes=max_body_bytes)


def _make_handler(routes, single, timeout_s, max_body_bytes):

    class Handler(BaseHTTPRequestHandler):
        # quiet by default; the CLI wires log_request through --verbose
        def log_message(self, fmt, *args):
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                if single is not None:
                    self._json(200, {"ok": True, **single.health()})
                else:
                    self._json(
                        200,
                        {
                            "ok": True,
                            "models": {
                                m.name: m.health() for m, _ in routes.values()
                            },
                        },
                    )
            elif self.path == "/stats":

                def _counters(b):
                    return {
                        "requests": b.n_requests,
                        "batches": b.n_batches,
                        "rejected": b.n_rejected,
                        "queued": b._q.qsize(),
                        "padded_rows": b.n_padded_rows,
                        "predict_seconds": round(b.predict_seconds, 6),
                    }

                def _stats(m):
                    s = _counters(m.batcher)
                    if m.embed_batcher is not None:
                        s["embed"] = _counters(m.embed_batcher)
                    return s

                if single is not None:
                    self._json(200, _stats(single))
                else:
                    self._json(
                        200, {m.name: _stats(m) for m, _ in routes.values()}
                    )
            elif self.path == "/metrics":
                # Prometheus text exposition format (scrape endpoint); the
                # same counters as /stats, labeled by model and route
                models = (
                    [single]
                    if single is not None
                    else [m for m, _ in routes.values()]
                )
                body = _prometheus_metrics(models).encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            path, _, query = self.path.partition("?")
            model, kind = routes.get(path, (None, None))
            if model is None:
                self._json(
                    404,
                    {"error": f"no route {path} (use {' or '.join(sorted(routes))})"},
                )
                return
            n = int(self.headers.get("Content-Length") or 0)
            if n > max_body_bytes:
                self._json(
                    413, {"error": f"body {n} bytes > limit {max_body_bytes}"}
                )
                return
            data = self.rfile.read(n) if n else b""
            img = decode_rgb_from_bytes(data)
            if img is None:
                self._json(400, {"error": "undecodable image"})
                return
            topk = 5
            for kv in query.split("&"):
                if kv.startswith("topk="):
                    try:
                        topk = max(1, int(kv[5:]))
                    except ValueError:
                        self._json(400, {"error": f"bad query {kv!r}"})
                        return
            pixels = model.preprocess(img)
            # classify/recognize and embed each ride a MicroBatcher, so
            # BOTH get the admission bound (--max-queue -> 503), the
            # request timeout, and single-compile serialization; the
            # embed batcher is unwarmed — the first /v1/embed pays the
            # features-program compile inside the worker. Batch padding
            # keeps the mesh 'data' axis divisibility classify relies on.
            batcher = (
                # headless models embed through their MAIN batcher (it
                # wraps features_batch; there is no classify program)
                (model.embed_batcher or model.batcher)
                if kind == "embed"
                else model.batcher
            )
            try:
                probs = batcher.submit(pixels).result(timeout=timeout_s)
            except OverloadedError as e:  # bounded queue: tell clients to back off
                self._json(503, {"error": f"{type(e).__name__}: {e}"})
                return
            except Exception as e:  # device failure/timeout -> JSON, not a dropped socket
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            if kind == "embed":
                feat = np.asarray(probs, dtype=np.float32)
                self._json(
                    200,
                    {
                        "shape": list(feat.shape),
                        "embedding": [float(v) for v in feat.reshape(-1)],
                    },
                )
                return
            if model.is_vitstr:
                from vit_cpp_tpu.models.vitstr import greedy_decode

                text, conf = greedy_decode(
                    np.asarray(probs), model.engine.id2label
                )
                self._json(200, {"text": text, "confidence": float(conf)})
                return
            order = np.argsort(-probs, kind="stable")[:topk]
            self._json(
                200,
                {
                    "topk": [
                        {
                            "id": int(i),
                            "label": model.engine.id2label.get(
                                int(i), f"LABEL_{i}"
                            ),
                            "prob": float(probs[i]),
                        }
                        for i in order
                    ]
                },
            )

    return Handler


def _is_headless(engine) -> bool:
    """Headless encoder (num_classes=0, no sequence head): serves
    embeddings only. One predicate for routing (_Model) AND program
    choice (_engine_predict) so the two can never drift."""
    return (
        engine.hp.seq_len is None
        and getattr(engine.hp, "num_classes", 1) == 0
    )


def _engine_predict(engine):
    """The device program a daemon batcher runs: the classifier for
    headful engines, the features program for headless encoders (their
    only route is /v1/embed)."""
    if _is_headless(engine):
        return engine.features_batch
    return engine.predict_probs_batch


def _shardable_buckets(engine, batch: int, buckets):
    """Constrain bucket sizes to multiples of a sharded engine's data
    axis — a (1, ...) batch cannot be split dp ways, so unconstrained
    buckets would crash the warmup (review r3). No-op for unsharded
    engines or buckets=False."""
    sharding = getattr(engine, "_batch_sharding", None)
    if not buckets or sharding is None:
        return buckets
    dp = int(sharding.mesh.shape.get("data", 1))
    if dp <= 1:
        return buckets
    if isinstance(buckets, (list, tuple)):
        bad = [b for b in buckets if int(b) % dp]
        if bad:
            raise ValueError(
                f"bucket sizes {bad} do not divide the mesh data axis "
                f"(dp={dp}) — a sharded engine cannot run them"
            )
        return buckets
    sizes, b = [], 1
    while b < batch:
        if b % dp == 0:
            sizes.append(b)
        b <<= 1
    sizes.append(batch)  # callers validate batch % dp when sharding
    return sizes if len(sizes) > 1 else False


def _warm(engine, batcher: MicroBatcher) -> None:
    """Compile every program the batcher can dispatch before serving: one
    dummy request through the batcher (verifies the whole pipeline), then
    the remaining bucket shapes via direct predict calls."""
    import jax.numpy as jnp

    hp = engine.hp
    dummy = jnp.zeros((hp.in_chans, hp.img_size, hp.img_size), jnp.float32)
    batcher.submit(dummy).result()  # blocks through compile + 1 step
    # the batcher path above warmed the bucket a 1-item flush selects
    # (bucket 1, or the full batch when bucketing is off)
    for b in batcher.bucket_sizes()[1:]:
        np.asarray(
            batcher._predict(
                jnp.zeros((b, hp.in_chans, hp.img_size, hp.img_size), jnp.float32)
            )
        )
    batcher.n_requests = 0
    batcher.n_batches = 0
    batcher.n_padded_rows = 0
    batcher.predict_seconds = 0.0


def create_server(
    engine,
    host: str = "127.0.0.1",
    port: int = 8000,
    batch: int = 8,
    max_wait_ms: float = 5.0,
    warmup: bool = True,
    request_timeout_s: float = 30.0,
    max_body_bytes: int = 32 * 1024 * 1024,
    max_queue: int = 0,
    buckets: bool = False,
):
    """Build (ThreadingHTTPServer, MicroBatcher); caller runs
    serve_forever() (or .handle_request() in tests) and closes both.

    warmup=True runs one dummy batch through the jitted forward BEFORE
    the server is returned, so the first real request never pays the
    XLA compile (minutes on TPU for the big serving programs — pair with
    --compile-cache to make it a one-time cost per machine). With
    buckets=True EVERY bucket (classify-program) shape is warmed — a
    light-load request hitting a cold bucket would otherwise pay a
    compile. On a mesh-sharded engine, bucket sizes are constrained to
    multiples of the data axis (anything else cannot be sharded); when
    no smaller bucket qualifies, the batcher runs unbucketed. Headless
    encoders (num_classes=0) serve /v1/embed only — their batcher wraps
    the features program."""
    batcher = MicroBatcher(
        _engine_predict(engine),
        batch=batch,
        max_wait_ms=max_wait_ms,
        max_queue=max_queue,
        buckets=_shardable_buckets(engine, batch, buckets),
    )
    if warmup:
        _warm(engine, batcher)
    httpd = ThreadingHTTPServer(
        (host, port),
        make_handler(
            engine,
            batcher,
            timeout_s=request_timeout_s,
            max_body_bytes=max_body_bytes,
        ),
    )
    return httpd, batcher


def create_multi_server(
    engines,
    host: str = "127.0.0.1",
    port: int = 8000,
    batch: int = 8,
    max_wait_ms: float = 5.0,
    warmup: bool = True,
    request_timeout_s: float = 30.0,
    max_body_bytes: int = 32 * 1024 * 1024,
    max_queue: int = 0,
    buckets=False,
):
    """Serve several models from one daemon: `engines` is {name: engine}
    (classifier and ViTSTR mixed freely), each with its own MicroBatcher
    and route /v1/<name>/classify|recognize. Returns (httpd, {name:
    batcher}); the caller closes all batchers. `batch` may be an int or a
    {name: int} per-model map (an AotEngine's fixed batch must match);
    `buckets` likewise a bool or {name: bool} (baked-batch artifacts
    cannot bucket)."""
    if not engines:
        raise ValueError("create_multi_server needs at least one engine")
    models = []
    for name, engine in engines.items():
        if not name or "/" in name:
            raise ValueError(f"bad model name {name!r} (non-empty, no '/')")
        b = batch[name] if isinstance(batch, dict) else batch
        bk = buckets[name] if isinstance(buckets, dict) else buckets
        models.append(
            _Model(
                name,
                engine,
                MicroBatcher(
                    _engine_predict(engine),
                    batch=b,
                    max_wait_ms=max_wait_ms,
                    max_queue=max_queue,
                    buckets=_shardable_buckets(engine, b, bk),
                ),
            )
        )
    if warmup:
        for m in models:
            _warm(m.engine, m.batcher)
    httpd = ThreadingHTTPServer(
        (host, port),
        make_multi_handler(
            models,
            timeout_s=request_timeout_s,
            max_body_bytes=max_body_bytes,
        ),
    )
    return httpd, {m.name: m.batcher for m in models}
