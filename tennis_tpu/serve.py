"""Online HTTP serving for the event classifier (beyond-parity tool).

The reference has no serving story at all — scoring new data means building a
TenniSet directory tree and running its offline evaluator (reference
evaluate.py:78-270). tennis_tpu already closes the offline gap with
``predict.py``; this driver closes the online one: a dependency-free
(stdlib ``http.server``) endpoint that decodes posted JPEGs, coalesces
concurrent requests into ONE static-shape device batch (a single XLA program —
no shape-polymorphic recompiles), and answers each request with the class
distribution.

API:

- ``POST /predict`` — body: JPEG bytes → ``{"label": str, "probs": [float],
  "classes": [str]}``
- ``GET /healthz``  — liveness + counters (requests served, batches run, mean
  rows per batch)

Batching: requests park in a queue; a single dispatcher thread drains up to
``--batch_size`` of them (waiting at most ``--max_wait_ms`` after the first),
edge-pads to the static batch shape, runs the jitted step, and wakes each
waiter with its row. One device consumer thread means the jitted callable
needs no locking. Decode uses the native libjpeg path (DCT-domain downscale)
with a cv2 fallback, like the training loader.

Run: ``python -m tennis_tpu.serve --model_id 0006 --backbone DenseNet121
--port 8000``
"""
from __future__ import annotations

import json
import os
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
from absl import flags, logging

# module-local namespace: the flag names overlap the vision drivers', which
# define them on the GLOBAL FlagValues (same rule as predict.py)
FLAGS = flags.FlagValues()

flags.DEFINE_string("root", "data", "Dataset root (classes.names lookup only)",
                    flag_values=FLAGS)
flags.DEFINE_string("model_id", "0000", "Experiment id holding the checkpoint",
                    flag_values=FLAGS)
flags.DEFINE_string("backbone", "DenseNet121", "Backbone CNN name",
                    flag_values=FLAGS)
flags.DEFINE_integer("data_shape", 512, "Input crop side", flag_values=FLAGS)
flags.DEFINE_string("host", "127.0.0.1", "Bind address", flag_values=FLAGS)
flags.DEFINE_integer("port", 8000, "Bind port (0 = ephemeral)",
                     flag_values=FLAGS)
flags.DEFINE_integer("batch_size", 8, "Static device batch (coalescing cap)",
                     lower_bound=1, flag_values=FLAGS)
flags.DEFINE_integer("max_wait_ms", 5,
                     "Max wait after the first queued request before "
                     "dispatching a partial batch", lower_bound=0,
                     flag_values=FLAGS)

_MAX_BODY = 32 * 2**20  # reject absurd uploads before reading them


def decode_rgb(data: bytes, data_shape: int) -> np.ndarray:
    """JPEG bytes → uint8 RGB after the eval geometry (Resize+32, CenterCrop).

    Native libjpeg path first (DCT-domain downscale for oversized sources,
    same as the training loader), cv2.imdecode fallback for everything else.
    """
    from tennis_tpu.data.transforms import test_geometry
    from tennis_tpu.native.jpeg import decode_jpeg

    rgb = decode_jpeg(data, min_short=data_shape + 32)
    if rgb is None:
        import cv2

        bgr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if bgr is None:
            raise ValueError("body is not a decodable image")
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    return test_geometry(rgb, data_shape)


class Batcher:
    """Coalesce concurrent single-image requests into static device batches.

    ``submit`` parks the calling (server) thread; the one dispatcher thread
    drains up to ``batch_size`` requests — waiting at most ``max_wait_s``
    after the first — edge-pads to the static shape, runs ``fn`` once, and
    hands each waiter its row. Single consumer ⇒ ``fn`` needs no lock.
    """

    def __init__(self, fn, batch_size: int, max_wait_s: float):
        self._fn = fn
        self._batch = batch_size
        self._wait = max_wait_s
        self._q: queue.Queue = queue.Queue()
        self.batches = 0
        self.rows = 0
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, img: np.ndarray):
        done = threading.Event()
        box: list = [None, None]  # result row | exception
        self._q.put((img, done, box))
        done.wait()
        if box[1] is not None:
            raise box[1]
        return box[0]

    def _drain(self):
        first = self._q.get()  # block until there is work
        items = [first]
        deadline = time.monotonic() + self._wait
        while len(items) < self._batch:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                items.append(self._q.get(timeout=left))
            except queue.Empty:
                break
        return items

    def _run(self):
        while True:
            items = self._drain()
            n = len(items)
            imgs = [it[0] for it in items]
            imgs.extend([imgs[-1]] * (self._batch - n))  # edge-pad: static shape
            try:
                out = np.asarray(self._fn(np.stack(imgs)))
                for i, (_, done, box) in enumerate(items):
                    box[0] = out[i]
                    done.set()
            except Exception as e:  # surface device errors on every waiter
                for _, done, box in items:
                    box[1] = e
                    done.set()
            self.batches += 1
            self.rows += n


def build_service():
    """Load the experiment's best checkpoint and return (handler_cls, state).

    Split from ``serve()`` so tests can mount the handler on an ephemeral-port
    server without going through flag parsing twice.
    """
    import jax
    import jax.numpy as jnp

    from tennis_tpu.data.tennis_set import load_classes
    from tennis_tpu.data.transforms import device_prepare
    from tennis_tpu.models import FrameModel, get_backbone
    from tennis_tpu.parallel import create_train_state, sgd_with_schedule
    from tennis_tpu.parallel.mesh import driver_compiler_options
    from tennis_tpu.utils import checkpoint as ckpt
    from tennis_tpu.utils.experiments import experiment_dir
    from tennis_tpu.utils.tunnel import ensure_live_backend

    if not ensure_live_backend():
        logging.warning("TPU tunnel unreachable — serving on CPU")

    classes = load_classes(FLAGS.root)
    model = FrameModel(get_backbone(FLAGS.backbone, dtype=jnp.bfloat16),
                       num_classes=len(classes), dtype=jnp.bfloat16)
    tx, _ = sgd_with_schedule(0.001)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, FLAGS.data_shape, FLAGS.data_shape, 3), jnp.float32),
        tx, {"train": True},
    )
    exp_dir = experiment_dir("vision", FLAGS.model_id)
    best = ckpt.best_epoch(exp_dir)
    if best is None:
        latest = ckpt.latest_epoch(exp_dir)
        if latest is None:
            raise FileNotFoundError(f"no checkpoints in {exp_dir}")
        best = (latest, float("nan"))
    state = ckpt.load_state(ckpt.epoch_path(exp_dir, best[0]), state)
    logging.info("serving epoch %d (score=%s) from %s", best[0], best[1],
                 exp_dir)

    from functools import partial

    @partial(jax.jit, compiler_options=driver_compiler_options(FLAGS.backbone))
    def eval_step(params, batch_stats, images):
        x = device_prepare(images)
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=False)
        return jax.nn.softmax(logits, axis=-1)

    def run(images: np.ndarray) -> np.ndarray:
        return jax.device_get(eval_step(state.params, state.batch_stats,
                                        images))

    # compile + warm before accepting traffic: the first request must not eat
    # the (potentially minutes-long) DenseNet compile
    run(np.zeros((FLAGS.batch_size, FLAGS.data_shape, FLAGS.data_shape, 3),
                 np.uint8))
    batcher = Batcher(run, FLAGS.batch_size, FLAGS.max_wait_ms / 1e3)
    data_shape = FLAGS.data_shape
    served = {"requests": 0}

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, {"error": "unknown path"})
            self._reply(200, {
                "status": "ok",
                "requests": served["requests"],
                "batches": batcher.batches,
                "mean_rows_per_batch": round(
                    batcher.rows / max(batcher.batches, 1), 2),
            })

        def do_POST(self):
            if self.path != "/predict":
                return self._reply(404, {"error": "unknown path"})
            length = int(self.headers.get("Content-Length") or 0)
            if not 0 < length <= _MAX_BODY:
                return self._reply(413 if length else 400,
                                   {"error": f"bad Content-Length {length}"})
            try:
                img = decode_rgb(self.rfile.read(length), data_shape)
            except ValueError as e:
                return self._reply(400, {"error": str(e)})
            probs = batcher.submit(img)
            served["requests"] += 1
            self._reply(200, {
                "label": classes[int(np.argmax(probs))],
                "probs": [round(float(p), 6) for p in probs],
                "classes": classes,
            })

        def log_message(self, fmt, *args):  # route to absl, not stderr
            logging.info("%s %s", self.address_string(), fmt % args)

    return Handler, batcher


def serve():
    handler, _ = build_service()
    httpd = ThreadingHTTPServer((FLAGS.host, FLAGS.port), handler)
    logging.info("listening on http://%s:%d (batch %d, max wait %d ms)",
                 *httpd.server_address, FLAGS.batch_size, FLAGS.max_wait_ms)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
    return httpd


def main(argv=None):
    # reset between in-process invocations: absl FlagValues keep previously
    # parsed values for flags the new argv doesn't mention
    FLAGS.unparse_flags()
    FLAGS(argv if argv is not None else sys.argv)
    return serve()


if __name__ == "__main__":
    main()
