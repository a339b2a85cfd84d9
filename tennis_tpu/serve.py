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
- ``POST /caption`` — body: ``np.save`` bytes of a float (T, D) frame-feature
  sequence → ``{"caption": str, "tokens": [str], "frames_used": int}``.
  Mounted when ``--caption_model_id`` names a captioning experiment or
  ``--caption_from_export`` names a frozen artifact (features path; the GNMT
  beam decode runs as ONE compiled static-shape program, coalesced by its
  own batcher).
- ``GET /healthz``  — liveness + counters (requests served, batches run, mean
  rows per batch; caption counters when mounted)

Batching: requests park in a queue; a single dispatcher thread drains up to
``--batch_size`` of them (waiting at most ``--max_wait_ms`` after the first),
edge-pads to the static batch shape, runs the jitted step, and wakes each
waiter with its row. One device consumer thread means the jitted callable
needs no locking. Decode uses the native libjpeg path (DCT-domain downscale)
with a cv2 fallback, like the training loader.

Run: ``python -m tennis_tpu.serve --model_id 0006 --backbone DenseNet121
--port 8000``, or from an ahead-of-time export (``tennis_tpu.export``) with
zero model-code/checkpoint access — the deployment-fleet shape:
``python -m tennis_tpu.serve --from_export 0006.hlo --port 8000`` (the
artifact's sidecar pins the static batch and crop geometry).
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
flags.DEFINE_integer("request_timeout_s", 120,
                     "Per-request wait on the device batch before answering "
                     "503; /healthz reports 'stalled' past the same bound",
                     lower_bound=1, flag_values=FLAGS)
flags.DEFINE_string("caption_model_id", "",
                    "Captioning experiment id; non-empty mounts POST /caption "
                    "(features-path GNMT beam decode)", flag_values=FLAGS)
flags.DEFINE_multi_string(
    "gnmt_flag", [],
    "Architecture flags forwarded to the train_gnmt flag surface when "
    "loading --caption_model_id (e.g. --gnmt_flag=--num_hidden=256 "
    "--gnmt_flag=--feats_model=0006)", flag_values=FLAGS)
flags.DEFINE_integer("src_max_len", 128,
                     "Static source length for /caption: posted feature "
                     "sequences are truncated/padded to this many frames "
                     "(one compiled beam program)", lower_bound=1,
                     flag_values=FLAGS)
flags.DEFINE_integer("caption_batch_size", 4,
                     "Static device batch for /caption coalescing",
                     lower_bound=1, flag_values=FLAGS)
flags.DEFINE_string("from_export", "",
                    "Path to a tennis_tpu.export artifact: serve /predict "
                    "from the frozen StableHLO program (zero model code / "
                    "checkpoint access; --backbone/--model_id/--data_shape/"
                    "--batch_size come from its sidecar)", flag_values=FLAGS)
flags.DEFINE_string("caption_from_export", "",
                    "Path to a tennis_tpu.export --kind captioner artifact: "
                    "mount POST /caption from the frozen beam program "
                    "(--caption_batch_size/--src_max_len come from its "
                    "sidecar)", flag_values=FLAGS)

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
    h, w = rgb.shape[:2]
    # resize_shorter scales the LONG side by data_shape/short: a degenerate
    # 1xN image would ask cv2 for a multi-GB buffer before failing — reject
    # extreme aspect ratios up front (broadcast frames are ~16:9)
    if min(h, w) == 0 or max(h, w) / min(h, w) > 20:
        raise ValueError(f"degenerate image geometry {h}x{w}")
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
        # monotonic start of the device call in flight, None when idle: the
        # tunneled TPU HANGS (not errors) when the tunnel dies, and a wedged
        # dispatcher must show up on /healthz, not keep answering 'ok'
        self.inflight_since: float | None = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, img: np.ndarray, timeout: float | None = None):
        done = threading.Event()
        box: list = [None, None]  # result row | exception
        self._q.put((img, done, box))
        if not done.wait(timeout):
            raise TimeoutError("inference batch did not complete in time")
        if box[1] is not None:
            raise box[1]
        return box[0]

    def stalled(self, bound_s: float) -> bool:
        start = self.inflight_since
        return start is not None and time.monotonic() - start > bound_s

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
            if isinstance(imgs[0], tuple):
                # multi-component samples (e.g. captioning: features + valid
                # length) stack per component and fan out as positional args
                args = tuple(np.stack(c) for c in zip(*imgs))
            else:
                args = (np.stack(imgs),)
            self.inflight_since = time.monotonic()
            try:
                out = self._fn(*args)
                out = out if isinstance(out, list) else np.asarray(out)
                # count BEFORE waking waiters: a /healthz racing the released
                # requests must never see requests > 0 with batches == 0
                self.batches += 1
                self.rows += n
                for i, (_, done, box) in enumerate(items):
                    box[0] = out[i]
                    done.set()
            except Exception as e:  # surface device errors on every waiter
                self.batches += 1
                self.rows += n
                for _, done, box in items:
                    box[1] = e
                    done.set()
            finally:
                self.inflight_since = None


def build_service():
    """Load the experiment's best checkpoint and return (handler_cls, batcher).

    Split from ``serve()`` so tests can mount the handler on an ephemeral-port
    server without going through flag parsing twice.
    """
    from tennis_tpu.utils.tunnel import ensure_live_backend

    if not ensure_live_backend():
        logging.warning("TPU tunnel unreachable — serving on CPU")

    if FLAGS.from_export:
        # deployment path: the frozen program + sidecar ARE the model — its
        # geometry is baked in, so the sidecar (not the flags) decides the
        # static batch and crop side the batcher must pad to
        from tennis_tpu.export import load_exported

        classes, predict_probs, meta = load_exported(FLAGS.from_export)
        batch_size, data_shape = meta["batch_size"], meta["data_shape"]
        if batch_size != FLAGS.batch_size or data_shape != FLAGS.data_shape:
            logging.info(
                "export sidecar overrides flags: batch_size=%d data_shape=%d "
                "(artifact %s, experiment %s epoch %d)", batch_size,
                data_shape, FLAGS.from_export, meta["model_id"], meta["epoch"])
    else:
        from tennis_tpu.inference import load_classifier

        classes, predict_probs, _info = load_classifier(
            FLAGS.backbone, FLAGS.model_id, FLAGS.data_shape, FLAGS.root)
        batch_size, data_shape = FLAGS.batch_size, FLAGS.data_shape

    # compile + warm before accepting traffic: the first request must not eat
    # the (potentially minutes-long) DenseNet compile
    predict_probs(np.zeros((batch_size, data_shape, data_shape, 3), np.uint8))
    batcher = Batcher(predict_probs, batch_size, FLAGS.max_wait_ms / 1e3)
    timeout_s = float(FLAGS.request_timeout_s)

    cap_batcher = None
    feat_dim = src_max_len = 0
    if FLAGS.caption_from_export:
        from tennis_tpu.export import load_exported_captioner

        _toks, caption_fn, cmeta = load_exported_captioner(
            FLAGS.caption_from_export)
        feat_dim, src_max_len = cmeta["feat_dim"], cmeta["src_max_len"]
        cap_batch = cmeta["batch_size"]
        if cap_batch != FLAGS.caption_batch_size:
            logging.info("captioner sidecar overrides flags: batch_size=%d "
                         "src_max_len=%d", cap_batch, src_max_len)
    elif FLAGS.caption_model_id:
        from tennis_tpu.inference import load_captioner

        src_max_len = FLAGS.src_max_len
        _vocab, caption_fn, cap_info = load_captioner(
            FLAGS.caption_model_id, root=FLAGS.root,
            gnmt_argv=FLAGS.gnmt_flag, src_max_len=src_max_len)
        feat_dim = cap_info["feat_dim"]
        cap_batch = FLAGS.caption_batch_size
    if feat_dim:
        # warm the beam program too (compile before traffic, same rule)
        caption_fn(np.zeros((cap_batch, src_max_len, feat_dim), np.float32),
                   np.ones((cap_batch,), np.int32))
        cap_batcher = Batcher(caption_fn, cap_batch, FLAGS.max_wait_ms / 1e3)

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
            stalled = batcher.stalled(timeout_s) or (
                cap_batcher is not None and cap_batcher.stalled(timeout_s))
            payload = {
                "status": "stalled" if stalled else "ok",
                "requests": batcher.rows,
                "batches": batcher.batches,
                "mean_rows_per_batch": round(
                    batcher.rows / max(batcher.batches, 1), 2),
            }
            if cap_batcher is not None:
                payload["caption_requests"] = cap_batcher.rows
                payload["caption_batches"] = cap_batcher.batches
            self._reply(503 if stalled else 200, payload)

        def _read_body(self):
            try:
                length = int(self.headers.get("Content-Length") or 0)
            except ValueError:
                length = 0
            if length <= 0:
                self._reply(400, {"error": f"bad Content-Length {length}"})
                return None
            if length > _MAX_BODY:
                self._reply(413, {"error": f"body over {_MAX_BODY}B"})
                return None
            return self.rfile.read(length)

        def _submit(self, b, item):
            """Batcher round-trip with the shared error→status mapping;
            returns the row or None after an error reply."""
            try:
                return b.submit(item, timeout=timeout_s)
            except TimeoutError:
                self._reply(503, {"error": "inference timed out"})
            except Exception as e:  # device-side failure: a 500, not a
                logging.exception("batch failed")  # dropped connection
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})
            return None

        def do_POST(self):
            if self.path == "/caption":
                return self._do_caption()
            if self.path != "/predict":
                return self._reply(404, {"error": "unknown path"})
            body = self._read_body()
            if body is None:
                return
            try:
                img = decode_rgb(body, data_shape)
            except Exception as e:
                # cv2.error/MemoryError from adversarial images are the
                # client's fault too — a 400, never a dropped connection
                return self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            probs = self._submit(batcher, img)
            if probs is None:
                return
            self._reply(200, {
                "label": classes[int(np.argmax(probs))],
                "probs": [round(float(p), 6) for p in probs],
                "classes": classes,
            })

        def _do_caption(self):
            """POST /caption — body: ``np.save`` bytes of a float (T, D) frame
            feature sequence (D = the vision experiment's feature dim) →
            ``{"caption": str, "tokens": [str], "frames_used": int}``.
            Sequences longer than --src_max_len use the first src_max_len
            frames; all requests run through ONE compiled beam program."""
            if cap_batcher is None:
                return self._reply(404, {
                    "error": "no captioner mounted (start with "
                             "--caption_model_id or --caption_from_export)"})
            body = self._read_body()
            if body is None:
                return
            import io

            try:
                feats = np.load(io.BytesIO(body), allow_pickle=False)
            except Exception as e:
                return self._reply(400, {"error": f"body is not a .npy "
                                                  f"array: {e}"})
            if feats.ndim != 2 or feats.shape[0] < 1:
                return self._reply(400, {
                    "error": f"expected (T, {feat_dim}) features, got "
                             f"{feats.shape}"})
            # a well-formed .npy can carry strings/datetimes/timedeltas —
            # whitelist real numeric kinds before the float32 copy below
            # (np.number would admit timedelta64, which subclasses integer)
            if feats.dtype.kind not in "fiu":
                return self._reply(400, {
                    "error": f"expected real numeric features, got dtype "
                             f"{feats.dtype}"})
            if feats.shape[1] != feat_dim:
                return self._reply(400, {
                    "error": f"feature dim {feats.shape[1]} != model's "
                             f"{feat_dim}"})
            n = min(feats.shape[0], src_max_len)
            padded = np.zeros((src_max_len, feat_dim), np.float32)
            padded[:n] = feats[:n]
            tokens = self._submit(cap_batcher, (padded, np.int32(n)))
            if tokens is None:
                return
            self._reply(200, {
                "caption": " ".join(tokens),
                "tokens": list(tokens),
                "frames_used": int(n),
            })

        def log_message(self, fmt, *args):  # route to absl, not stderr
            logging.info("%s %s", self.address_string(), fmt % args)

    return Handler, batcher


def serve():
    handler, batcher = build_service()
    httpd = ThreadingHTTPServer((FLAGS.host, FLAGS.port), handler)
    logging.info("listening on http://%s:%d (batch %d, max wait %d ms)",
                 *httpd.server_address, batcher._batch, FLAGS.max_wait_ms)
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
