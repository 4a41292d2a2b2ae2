"""KServe-v2 HTTP inference serving: TPU model server + remote-model client.

TPU-native counterpart of the reference's Triton integration
(/root/reference/ultralytics/utils/triton.py:9 ``TritonRemoteModel``;
``nn/autobackend.py`` triton branch): instead of exporting to ONNX and
deploying behind an external Triton binary, the framework ships its own
inference server — the same task-complete jitted graph the Exporter
serializes (``engine/exporter.py build_inference_fn``) behind the open
KServe v2 predict protocol (JSON tensors + the binary-tensor extension) on a
stdlib ``ThreadingHTTPServer``. ``YOLO("http://host:8000/name")`` then
predicts and vals through it transparently (``nn/autobackend.py``
kind="remote"). Because the protocol is the standard one, ``RemoteModel``
also speaks to any KServe-v2-compliant server (Triton included), and any
KServe client can call this server.

Production/serving notes (TPU-first):

- XLA compiles one program per input shape; the server pads each request's
  batch up to a power-of-two bucket before dispatch and slices the outputs
  back, so arbitrary client batch sizes reuse a handful of compiled
  programs instead of compiling per batch size.
- Requests serialize over the chip behind a lock (a TPU executes one
  program at a time anyway); scale-out is one server process per chip
  behind an ordinary HTTP load balancer, or a ``jax.sharding`` mesh inside
  one process for batch-parallel serving.
- The client sends image tensors via the binary extension (raw bytes after
  the JSON header) — a 640px uint8 batch would be ~7x larger as JSON text.

CLI: ``yolo serve model=runs/.../best.ckpt port=8000`` (cfg/__init__.py).
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Dict, List, Optional, Union
from urllib.parse import urlsplit

import numpy as np

from spectrogram_yolov11_tpu.utils import LOGGER

# KServe v2 datatype names <-> numpy (protocol: kserve.github.io/website/
# docs/concepts/architecture/data-plane/v2-protocol "Tensor Data Types")
_DT2NP = {
    "BOOL": np.bool_, "UINT8": np.uint8, "UINT16": np.uint16, "UINT32": np.uint32,
    "UINT64": np.uint64, "INT8": np.int8, "INT16": np.int16, "INT32": np.int32,
    "INT64": np.int64, "FP16": np.float16, "FP32": np.float32, "FP64": np.float64,
}
_NP2DT = {np.dtype(v): k for k, v in _DT2NP.items()}


def _np_datatype(arr: np.ndarray) -> str:
    try:
        return _NP2DT[arr.dtype]
    except KeyError:
        raise ValueError(f"dtype {arr.dtype} has no KServe v2 datatype") from None


def encode_images(imgs: np.ndarray, fmt: str = ".jpg", quality: int = 90) -> List[bytes]:
    """Encode a (N, H, W, C) uint8 batch to per-image JPEG/PNG bytes for the
    BYTES wire format (Triton's DALI-ensemble deployment pattern: clients ship
    encoded images, the server decodes into the batch). A 640px gray
    spectrogram frame compresses ~10-30x vs raw, so the client->server hop
    stops being the wire bottleneck. fmt: ".jpg" (lossy, quality param) or
    ".png" (lossless, good on synthetic/gray frames)."""
    import cv2

    params = [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)] if fmt in (".jpg", ".jpeg") else []
    out = []
    for im in np.asarray(imgs):
        ok, buf = cv2.imencode(fmt, im, params)
        if not ok:
            raise ValueError(f"cv2.imencode({fmt}) failed for shape {im.shape}")
        out.append(buf.tobytes())
    return out


def _decode_images(blobs: List[bytes]) -> np.ndarray:
    """Per-image encoded bytes -> (N, H, W, C) uint8 batch (server side of the
    BYTES ingest path). Gray frames come back (H, W) and get a channel dim;
    all images in one request must decode to the same shape (clients encode
    already-letterboxed frames)."""
    import cv2

    ims = []
    for b in blobs:
        im = cv2.imdecode(np.frombuffer(b, np.uint8), cv2.IMREAD_UNCHANGED)
        if im is None:
            raise ValueError("cv2.imdecode failed (corrupt or unsupported image bytes)")
        if im.ndim == 2:
            im = im[..., None]
        ims.append(im)
    return np.stack(ims)


class _BatchItem:
    """One queued request: its images, result slot, and completion event."""

    __slots__ = ("imgs", "out", "err", "done")

    def __init__(self, imgs: np.ndarray):
        self.imgs, self.out, self.err = imgs, None, None
        self.done = threading.Event()


def _bucket(n: int) -> int:
    """Next power-of-two batch bucket (static-shape reuse; see module doc)."""
    b = 1
    while b < n:
        b *= 2
    return b


class _ModelRunner:
    """One served model: AutoBackend + compile-cache-friendly batch bucketing.

    With ``data_parallel=True`` and >1 device visible, each request's batch is
    sharded over a ``Mesh(('data',))`` and the weights are replicated — XLA
    splits the forward across chips with zero collectives (embarrassingly
    batch-parallel), so one server process serves a whole pod slice. This is
    the TPU-native scale-up the reference delegates to Triton instance groups.
    """

    def __init__(self, source, name: Optional[str] = None, data_parallel: bool = False,
                 half: bool = False, model_parallel: int = 1,
                 dynamic_batch: bool = True, max_batch: int = 256):
        from spectrogram_yolov11_tpu.nn.autobackend import AutoBackend

        self.backend = source if isinstance(source, AutoBackend) else AutoBackend(str(source), half=half)
        stem = Path(str(getattr(self.backend, "weights", "model"))).stem or "model"
        self.name = name or stem
        self.lock = threading.Lock()
        self._out_specs: Optional[List[dict]] = None
        self.mesh = None
        # continuous dynamic batching (Triton dynamic_batching counterpart,
        # reference utils/triton.py is the client of that server feature):
        # requests that arrive while the chip is busy accumulate in a queue
        # and the dispatcher concatenates same-shape requests into ONE device
        # dispatch — N concurrent clients ride one program execution instead
        # of serializing N tunnel round-trips behind the lock.
        self.max_batch = int(max_batch)
        self._dyn = bool(dynamic_batch)
        self._q: "queue.Queue" = queue.Queue()
        self._dispatcher: Optional[threading.Thread] = None
        if self._dyn:
            self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
            self._dispatcher.start()
        if data_parallel or model_parallel > 1:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec

            from spectrogram_yolov11_tpu.parallel.mesh import get_mesh_2d, shard_state_over_model_axis

            devs = jax.devices()
            if len(devs) > 1 and self.backend.variables is not None:
                mp = max(1, int(model_parallel))
                if len(devs) % mp:
                    LOGGER.warning(f"serve: model_parallel={mp} does not divide {len(devs)} devices; using 1")
                    mp = 1
                # data axis shards request batches; model axis (inner, fast
                # ICI) weight-shards big channel dims — lets a model larger
                # than one chip's HBM serve on a slice (docs/parallel.md)
                self.mesh = get_mesh_2d(devs, model_parallel=mp)
                self.n_dev = self.mesh.shape["data"]
                self._in_shard = NamedSharding(self.mesh, PartitionSpec("data"))
                self.backend.variables = (
                    shard_state_over_model_axis(self.backend.variables, self.mesh)
                    if mp > 1
                    else jax.device_put(self.backend.variables, NamedSharding(self.mesh, PartitionSpec()))
                )
            else:
                LOGGER.warning("serve: data_parallel requested but "
                               f"{len(devs)} device(s) / kind={self.backend.kind}; serving single-device")

    def _outputs(self, arrays: List[np.ndarray]) -> List[dict]:
        return [
            {"name": f"output{i}", "datatype": _np_datatype(a), "shape": list(a.shape)}
            for i, a in enumerate(arrays)
        ]

    def metadata(self, probe_imgsz: int = 64) -> dict:
        """KServe v2 model-metadata document. Output specs are probed with a
        tiny forward on first request (shapes reported with -1 batch/anchor
        dims since they scale with the input)."""
        if self._out_specs is None:
            out = self.infer([np.zeros((1, probe_imgsz, probe_imgsz, 3), np.uint8)])
            specs = self._outputs(out)
            for s in specs:
                s["shape"] = [-1] + [-1 if d > 4 else d for d in s["shape"][1:]]
            self._out_specs = specs
        b = self.backend
        names = getattr(b, "names", {}) or {}
        meta = {
            "task": getattr(b, "task", "detect"),
            "names": {int(k): str(v) for k, v in dict(names).items()},
            "stride": [float(s) for s in np.asarray(getattr(b, "stride", [8, 16, 32])).tolist()],
            "nc": len(names) or None,
        }
        kpt = getattr(getattr(b, "model", None), "kpt_shape", None)
        if kpt:  # pose clients need it to split the keypoint tail
            meta["kpt_shape"] = [int(x) for x in kpt]
        return {
            "name": self.name,
            "versions": ["1"],
            "platform": "jax_xla",
            "inputs": [{"name": "images", "datatype": "UINT8", "shape": [-1, -1, -1, 3]}],
            "outputs": self._out_specs,
            # Triton-config-style metadata escape hatch: the reference stuffs
            # a python-literal 'metadata' into config parameters and the
            # client evals it (triton.py:69); ours is JSON.
            "parameters": {"metadata": json.dumps(meta)},
        }

    def _prep(self, inputs: List[np.ndarray]) -> np.ndarray:
        """Request inputs -> (N, H, W, 3) uint8 batch. Handles the encoded
        (BYTES: per-image JPEG/PNG) and gray-upload wire formats."""
        imgs = inputs[0]
        if isinstance(imgs, (list, tuple)) or (
            isinstance(imgs, np.ndarray) and imgs.dtype == object
        ):
            imgs = _decode_images(list(imgs))
        if imgs.ndim == 4 and imgs.shape[-1] == 1 and not (
            self.backend.variables is not None and self.mesh is None
        ):
            # gray-upload clients (spectrogram frames) send ONE channel to cut
            # the HTTP payload 3x; non-JAX backends want 3 on the host. The
            # local-JAX single-device path instead ships 1 channel over H2D
            # and broadcasts ON DEVICE (_run_batch) — 3x fewer tunnel bytes.
            imgs = np.repeat(imgs, 3, axis=-1)
        return imgs

    def _run_batch(self, imgs: np.ndarray) -> List[np.ndarray]:
        """One device dispatch: pad to a power-of-two bucket, forward, slice."""
        n = imgs.shape[0]
        nb = _bucket(n)
        if self.mesh is not None:  # batch must split evenly over the mesh
            nb = max(nb, self.n_dev)
            nb += (-nb) % self.n_dev  # non-power-of-two device counts
        if nb != n:
            pad = np.zeros((nb - n,) + imgs.shape[1:], imgs.dtype)
            imgs = np.concatenate([imgs, pad], axis=0)
        with self.lock:
            if self.mesh is not None:
                import jax

                imgs = jax.device_put(imgs, self._in_shard)
            elif imgs.ndim == 4 and imgs.shape[-1] == 1:
                # gray H2D: upload (N, H, W, 1) and broadcast to 3 on-device
                import jax
                import jax.numpy as jnp

                if not hasattr(self, "_gray3"):
                    self._gray3 = jax.jit(lambda x: jnp.repeat(x, 3, axis=-1))
                imgs = self._gray3(jax.device_put(imgs))
            out = self.backend.forward(imgs)
        outs = list(out) if isinstance(out, (tuple, list)) else [out]
        return [np.asarray(o)[:n] for o in outs]

    def infer(self, inputs: List[np.ndarray]) -> List[np.ndarray]:
        imgs = self._prep(inputs)
        if not self._dyn:
            return self._run_batch(imgs)
        item = _BatchItem(imgs)
        self._q.put(item)
        item.done.wait()
        if item.err is not None:
            raise item.err
        return item.out

    def _dispatch_loop(self):
        """Continuous batching: block for one request, then drain everything
        that queued while the previous dispatch held the chip, group by image
        shape, and run each group as one concatenated dispatch."""
        while True:
            items = [self._q.get()]
            n = items[0].imgs.shape[0]
            while n < self.max_batch:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                items.append(nxt)
                n += nxt.imgs.shape[0]
            groups: Dict[tuple, List[_BatchItem]] = {}
            for it in items:
                groups.setdefault(it.imgs.shape[1:], []).append(it)
            for group in groups.values():
                try:
                    batch = (
                        group[0].imgs if len(group) == 1
                        else np.concatenate([it.imgs for it in group], axis=0)
                    )
                    outs = self._run_batch(batch)
                    off = 0
                    for it in group:
                        ni = it.imgs.shape[0]
                        it.out = [o[off : off + ni] for o in outs]
                        off += ni
                except Exception as e:  # surface per-request, keep serving
                    for it in group:
                        it.err = e
                finally:
                    for it in group:
                        it.done.set()


def _parse_infer_request(headers, body: bytes):
    """Parse a KServe v2 infer request (JSON, with optional binary tensors)."""
    jlen = headers.get("Inference-Header-Content-Length")
    if jlen is not None:
        jlen = int(jlen)
        doc, raw = json.loads(body[:jlen]), body[jlen:]
    else:
        doc, raw = json.loads(body), b""
    arrays, off = [], 0
    for spec in doc.get("inputs", []):
        shape = [int(d) for d in spec["shape"]]
        bsize = (spec.get("parameters") or {}).get("binary_data_size")
        if spec["datatype"] == "BYTES":
            # KServe BYTES binary layout: per element, 4-byte LE length + raw
            # bytes (protocol "binary tensor data" extension). Used for the
            # encoded-image (JPEG/PNG) ingest path.
            if bsize is None:
                raise ValueError("BYTES inputs require the binary extension")
            blob, end, items = raw[off : off + int(bsize)], int(bsize), []
            p = 0
            while p + 4 <= end:
                ln = int.from_bytes(blob[p : p + 4], "little")
                items.append(bytes(blob[p + 4 : p + 4 + ln]))
                p += 4 + ln
            off += int(bsize)
            arrays.append(items)
            continue
        dt = _DT2NP[spec["datatype"]]
        if bsize is not None:
            a = np.frombuffer(raw[off : off + int(bsize)], dtype=dt).reshape(shape)
            off += int(bsize)
        else:
            a = np.asarray(spec["data"], dtype=dt).reshape(shape)
        arrays.append(a)
    wants_binary = any(
        (o.get("parameters") or {}).get("binary_data") for o in doc.get("outputs", [])
    ) or bool(jlen)
    return doc, arrays, wants_binary


def _encode_infer_response(model_name: str, arrays: List[np.ndarray], binary: bool):
    outs, blobs = [], []
    for i, a in enumerate(arrays):
        spec = {"name": f"output{i}", "datatype": _np_datatype(a), "shape": list(a.shape)}
        if binary:
            blob = np.ascontiguousarray(a).tobytes()
            spec["parameters"] = {"binary_data_size": len(blob)}
            blobs.append(blob)
        else:
            spec["data"] = a.reshape(-1).tolist()
        outs.append(spec)
    head = json.dumps({"model_name": model_name, "outputs": outs}).encode()
    return (head, b"".join(blobs)) if binary else (head, b"")


class InferenceServer:
    """Serve one or more models over the KServe v2 HTTP protocol.

    >>> srv = InferenceServer({"spec": "runs/detect/train/weights/best.ckpt"})
    >>> srv.start()                       # background thread
    >>> YOLO(f"http://127.0.0.1:{srv.port}/spec").predict("img.jpg")
    """

    def __init__(self, models: Union[str, Path, Dict[str, object]],
                 host: str = "127.0.0.1", port: int = 8000, data_parallel: bool = False,
                 half: bool = False, model_parallel: int = 1,
                 dynamic_batch: bool = True, max_batch: int = 256):
        from spectrogram_yolov11_tpu.utils import enable_compile_cache

        enable_compile_cache()  # restarted servers skip the first-jit compile
        if not isinstance(models, dict):
            models = {None: models}
        self.models: Dict[str, _ModelRunner] = {}
        for name, src in models.items():
            r = _ModelRunner(src, name=name, data_parallel=data_parallel, half=half,
                             model_parallel=model_parallel,
                             dynamic_batch=dynamic_batch, max_batch=max_batch)
            self.models[r.name] = r
        self.host, self.port = host, int(port)
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    # -- http plumbing ----------------------------------------------------
    def _handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):  # route into our logger
                LOGGER.debug("serve: " + fmt % args)

            def _send(self, code: int, head: bytes, blob: bytes = b""):
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                if blob:
                    self.send_header("Inference-Header-Content-Length", str(len(head)))
                self.send_header("Content-Length", str(len(head) + len(blob)))
                self.end_headers()
                self.wfile.write(head + blob)

            def _error(self, code: int, msg: str):
                self._send(code, json.dumps({"error": msg}).encode())

            def _model(self, parts):
                name = parts[2] if len(parts) > 2 else ""
                runner = server.models.get(name)
                if runner is None and len(server.models) == 1:
                    runner = next(iter(server.models.values()))
                return runner

            def do_GET(self):
                parts = self.path.strip("/").split("/")
                if self.path in ("/v2/health/live", "/v2/health/ready"):
                    return self._send(200, b"{}")
                if self.path == "/v2":
                    return self._send(200, json.dumps({
                        "name": "spectrogram_yolov11_tpu",
                        "extensions": ["binary_tensor_data"],
                    }).encode())
                if len(parts) >= 2 and parts[0] == "v2" and parts[1] == "models":
                    runner = self._model(parts)
                    if runner is None:
                        return self._error(404, f"unknown model {self.path}")
                    if parts[-1] == "ready":
                        return self._send(200, b"{}")
                    try:
                        return self._send(200, json.dumps(runner.metadata()).encode())
                    except Exception as e:  # surface metadata/probe failures
                        return self._error(500, repr(e))
                return self._error(404, f"no route {self.path}")

            def do_POST(self):
                parts = self.path.strip("/").split("/")
                if not (parts and parts[0] == "v2" and parts[-1] == "infer"):
                    return self._error(404, f"no route {self.path}")
                runner = self._model(parts)
                if runner is None:
                    return self._error(404, f"unknown model {self.path}")
                try:
                    body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                    _, arrays, binary = _parse_infer_request(self.headers, body)
                    out = runner.infer(arrays)
                    head, blob = _encode_infer_response(runner.name, out, binary)
                    return self._send(200, head, blob)
                except Exception as e:
                    LOGGER.warning(f"serve: infer failed: {e!r}")
                    return self._error(400, repr(e))

        return Handler

    # -- lifecycle --------------------------------------------------------
    def start(self) -> "InferenceServer":
        """Bind and serve on a background thread; returns self (port bound)."""
        self._httpd = ThreadingHTTPServer((self.host, self.port), self._handler())
        self.port = self._httpd.server_address[1]  # resolves port=0
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        LOGGER.info(
            f"KServe-v2 inference server on http://{self.host}:{self.port} "
            f"models={list(self.models)}"
        )
        return self

    def serve_forever(self):
        self.start()
        try:
            self._thread.join()
        except KeyboardInterrupt:
            self.shutdown()

    def shutdown(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    @property
    def url(self) -> str:
        name = next(iter(self.models))
        return f"http://{self.host}:{self.port}/{name}"


class RemoteModel:
    """KServe v2 HTTP client — drop-in for the reference ``TritonRemoteModel``
    (/root/reference/ultralytics/utils/triton.py:9): parses
    ``http://<host:port>/<model>``, reads model metadata, and ``__call__``
    sends numpy arrays (binary tensor extension) and returns numpy arrays.
    """

    def __init__(self, url: str, endpoint: str = "", scheme: str = ""):
        if not endpoint and not scheme:
            s = urlsplit(url)
            endpoint, scheme, url = s.path.strip("/").split("/")[0], s.scheme, s.netloc
        if scheme == "grpc":
            raise NotImplementedError("grpc scheme: use http (KServe v2 HTTP protocol)")
        self.url, self.endpoint = url, endpoint
        self.base = f"http://{url}/v2/models/{endpoint}"
        cfg = self._get_json(self.base)
        outs = sorted(cfg.get("outputs") or [], key=lambda x: x.get("name", ""))
        self.input_names = [x["name"] for x in cfg.get("inputs") or []] or ["images"]
        self.input_formats = [x["datatype"] for x in cfg.get("inputs") or []] or ["UINT8"]
        self.np_input_formats = [_DT2NP[f] for f in self.input_formats]
        self.output_names = [x["name"] for x in outs]
        md = (cfg.get("parameters") or {}).get("metadata")
        try:
            self.metadata = json.loads(md) if isinstance(md, str) else (md or {})
        except ValueError:
            self.metadata = {}

    def _get_json(self, url: str) -> dict:
        import urllib.request

        # first metadata read triggers the server's probe forward -> an XLA
        # compile (tens of seconds cold on a contended host); don't time out
        with urllib.request.urlopen(url, timeout=600) as r:
            return json.loads(r.read())

    def __call__(self, *inputs: np.ndarray) -> List[np.ndarray]:
        import urllib.request

        specs, blobs = [], []
        for i, a in enumerate(inputs):
            name = self.input_names[i] if i < len(self.input_names) else f"input{i}"
            if isinstance(a, (list, tuple)) and a and isinstance(a[0], (bytes, bytearray)):
                # encoded-image ingest (see encode_images): KServe BYTES
                # binary layout = per element 4-byte LE length + raw bytes
                blob = b"".join(len(b).to_bytes(4, "little") + bytes(b) for b in a)
                specs.append({
                    "name": name, "shape": [len(a)], "datatype": "BYTES",
                    "parameters": {"binary_data_size": len(blob)},
                })
                blobs.append(blob)
                continue
            x = np.asarray(a)
            if i < len(self.np_input_formats) and x.dtype != self.np_input_formats[i]:
                x = x.astype(self.np_input_formats[i])
            blob = np.ascontiguousarray(x).tobytes()
            specs.append({
                "name": name, "shape": list(x.shape), "datatype": _np_datatype(x),
                "parameters": {"binary_data_size": len(blob)},
            })
            blobs.append(blob)
        head = json.dumps({
            "inputs": specs,
            "outputs": [{"name": n, "parameters": {"binary_data": True}} for n in self.output_names],
        }).encode()
        body = head + b"".join(blobs)
        req = urllib.request.Request(
            f"{self.base}/infer", data=body, method="POST",
            headers={"Content-Type": "application/json",
                     "Inference-Header-Content-Length": str(len(head))},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            jlen = r.headers.get("Inference-Header-Content-Length")
            payload = r.read()
        if jlen is None:
            doc, raw = json.loads(payload), b""
        else:
            doc, raw = json.loads(payload[: int(jlen)]), payload[int(jlen):]
        if "error" in doc:
            raise RuntimeError(f"remote inference failed: {doc['error']}")
        outs, off = {}, 0
        for spec in doc["outputs"]:
            dt = _DT2NP[spec["datatype"]]
            shape = [int(d) for d in spec["shape"]]
            bsize = (spec.get("parameters") or {}).get("binary_data_size")
            if bsize is not None:
                a = np.frombuffer(raw[off : off + int(bsize)], dtype=dt).reshape(shape)
                off += int(bsize)
            else:
                a = np.asarray(spec["data"], dtype=dt).reshape(shape)
            outs[spec["name"]] = a
        names = self.output_names or sorted(outs)
        return [outs[n] for n in names]


def _remote_forward(backend):
    """Host pipeline hands BGR (cv2); the export/serve graph contract is RGB
    with no on-device flip (exporter.py build_inference_fn) — flip here. A
    gray (1-channel) batch passes through unchanged (the flip is identity)
    and the server broadcasts it to 3 (_ModelRunner.infer)."""

    def fwd(imgs_u8):
        arr = np.asarray(imgs_u8)[..., ::-1]
        return backend.forward(np.ascontiguousarray(arr))

    return fwd


class RemotePredictor:
    """Predict through a remote server for every task: host letterbox ->
    remote forward (the export nms=False layout: decoded preds + per-task
    extras) -> local jitted NMS / mask / keypoint postprocess. Mirrors the
    reference flow where the Triton server runs the network and the client
    predictor postprocesses (reference nn/autobackend.py triton branch +
    engine/predictor.py postprocess)."""

    def __new__(cls, backend, overrides=None):
        import jax
        import jax.numpy as jnp

        from spectrogram_yolov11_tpu.engine.predictor import (
            BasePredictor, ClassificationPredictor, OBBPredictor, PosePredictor,
            SegmentationPredictor)
        from spectrogram_yolov11_tpu.ops.nms import (
            nms_rotated, non_max_suppression, non_max_suppression_extras)

        task = getattr(backend, "task", "detect")
        fwd = _remote_forward(backend)

        class _Detect(BasePredictor):
            def _build_device_fn(self):
                args, nc = self.args, self.model.nc
                nms_kw = dict(
                    conf_thres=float(args.conf), iou_thres=float(args.iou), nc=nc,
                    multi_label=False, agnostic=bool(args.agnostic_nms),
                    max_det=int(args.max_det),
                    classes=None if args.classes is None else jnp.asarray(args.classes),
                    pre_nms_topk=int(getattr(args, "pre_nms_topk", 0) or 0) or 1024,
                )
                nms = jax.jit(lambda p: non_max_suppression(p, **nms_kw))

                def run(_variables, imgs_u8):
                    out = fwd(imgs_u8)
                    preds = out[0] if isinstance(out, (tuple, list)) else out
                    return nms(jnp.asarray(preds))

                return run

        class _Segment(SegmentationPredictor):
            def _build_device_fn(self):
                args, nc = self.args, self.model.nc

                import functools

                @functools.partial(jax.jit, static_argnums=(2, 3))
                def post(preds, proto, in_h, in_w):
                    from spectrogram_yolov11_tpu.ops.masks import crop_masks_device

                    out, nv = non_max_suppression_extras(
                        preds, conf_thres=float(args.conf), iou_thres=float(args.iou),
                        nc=nc, max_det=int(args.max_det))
                    masks = jax.nn.sigmoid(jnp.einsum("bdk,bhwk->bdhw", out[..., 6:], proto))
                    # crop to box (reference process_mask, ops.py:679)
                    masks = crop_masks_device(masks, out[..., :4], (in_h, in_w))
                    return out[..., :6], nv, masks

                def run(_variables, imgs_u8):
                    preds, proto = fwd(imgs_u8)
                    h, w = np.asarray(imgs_u8).shape[1:3]
                    return post(jnp.asarray(preds), jnp.asarray(proto), int(h), int(w))

                return run

        class _Pose(PosePredictor):
            def _build_device_fn(self):
                args, nc = self.args, self.model.nc
                nms = jax.jit(lambda p: non_max_suppression_extras(
                    p, conf_thres=float(args.conf), iou_thres=float(args.iou),
                    nc=nc, max_det=int(args.max_det)))

                def run(_variables, imgs_u8):
                    out = fwd(imgs_u8)  # preds+decoded kpts (B, A, 4+nc+nk*nd)
                    preds = out[0] if isinstance(out, (tuple, list)) else out
                    return nms(jnp.asarray(preds))

                return run

        class _OBB(OBBPredictor):
            def _build_device_fn(self):
                args, nc = self.args, self.model.nc
                nms = jax.jit(lambda p: nms_rotated(
                    p, conf_thres=float(args.conf), iou_thres=float(args.iou),
                    nc=nc, max_det=int(args.max_det)))

                def run(_variables, imgs_u8):
                    out = fwd(imgs_u8)  # decoded rboxes (B, A, 4+nc+1)
                    preds = out[0] if isinstance(out, (tuple, list)) else out
                    return nms(jnp.asarray(preds))

                return run

        class _Classify(ClassificationPredictor):
            def _build_device_fn(self):
                def run(_variables, imgs_u8):
                    out = fwd(imgs_u8)  # server already applies softmax
                    return out[0] if isinstance(out, (tuple, list)) else out

                return run

        P = {"detect": _Detect, "world": _Detect, "segment": _Segment,
             "pose": _Pose, "obb": _OBB, "classify": _Classify}.get(task)
        if P is None:
            raise NotImplementedError(
                f"remote predict: task {task!r} not supported; "
                "use RemoteModel directly for raw outputs, or val via YOLO(url).val")

        meta = type("RemoteMeta", (), {})()
        meta.names = dict(getattr(backend, "names", {}) or {})
        meta.nc = len(meta.names) or 80
        meta.stride = np.asarray(getattr(backend, "stride", [8.0, 16.0, 32.0]))
        meta.task, meta.end2end = task, False
        if getattr(backend, "kpt_shape", None):
            meta.kpt_shape = tuple(backend.kpt_shape)
        return P(meta, None, overrides=overrides)


def serve(models, host: str = "127.0.0.1", port: int = 8000,
          block: bool = True, data_parallel: bool = False, half: bool = False,
          model_parallel: int = 1, dynamic_batch: bool = True,
          max_batch: int = 256) -> InferenceServer:
    """Entry used by ``yolo serve`` (cfg/__init__.py) and programmatic users."""
    srv = InferenceServer(models, host=host, port=port, data_parallel=data_parallel, half=half,
                          model_parallel=model_parallel, dynamic_batch=dynamic_batch,
                          max_batch=max_batch)
    if block:
        srv.serve_forever()
    else:
        srv.start()
    return srv
