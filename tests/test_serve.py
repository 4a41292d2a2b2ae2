"""KServe-v2 serving: server <-> client round-trips, YOLO(url) predict/val.

TPU-native counterpart of the reference Triton integration tests
(reference utils/triton.py TritonRemoteModel + nn/autobackend.py triton
branch): the server is ours (serve.py InferenceServer) so the whole protocol
path — JSON + binary tensor extension, metadata, batch bucketing — is
exercised end-to-end in-process with no external deployment.
"""

import json
import urllib.request

import numpy as np
import pytest

from spectrogram_yolov11_tpu.engine.model import YOLO


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    m = YOLO("yolo11n.yaml")
    m._ensure_variables()
    ckpt = tmp / "tiny.ckpt"
    m.save(ckpt)
    from spectrogram_yolov11_tpu.serve import InferenceServer

    srv = InferenceServer({"tiny": str(ckpt)}, port=0).start()
    yield srv, str(ckpt)
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return json.loads(r.read())


def test_health_and_metadata(served):
    srv, _ = served
    base = f"http://127.0.0.1:{srv.port}"
    assert _get(f"{base}/v2/health/ready") == {}
    assert "binary_tensor_data" in _get(f"{base}/v2")["extensions"]
    md = _get(f"{base}/v2/models/tiny")
    assert md["name"] == "tiny"
    assert md["inputs"][0]["datatype"] == "UINT8"
    meta = json.loads(md["parameters"]["metadata"])
    assert meta["task"] == "detect"
    assert [int(s) for s in meta["stride"]] == [8, 16, 32]


def test_remote_model_matches_local_backend(served):
    srv, ckpt = served
    from spectrogram_yolov11_tpu.nn.autobackend import AutoBackend
    from spectrogram_yolov11_tpu.serve import RemoteModel

    x = np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), np.uint8)
    local = np.asarray(AutoBackend(ckpt).forward(x))
    remote = RemoteModel(f"http://127.0.0.1:{srv.port}/tiny")(x)[0]
    assert remote.shape == local.shape
    np.testing.assert_allclose(remote, local, atol=1e-5, rtol=1e-5)


def test_batch_bucketing_pads_and_slices(served):
    srv, _ = served
    from spectrogram_yolov11_tpu.serve import RemoteModel

    x = np.zeros((3, 64, 64, 3), np.uint8)  # pads to the 4-bucket, slices back
    out = RemoteModel(f"http://127.0.0.1:{srv.port}/tiny")(x)[0]
    assert out.shape[0] == 3


def test_json_tensor_path(served):
    """Non-binary (pure JSON data lists) requests per the base v2 protocol."""
    srv, _ = served
    x = np.zeros((1, 64, 64, 3), np.uint8)
    body = json.dumps({
        "inputs": [{"name": "images", "shape": list(x.shape), "datatype": "UINT8",
                    "data": x.reshape(-1).tolist()}],
    }).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/v2/models/tiny/infer", data=body,
        method="POST", headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        doc = json.loads(r.read())
    out = doc["outputs"][0]
    assert out["datatype"] == "FP32" and len(out["data"]) == int(np.prod(out["shape"]))


def test_yolo_url_predict(served):
    srv, _ = served
    m = YOLO(srv.url)
    assert m.task == "detect" and m.backend is not None
    img = np.random.default_rng(1).integers(0, 255, (80, 96, 3), np.uint8)
    res = m.predict(img, imgsz=64, conf=0.0, max_det=5)
    assert len(res) == 1 and len(res[0].boxes) <= 5
    assert res[0].boxes.data.shape[1] == 6


def test_yolo_url_val(served):
    srv, _ = served
    m = YOLO(srv.url)
    metrics = m.val(data="shapes128.yaml", imgsz=64, batch=4, plots=False, verbose=False)
    assert np.isfinite(metrics["metrics/mAP50(B)"])


def test_yolo_url_train_raises(served):
    srv, _ = served
    with pytest.raises(ValueError, match="inference-only"):
        YOLO(srv.url).train(data="shapes128.yaml", epochs=1)


def test_cli_serve_verb(tmp_path, served):
    """`yolo serve ... block=False` binds, serves, and returns the server."""
    _, ckpt = served
    from spectrogram_yolov11_tpu.cfg import entrypoint

    srv2 = entrypoint(f"yolo serve model={ckpt} port=0 block=False")
    try:
        assert _get(f"http://127.0.0.1:{srv2.port}/v2/health/live") == {}
    finally:
        srv2.shutdown()


def test_remote_predict_matches_local_predict(served):
    """The remote path (host BGR->RGB flip + server graph, no on-device flip)
    must produce the SAME detections as the local predictor (on-device flip).
    conf=0 keeps max_det rows regardless of score, so this catches a channel
    swap on any color image even with random-init weights."""
    srv, ckpt = served
    img = np.random.default_rng(2).integers(0, 255, (96, 128, 3), np.uint8)
    kw = dict(imgsz=64, conf=0.0, max_det=8, verbose=False)
    local = YOLO(ckpt).predict(img, **kw)[0].boxes.data
    remote = YOLO(srv.url).predict(img, **kw)[0].boxes.data
    assert local.shape == remote.shape and local.shape[0] == 8
    np.testing.assert_allclose(remote, local, atol=1e-3, rtol=1e-3)


def test_data_parallel_serving_matches(served, tmp_path):
    """data_parallel=True shards request batches over the (virtual 8-device)
    mesh with replicated weights; detections must equal single-device serving
    and any remainder batch must still pad to a mesh-divisible bucket."""
    import jax

    from spectrogram_yolov11_tpu.serve import InferenceServer, RemoteModel

    assert len(jax.devices()) == 8  # conftest virtual mesh
    srv, ckpt = served
    dp = InferenceServer({"tiny": ckpt}, port=0, data_parallel=True).start()
    try:
        x = np.random.default_rng(3).integers(0, 255, (3, 64, 64, 3), np.uint8)
        a = RemoteModel(f"http://127.0.0.1:{srv.port}/tiny")(x)[0]
        b = RemoteModel(f"http://127.0.0.1:{dp.port}/tiny")(x)[0]
        assert b.shape == a.shape
        np.testing.assert_allclose(b, a, atol=1e-4, rtol=1e-4)
    finally:
        dp.shutdown()


@pytest.mark.parametrize("yaml_name,task", [
    ("yolo11n-seg.yaml", "segment"),
    ("yolo11n-pose.yaml", "pose"),
    ("yolo11n-obb.yaml", "obb"),
    ("yolo11n-cls.yaml", "classify"),
])
def test_remote_predict_all_tasks(tmp_path, yaml_name, task):
    """Every task predicts through the server with results matching the local
    predictor (the reference's Triton path is task-generic the same way)."""
    from spectrogram_yolov11_tpu.serve import InferenceServer

    m = YOLO(yaml_name)
    m._ensure_variables()
    ckpt = tmp_path / f"{task}.ckpt"
    m.save(ckpt)
    srv = InferenceServer({task: str(ckpt)}, port=0).start()
    try:
        img = np.random.default_rng(4).integers(0, 255, (96, 128, 3), np.uint8)
        kw = dict(imgsz=64, conf=0.0, max_det=4, verbose=False)
        if task == "classify":
            kw = dict(imgsz=64, verbose=False)
        local = YOLO(str(ckpt)).predict(img, **kw)[0]
        remote = YOLO(f"http://127.0.0.1:{srv.port}/{task}").predict(img, **kw)[0]
        if task == "classify":
            np.testing.assert_allclose(np.asarray(remote.probs.data), np.asarray(local.probs.data),
                                       atol=1e-4, rtol=1e-4)
        elif task == "obb":
            np.testing.assert_allclose(remote.obb.data, local.obb.data, atol=1e-2, rtol=1e-3)
        else:
            np.testing.assert_allclose(remote.boxes.data, local.boxes.data, atol=1e-2, rtol=1e-3)
            if task == "segment" and len(local.boxes):
                a, b = remote.masks.data, local.masks.data
                assert a is not None and a.shape == b.shape
                assert (a == b).mean() > 0.99  # bool masks; resize rounding may flip edge pixels
            if task == "pose" and len(local.boxes):
                np.testing.assert_allclose(remote.keypoints.data, local.keypoints.data,
                                           atol=1e-2, rtol=1e-3)
    finally:
        srv.shutdown()


def test_bytes_png_ingest_matches_raw(served):
    """PNG (lossless) encoded-image ingest must produce bit-identical outputs
    to the raw uint8 tensor path (serve.py BYTES wire format)."""
    from spectrogram_yolov11_tpu.serve import RemoteModel, encode_images

    cli = RemoteModel(f"http://127.0.0.1:{served[0].port}/tiny")
    x = np.random.default_rng(5).integers(0, 255, (3, 64, 64, 3), np.uint8)
    raw = cli(x)[0]
    enc = cli(encode_images(x, fmt=".png"))[0]
    assert enc.shape == raw.shape
    np.testing.assert_array_equal(enc, raw)


def test_bytes_jpeg_and_gray_ingest(served):
    """JPEG ingest decodes server-side; a 1-channel PNG batch decodes and
    broadcasts to 3 channels like the raw gray-upload path."""
    from spectrogram_yolov11_tpu.serve import RemoteModel, encode_images

    cli = RemoteModel(f"http://127.0.0.1:{served[0].port}/tiny")
    x = np.random.default_rng(6).integers(0, 255, (2, 64, 64, 3), np.uint8)
    out = cli(encode_images(x, fmt=".jpg", quality=95))[0]
    assert out.shape[0] == 2 and np.isfinite(out).all()

    gray = np.random.default_rng(7).integers(0, 255, (2, 64, 64, 1), np.uint8)
    enc = cli(encode_images(gray, fmt=".png"))[0]
    raw = cli(gray)[0]
    np.testing.assert_array_equal(enc, raw)


def test_dynamic_batching_aggregates_concurrent_requests(tmp_path, served):
    """Concurrent requests must aggregate into fewer device dispatches
    (continuous batching) while every caller still gets ITS results."""
    import threading
    import time

    from spectrogram_yolov11_tpu.serve import _ModelRunner

    _, ckpt = served
    runner = _ModelRunner(ckpt, name="dyn")
    calls = []
    inner = runner.backend.forward

    def slow_forward(x):
        calls.append(np.asarray(x).shape[0])
        time.sleep(0.2)
        return inner(x)

    runner.backend.forward = slow_forward
    xs = [np.full((1, 64, 64, 3), i, np.uint8) for i in range(6)]
    want = [runner._run_batch(x) for x in xs]  # direct path, no queue
    calls.clear()

    got = [None] * 6

    def req(i):
        got[i] = runner.infer([xs[i]])

    threads = [threading.Thread(target=req, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
        time.sleep(0.01)  # first request dispatches; rest land in the queue
    for t in threads:
        t.join()
    assert len(calls) < 6, f"no aggregation happened: {calls}"
    assert sum(calls) >= 6
    for i in range(6):
        np.testing.assert_allclose(got[i][0], want[i][0], atol=1e-5, rtol=1e-5)


def test_wire_encode_env_predict_matches_local(served, monkeypatch):
    """SYT_WIRE_ENCODE=png routes YOLO(url) predict through the encoded-image
    wire format; detections must match the local predictor exactly."""
    srv, ckpt = served
    img = np.random.default_rng(8).integers(0, 255, (96, 128, 3), np.uint8)
    kw = dict(imgsz=64, conf=0.0, max_det=8, verbose=False)
    local = YOLO(ckpt).predict(img, **kw)[0].boxes.data
    monkeypatch.setenv("SYT_WIRE_ENCODE", "png")
    remote = YOLO(srv.url).predict(img, **kw)[0].boxes.data
    np.testing.assert_allclose(remote, local, atol=1e-3, rtol=1e-3)


def test_model_parallel_serving_matches(served):
    """model_parallel=2 weight-shards big channel dims over the inner 'model'
    axis of a 4x2 mesh (parallel/mesh.py shard_state_over_model_axis);
    detections must equal single-device serving."""
    import jax

    from spectrogram_yolov11_tpu.serve import InferenceServer, RemoteModel

    assert len(jax.devices()) == 8
    srv, ckpt = served
    mp = InferenceServer({"tiny": ckpt}, port=0, data_parallel=True, model_parallel=2).start()
    try:
        runner = mp.models["tiny"]
        assert runner.mesh is not None and runner.mesh.shape == {"data": 4, "model": 2}
        x = np.random.default_rng(4).integers(0, 255, (3, 64, 64, 3), np.uint8)
        a = RemoteModel(f"http://127.0.0.1:{srv.port}/tiny")(x)[0]
        b = RemoteModel(f"http://127.0.0.1:{mp.port}/tiny")(x)[0]
        assert b.shape == a.shape
        np.testing.assert_allclose(b, a, atol=1e-4, rtol=1e-4)
    finally:
        mp.shutdown()
