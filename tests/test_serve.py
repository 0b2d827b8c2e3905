"""Serving layer test: real HTTP round-trips against a live server thread."""

import base64
import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

from stroke_derenderer_tpu.config import BinarizerConfig, StrokesConfig
from stroke_derenderer_tpu.pipeline import Binarizer, StrokeEstimator
from stroke_derenderer_tpu.serve import BatchWorker, make_handler


@pytest.fixture(scope="module")
def server():
    binarizer = Binarizer(BinarizerConfig(features=(8, 16), bottleneck=32,
                                          compute_dtype="float32"))
    estimator = StrokeEstimator(StrokesConfig(
        encoder_arch="tiny", embed_dim=16, attention_dim=16, decoder_dim=16,
        max_length=12, compute_dtype="float32"))
    worker = BatchWorker(binarizer, estimator, window_s=0.02)
    worker.start()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _png_bytes(w=500, h=150):
    img = np.full((h, w, 3), 255, np.uint8)
    img[60:64, 50:450] = 0
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=10) as r:
        assert json.loads(r.read()) == {"ok": True}


def test_binarize_endpoint(server):
    status, out = _post(server + "/binarize", _png_bytes())
    assert status == 200
    assert out["height"] == 150 and out["width"] == 500
    png = base64.b64decode(out["binarized_png_b64"])
    mask = np.asarray(Image.open(io.BytesIO(png)))
    assert mask.shape[0] == 128
    assert "strokes" not in out


def test_derender_endpoint(server):
    status, out = _post(server + "/derender", _png_bytes())
    assert status == 200
    assert isinstance(out["strokes"], list)
    for x, y in out["strokes"]:
        assert len(x) == len(y)
    assert "svg" not in out


def test_derender_svg(server):
    status, out = _post(server + "/derender?svg=1", _png_bytes())
    assert status == 200
    assert out["svg"].startswith("<svg")
    import xml.etree.ElementTree as ET
    root = ET.fromstring(out["svg"])
    assert root.attrib["viewBox"] == "0 0 500 150"  # original-image coords


def test_concurrent_requests_batched(server):
    """Parallel requests must all succeed (and ride the batching queue)."""
    results = []

    def hit():
        results.append(_post(server + "/derender", _png_bytes(w=420)))

    threads = [threading.Thread(target=hit) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(status == 200 for status, _ in results)
    assert max(out["batch_size"] for _, out in results) >= 1


def test_bad_image_is_400(server):
    status, out = _post(server + "/binarize", b"garbage not a png")
    assert status == 400
    assert "error" in out


def test_metrics_endpoint(server):
    # Generate some traffic first so counters are non-trivial.
    _post(server + "/binarize", _png_bytes())
    with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
        m = json.loads(r.read())
    assert m["requests"].get("/binarize", 0) >= 1
    assert m["batches"] >= 1
    assert m["uptime_s"] > 0
    lat = m["latency_s"]["binarize"]
    assert lat["n"] >= 1 and lat["p50"] is not None
    assert sum(m["batch_size_hist"].values()) == m["batches"]

    with urllib.request.urlopen(server + "/metrics?format=prom",
                                timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    assert 'sd_requests_total{endpoint="/binarize"}' in text
    assert "sd_uptime_seconds" in text
