"""HTTP inference server tests: a real ThreadingHTTPServer on an ephemeral
port, driven with http.client — health, predictions matching the local
Predictor, logits echo, and the 4xx error paths."""

import http.client
import io
import json
import threading

import jax
import numpy as np
import pytest

from vit_rpe_rope_tpu import serving
from vit_rpe_rope_tpu.cli import serve as serve_cli
from vit_rpe_rope_tpu.configs import ViTConfig
from vit_rpe_rope_tpu.data.datasets import NATIVE_SIZE, NORMALIZATION
from vit_rpe_rope_tpu.models import vit

TINY = dict(img_size=8, patch_size=4, in_chans=1, embed_dim=16, depth=1,
            num_heads=2, attention_impl="reference")


@pytest.fixture(scope="module")
def server_and_predictor():
    cfg = ViTConfig(**TINY, pos_encoding="absolute")
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    mean, std = NORMALIZATION["mnist"]
    native = NATIVE_SIZE["mnist"]
    predictor = serving.Predictor.from_params(params, cfg, mean, std, native)
    server = serve_cli.make_server(predictor, "127.0.0.1", 0, max_batch=8)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield server.server_address[1], predictor, native
    server.shutdown()


def _post(port, body, path="/predict"):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", path, body=body)
    resp = conn.getresponse()
    out = resp.status, json.loads(resp.read())
    conn.close()
    return out


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def test_health(server_and_predictor):
    port, _, _ = server_and_predictor
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/health")
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    assert resp.status == 200
    assert body == {"status": "ok", "input_shape": [28, 28, 1]}


def test_predict_matches_local(server_and_predictor):
    port, predictor, native = server_and_predictor
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (4, native, native, 1), dtype=np.uint8)
    status, body = _post(port, _npz_bytes(images=images))
    assert status == 200
    assert body["predictions"] == predictor.predict(images).tolist()
    assert "logits" not in body

    status, body = _post(port, _npz_bytes(images=images),
                         path="/predict?logits=1")
    assert status == 200
    np.testing.assert_allclose(np.asarray(body["logits"]),
                               predictor.logits(images), atol=1e-5)


def test_predict_single_image_gets_batch_dim(server_and_predictor):
    port, predictor, native = server_and_predictor
    img = np.zeros((native, native, 1), np.uint8)
    status, body = _post(port, _npz_bytes(images=img))
    assert status == 200
    assert body["predictions"] == predictor.predict(img).tolist()


def test_error_paths(server_and_predictor):
    port, _, native = server_and_predictor
    status, body = _post(port, b"not an npz")
    assert status == 400 and "npz" in body["error"]

    bad = np.zeros((2, native, native, 1), np.float32)
    status, body = _post(port, _npz_bytes(images=bad))
    assert status == 400 and "uint8" in body["error"]

    big = np.zeros((9, native, native, 1), np.uint8)  # max_batch=8
    status, body = _post(port, _npz_bytes(images=big))
    assert status == 413

    status, body = _post(port, _npz_bytes(images=big), path="/other")
    assert status == 404


def test_body_size_cap_and_shape_validation(server_and_predictor):
    port, _, native = server_and_predictor
    # Oversized body rejected BEFORE buffering (max_batch=8 -> ~1 MB cap).
    status, body = _post(port, b"x" * (3 << 20))
    assert status == 413 and "limit" in body["error"]
    # Wrong spatial shape -> 400 (not a 500 from inside the jitted call).
    wrong = np.zeros((2, native + 4, native + 4, 1), np.uint8)
    status, body = _post(port, _npz_bytes(images=wrong))
    assert status == 400 and "does not match" in body["error"]


def test_logits_query_is_parsed_not_substring_matched(server_and_predictor):
    port, _, native = server_and_predictor
    images = np.zeros((1, native, native, 1), np.uint8)
    for q in ("?nologits=1", "?logits=10", "?logits=0"):
        status, body = _post(port, _npz_bytes(images=images),
                             path="/predict" + q)
        assert status == 200 and "logits" not in body, q
    status, body = _post(port, _npz_bytes(images=images),
                         path="/predict?logits=1&other=2")
    assert status == 200 and "logits" in body


def test_cli_conflicts():
    with pytest.raises(SystemExit):
        serve_cli.main([])
    with pytest.raises(SystemExit):
        serve_cli.main(["--artifact", "m.stablehlo", "ckpt.npz"])
    with pytest.raises(SystemExit):
        serve_cli.main(["--artifact", "m.stablehlo", "--int8"])


def test_cli_serves_checkpoint(tmp_path):
    from vit_rpe_rope_tpu.utils import checkpoint

    cfg = ViTConfig(**TINY, pos_encoding="rope-axial")
    params = vit.init_params(jax.random.PRNGKey(1), cfg)
    ckpt = checkpoint.save(str(tmp_path / "mnist_rope-axial_best.npz"),
                           jax.device_get(params), vit.buffers(cfg),
                           aliases=vit.reference_alias_keys(cfg))
    server = serve_cli.main([ckpt, "--port", "0", "--grid_size", "2",
                             "--num_heads", "2"], serve_forever=False)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        mean, std = NORMALIZATION["mnist"]
        native = NATIVE_SIZE["mnist"]
        rng = np.random.default_rng(2)
        images = rng.integers(0, 256, (3, native, native, 1), dtype=np.uint8)
        want = serving.Predictor.from_params(params, cfg, mean, std,
                                             native).predict(images)
        status, body = _post(port, _npz_bytes(images=images))
        assert status == 200
        assert body["predictions"] == want.tolist()
    finally:
        server.shutdown()
