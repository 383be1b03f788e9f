"""Serving subsystem: AOT export round-trip, bucket padding, and the
dynamic-batching HTTP server end to end on a bundled demo clip (CPU)."""

import http.client
import json
import os
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy compiles / CLI+serving integration

DEMO_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "videotransformer_tpu", "data", "assets", "demo")


def _tiny_model(num_frames=8, num_class=10):
    from videotransformer_tpu.models import TimeSformer
    from videotransformer_tpu.ops.blocks import ClassificationHead

    model = TimeSformer(num_frames=num_frames, img_size=224, patch_size=16,
                        embed_dims=32, num_heads=2, num_transformer_layers=1,
                        attention_type="divided_space_time")
    head = ClassificationHead(num_class, 32)
    clip = jnp.zeros((3, num_frames, 3, 224, 224), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clip)["params"]
    head_params = head.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 32)))["params"]
    return model, head, params, head_params


def test_export_roundtrip_and_padding(tmp_path):
    from videotransformer_tpu.serving import (
        export_predictor, load_predictor, make_predict_fn)

    model, head, params, head_params = _tiny_model()
    path = str(tmp_path / "artifact")
    export_predictor(path, model, head, params, head_params,
                     num_frames=8, num_class=10, buckets=(2, 4),
                     platforms=("cpu",))
    pred = load_predictor(path)
    assert pred.buckets == [2, 4]

    rng = np.random.RandomState(0)
    clips = jnp.asarray(rng.rand(3, 3, 8, 3, 224, 224), jnp.float32)
    direct = make_predict_fn(model, head, 10, 3)(params, head_params, clips)
    got = pred(clips)  # B=3 pads to bucket 4
    np.testing.assert_allclose(np.asarray(got), np.asarray(direct),
                               rtol=1e-4, atol=1e-5)

    # chunking: B=5 > max bucket runs as 4 + 1(padded to 2)
    clips5 = jnp.asarray(rng.rand(5, 3, 8, 3, 224, 224), jnp.float32)
    direct5 = make_predict_fn(model, head, 10, 3)(params, head_params, clips5)
    np.testing.assert_allclose(np.asarray(pred(clips5)), np.asarray(direct5),
                               rtol=1e-4, atol=1e-5)


def test_export_raw_input_mode(tmp_path):
    """Raw-uint8 artifact: the eval preprocessing (resize + ThreeCrop +
    normalize) runs inside the exported program; its logits must match
    preprocessing on the outside + the clips-mode predict."""
    from videotransformer_tpu.data.device_augment import eval_preprocess_batch
    from videotransformer_tpu.serving import (
        export_predictor, load_predictor, make_predict_fn)

    model, head, params, head_params = _tiny_model()
    path = str(tmp_path / "raw_artifact")
    export_predictor(path, model, head, params, head_params,
                     num_frames=8, num_class=10, buckets=(2,),
                     platforms=("cpu",), input_mode="raw", raw_hw=(256, 342))
    pred = load_predictor(path)
    assert pred.input_mode == "raw"
    assert pred.input_dtype == np.uint8
    assert pred.input_shape == (8, 256, 342, 3)

    rng = np.random.RandomState(1)
    raw = (rng.rand(2, 8, 256, 342, 3) * 255).astype(np.uint8)
    got = pred(raw)

    clips = eval_preprocess_batch(jnp.asarray(raw), img_size=224,
                                  three_crop=True)  # (B*3, T, C, S, S)
    clips = clips.reshape(2, 3, *clips.shape[1:])
    want = make_predict_fn(model, head, 10, 3)(params, head_params, clips)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_export_serving_cli(tmp_path, monkeypatch):
    """The export CLI writes a loadable artifact (tiny geometry via the
    patched model builder; the real one is B/16)."""
    from videotransformer_tpu.models import TimeSformer
    from videotransformer_tpu.serving import load_predictor
    from videotransformer_tpu.tools import export_serving

    monkeypatch.setattr(
        export_serving, "build_model",
        lambda arch, num_frames, attention_type=None: TimeSformer(
            num_frames=num_frames, img_size=224, patch_size=16,
            embed_dims=32, num_heads=2, num_transformer_layers=1,
            attention_type="divided_space_time"))
    out = str(tmp_path / "art")
    export_serving.main([
        "--out", out, "--num_class", "10", "--buckets", "2",
        "--platforms", "cpu"])
    pred = load_predictor(out)
    logits = pred(np.zeros((1, 3, 8, 3, 224, 224), np.float32))
    assert logits.shape == (1, 10)


@pytest.mark.skipif(not os.path.isdir(DEMO_DIR), reason="no demo assets")
def test_server_end_to_end():
    """POST two real clips concurrently through the HTTP front end; the
    predictions must equal the direct predict path and the collector must
    have batched at least one request pair."""
    from videotransformer_tpu.serving import InferenceServer, make_predict_fn

    model, head, params, head_params = _tiny_model()
    predict = jax.jit(make_predict_fn(model, head, 10, 3))

    def predictor(clips):
        return predict(params, head_params, jnp.asarray(clips))

    classmap = {f"class_{i}": str(i) for i in range(10)}
    # frame_interval=5 -> the 8x5=40-frame window covers the whole 40-frame
    # demo asset, so TemporalRandomCrop always starts at 0 and host
    # preprocessing is deterministic (needed for the equivalence check)
    server = InferenceServer(predictor, num_frames=8, frame_interval=5,
                             max_batch=4, batch_window_ms=200.0,
                             classmap=classmap)
    port = server.serve(port=0)
    try:
        mp4s = sorted(f for f in os.listdir(DEMO_DIR) if f.endswith(".mp4"))
        payloads = [open(os.path.join(DEMO_DIR, f), "rb").read()
                    for f in mp4s[:2]]

        results = {}

        def post(i, body):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            conn.request("POST", "/predict", body=body)
            resp = conn.getresponse()
            results[i] = (resp.status, json.loads(resp.read()))

        threads = [threading.Thread(target=post, args=(i, b))
                   for i, b in enumerate(payloads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert all(results[i][0] == 200 for i in range(2)), results
        for i in range(2):
            body = results[i][1]
            assert body["class"].startswith("class_")
            assert len(body["top5"]) == 5

        # direct-path equivalence for the first clip (preprocessing is
        # deterministic here — see the frame_interval note above)
        clip = server.preprocess_bytes(payloads[0])
        direct = np.asarray(predictor(clip[None]))[0]
        assert int(np.argmax(direct)) == results[0][1]["class_id"]

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["requests"] == 2 and stats["errors"] == 0
        assert sum(stats["batch_histogram"].values()) >= 1
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read())["ok"]
    finally:
        server.stop()


def test_server_raw_mode_http(tmp_path):
    """The HTTP front end with a raw-input artifact: preprocess_bytes must
    decode to the canonical uint8 clip (NOT the host crop stack) and the
    exported program must accept it — regression for the raw-mode /predict
    path, which previously always host-preprocessed to f32 crops."""
    from videotransformer_tpu.serving import (
        InferenceServer, export_predictor, load_predictor)

    model, head, params, head_params = _tiny_model()
    path = str(tmp_path / "raw_artifact")
    export_predictor(path, model, head, params, head_params,
                     num_frames=8, num_class=10, buckets=(1, 2),
                     platforms=("cpu",), input_mode="raw", raw_hw=(64, 86))
    pred = load_predictor(path)
    server = InferenceServer(pred, num_frames=8, frame_interval=5,
                             img_size=224, max_batch=2,
                             batch_window_ms=50.0)
    port = server.serve(port=0)
    try:
        mp4 = sorted(f for f in os.listdir(DEMO_DIR)
                     if f.endswith(".mp4"))[0]
        body = open(os.path.join(DEMO_DIR, mp4), "rb").read()

        clip = server.preprocess_bytes(body)
        assert clip.dtype == np.uint8 and clip.shape == (8, 64, 86, 3)

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/predict", body=body)
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        out = json.loads(resp.read())
        assert len(out["top5"]) == 5
    finally:
        server.stop()
