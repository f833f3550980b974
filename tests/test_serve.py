"""Segmentation server: warm checkpoint, NRRD in -> segmentation NRRD out.

End-to-end over real HTTP on a loopback port: the served label map must be
identical to a direct predict_scan call with the same checkpoint, and the
server must stay up across bad requests. The reference has no serving
surface (its inference only logs W&B overlays,
capstone/interpretability.py:80-83)."""

import http.client
import json
import threading

import numpy as np
import pytest

from ctseg_tpu.inference.predict import predict_scan
from ctseg_tpu.inference.serve import SegmentationService, serve
from ctseg_tpu.testing.synth import make_patient
from ctseg_tpu.training.trainer import TrainConfig, Trainer
from ctseg_tpu.utils import nrrd_io
from ctseg_tpu.utils.miccai import Volume


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    cfg = TrainConfig(
        filters=(4, 8, 16, 32, 64), batch_size=4, transform_degree=1,
        input_size=32,
    )
    tr = Trainer(cfg)
    tr.save(root / "ckpt", tr.init_state())
    return root / "ckpt"


@pytest.fixture(scope="module")
def patient(tmp_path_factory):
    root = tmp_path_factory.mktemp("scans")
    return make_patient(root / "0522c0001", shape=(12, 48, 48), seed=3)


@pytest.fixture(scope="module")
def server(checkpoint):
    service = SegmentationService(checkpoint, crop=False)
    httpd = serve(service, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield service, httpd.server_address[1]
    httpd.shutdown()


def _request(port, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    payload = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), payload


def test_healthz(server):
    service, port = server
    status, ctype, payload = _request(port, "GET", "/healthz")
    assert status == 200 and ctype == "application/json"
    info = json.loads(payload)
    assert info["status"] == "ok"
    assert info["spatial_dims"] == 2
    assert info["filters"] == [4, 8, 16, 32, 64]


def test_segment_matches_direct_prediction(server, patient, tmp_path):
    service, port = server
    scan_bytes = (patient / "img.nrrd").read_bytes()
    status, ctype, payload = _request(port, "POST", "/segment", scan_bytes)
    assert status == 200 and ctype == "application/octet-stream"

    out = tmp_path / "segmentation.nrrd"
    out.write_bytes(payload)
    served_hwd, header = nrrd_io.read(out)
    served = np.transpose(served_hwd, (2, 0, 1))  # (D, H, W)

    volume = Volume.from_nrrd(patient / "img.nrrd")
    direct = predict_scan(
        service.trainer, service._state.params, volume, crop=False
    )
    assert served.shape == direct.shape
    np.testing.assert_array_equal(served, direct)
    # Space metadata survives the round trip (predict.write_artifacts).
    assert "space directions" in header


def test_segment_counts_mode(server, patient):
    service, port = server
    scan_bytes = (patient / "img.nrrd").read_bytes()
    status, ctype, payload = _request(
        port, "POST", "/segment?counts=1", scan_bytes
    )
    assert status == 200 and ctype == "application/json"
    body = json.loads(payload)
    assert body["shape"] == [12, 48, 48]
    assert set(body["voxel_counts"]) == {
        "BrainStem", "Chiasm", "Mandible", "OpticNerve_L", "OpticNerve_R",
        "Parotid_L", "Parotid_R", "Submandibular_L", "Submandibular_R",
    }


def test_bad_requests_do_not_kill_the_server(server, patient):
    service, port = server
    status, _, payload = _request(port, "POST", "/segment", b"not an nrrd")
    assert status == 400
    assert "error" in json.loads(payload)

    status, _, _ = _request(port, "POST", "/segment", b"")
    assert status == 400

    status, _, _ = _request(port, "GET", "/nope")
    assert status == 404

    # Still serving after the errors.
    status, _, _ = _request(port, "GET", "/healthz")
    assert status == 200


def test_concurrent_clients(server, patient, tmp_path):
    """8 simultaneous clients: device work serialized, all replies correct.

    The ThreadingHTTPServer takes one thread per connection; the service
    lock must keep results request-isolated (no cross-talk between the
    counts and NRRD paths) under real concurrency."""
    service, port = server
    scan_bytes = (patient / "img.nrrd").read_bytes()
    before = service.served
    results = [None] * 8
    errors = []

    def hit(i):
        try:
            path = "/segment?counts=1" if i % 2 else "/segment"
            results[i] = _request(port, "POST", path, scan_bytes)
        except Exception as e:  # noqa: BLE001 — surface in the main thread
            errors.append(e)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors
    assert all(r is not None and r[0] == 200 for r in results)
    counts = [json.loads(r[2]) for i, r in enumerate(results) if i % 2]
    nrrds = [r[2] for i, r in enumerate(results) if not i % 2]
    # Identical input -> identical output on every thread. NRRD payloads
    # are compared decoded (the gzip stream embeds a timestamp).
    assert all(c == counts[0] for c in counts)
    decoded = []
    for payload in nrrds:
        f = tmp_path / f"{len(decoded)}.nrrd"
        f.write_bytes(payload)
        decoded.append(nrrd_io.read(f)[0])
    assert all(np.array_equal(d, decoded[0]) for d in decoded)
    assert service.served == before + 8


def test_serve_3d_mixed_depths_share_one_program(tmp_path):
    """A 3D-checkpoint server handles scans of varying depth over real HTTP,
    each reply matches direct predict_scan, and all depths in one window-grid
    bucket reuse a single compiled sliding-window program (the warm-server
    promise: no per-shape recompile per request)."""
    from ctseg_tpu.volumetric.trainer3d import make_trainer_3d

    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32), num_res_units=1, batch_size=1,
        loss_fx=("CrossEntropy",), spatial_dims=3, input_shape=(32, 32, 16),
        in_channels=1,
    )
    tr = make_trainer_3d(cfg, mode="patch", patch_size=(32, 32, 16))
    tr.save(tmp_path / "ckpt3d", tr.init_state())

    service = SegmentationService(
        tmp_path / "ckpt3d", crop=False, patch_size=(32, 32, 16)
    )
    httpd = serve(service, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        port = httpd.server_address[1]
        for i, depth in enumerate((17, 20, 23)):  # one depth bucket (24)
            pdir = make_patient(
                tmp_path / f"0522c000{i}", shape=(depth, 48, 48), seed=i
            )
            scan_bytes = (pdir / "img.nrrd").read_bytes()
            status, ctype, payload = _request(port, "POST", "/segment", scan_bytes)
            assert status == 200 and ctype == "application/octet-stream"
            out = tmp_path / f"seg{i}.nrrd"
            out.write_bytes(payload)
            served = np.transpose(nrrd_io.read(out)[0], (2, 0, 1))
            direct = predict_scan(
                service.trainer, service._state.params,
                Volume.from_nrrd(pdir / "img.nrrd"),
                crop=False, patch_size=(32, 32, 16),
            )
            np.testing.assert_array_equal(served, direct)
        assert len(service.trainer._swin_cache) == 1
    finally:
        httpd.shutdown()


def test_warmup_marks_shape_and_does_not_count_as_served(checkpoint):
    service = SegmentationService(checkpoint, crop=False)
    before = service.served
    secs = service.warmup((8, 40, 40))
    assert secs > 0
    assert service.served == before
    assert (8, 40, 40) in service.warm_shapes
