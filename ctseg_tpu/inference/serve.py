"""Warm segmentation server: checkpoint loaded once, scans served over HTTP.

Production-serving counterpart of the one-shot prediction CLI
(inference/predict.py). The reference has no serving surface at all — its
only inference path re-loads the model per script run and logs W&B overlays
(capstone/interpretability.py:28-31,80-83). Here a single process:

  - restores the checkpoint once (2D slice model or 3D volumetric model,
    auto-detected from embedded hparams, as in predict.py);
  - keeps the jitted pipelines warm across requests (first request per
    volume shape compiles; the persistent XLA compilation cache makes
    restarts warm too);
  - serves concurrent clients with a threading HTTP server; device work is
    serialized under a lock so HBM stays bounded at one volume in flight.

Endpoints:
  GET  /healthz            -> JSON {status, model, served, warm}
  POST /segment            -> body: an NRRD scan (img.nrrd bytes);
                              response: segmentation.nrrd bytes (uint8
                              label map 0..9, PDDCA axis order, space
                              metadata carried over).
       ?counts=1           -> respond with JSON per-structure voxel counts
                              instead of the NRRD payload.
       ?crop=0             -> segment the full volume instead of the
                              anatomical head-and-neck box.

Usage:
  python -m ctseg_tpu.inference.serve --checkpoint storage/model_large \\
      --port 8080 --warmup 96 280 280
  curl -s --data-binary @img.nrrd localhost:8080/segment > segmentation.nrrd
"""

import json
import tempfile
import threading
import time
from argparse import ArgumentParser
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Dict, Optional, Tuple
from urllib.parse import parse_qs, urlparse

import numpy as np

from ctseg_tpu.constants import STRUCTURES
from ctseg_tpu.inference.predict import predict_scan, write_artifacts
from ctseg_tpu.training.trainer import Trainer
from ctseg_tpu.utils import nrrd_io
from ctseg_tpu.utils.miccai import Volume


class SegmentationService:
    """Checkpoint loaded once; thread-safe `segment` over raw volumes."""

    def __init__(
        self,
        checkpoint: str,
        crop: bool = True,
        patch_size: Tuple[int, int, int] = (128, 128, 48),
        overlap: float = 0.5,
    ):
        self.trainer, self._state = Trainer.restore(checkpoint)
        self.checkpoint = str(checkpoint)
        self.crop = crop
        self.patch_size = tuple(patch_size)
        self.overlap = overlap
        self._lock = threading.Lock()  # serializes device work
        # Counters get their own lock: info()/healthz must not block behind
        # an in-flight segmentation (cold compiles hold _lock for seconds).
        self._stats_lock = threading.Lock()
        self.served = 0
        self.warm_shapes: set = set()

    def info(self) -> Dict:
        cfg = self.trainer.config
        with self._stats_lock:
            served, warm = self.served, sorted(map(list, self.warm_shapes))
        return {
            "status": "ok",
            "checkpoint": self.checkpoint,
            "spatial_dims": cfg.spatial_dims,
            "filters": list(cfg.filters),
            "num_res_units": cfg.num_res_units,
            "crop": self.crop,
            "served": served,
            "warm_shapes": warm,
        }

    def segment(self, volume: Volume, crop: Optional[bool] = None) -> np.ndarray:
        """(D, H, W) label map for one scan; serialized on the device."""
        with self._lock:
            labels = predict_scan(
                self.trainer,
                self._state.params,
                volume,
                crop=self.crop if crop is None else crop,
                patch_size=self.patch_size,
                overlap=self.overlap,
            )
            with self._stats_lock:
                self.served += 1
                self.warm_shapes.add(tuple(volume.as_numpy()[0].shape))
            return labels

    def warmup(self, shape: Tuple[int, int, int]) -> float:
        """Trigger compilation for (D, H, W)-shaped scans; returns seconds."""
        t0 = time.time()
        data = np.zeros(shape, np.float32)
        self.segment(Volume(data[None]))
        with self._stats_lock:
            self.served -= 1  # warmup is not a served request
        return time.time() - t0


def _nrrd_from_bytes(payload: bytes) -> Volume:
    with tempfile.NamedTemporaryFile(suffix=".nrrd") as f:
        f.write(payload)
        f.flush()
        return Volume.from_nrrd(f.name)


def _nrrd_to_bytes(labels: np.ndarray, header: Optional[Dict]) -> bytes:
    with tempfile.TemporaryDirectory() as d:
        write_artifacts(Path(d), labels, header, structures=False)
        return (Path(d) / "segmentation.nrrd").read_bytes()


def make_handler(service: SegmentationService):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _reply(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj: Dict) -> None:
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):  # noqa: N802 (http.server API)
            if urlparse(self.path).path == "/healthz":
                self._json(200, service.info())
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path != "/segment":
                self._json(404, {"error": f"no route {url.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0:
                    raise ValueError("empty body (expected NRRD bytes)")
                volume = _nrrd_from_bytes(self.rfile.read(length))
            except Exception as e:  # noqa: BLE001 — client error
                self._json(400, {"error": str(e)})
                return
            try:
                q = parse_qs(url.query)
                crop = None
                if "crop" in q:
                    crop = q["crop"][0] not in ("0", "false")
                labels = service.segment(volume, crop=crop)
                if q.get("counts", ["0"])[0] in ("1", "true"):
                    counts = np.bincount(labels.ravel(), minlength=10)
                    self._json(200, {
                        "voxel_counts": {
                            s: int(n)
                            for s, n in zip(STRUCTURES, counts[1:])
                        },
                        "shape": list(labels.shape),
                    })
                else:
                    self._reply(
                        200,
                        _nrrd_to_bytes(labels, volume.header),
                        "application/octet-stream",
                    )
            except Exception as e:  # noqa: BLE001 — server error
                self._json(500, {"error": str(e)})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve(service: SegmentationService, host: str, port: int):
    """Build the HTTP server (call .serve_forever() on the result)."""
    return ThreadingHTTPServer((host, port), make_handler(service))


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from ctseg_tpu.models.released import (
        add_released_args,
        resolve_checkpoint_arg,
    )

    parser = ArgumentParser(description="Serve a segmentation checkpoint")
    parser.add_argument(
        "--checkpoint",
        default=None,
        help="native checkpoint dir or a reference Lightning .ckpt file",
    )
    add_released_args(parser)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--no_crop", action="store_true")
    parser.add_argument("--patch_size", type=int, nargs=3,
                        default=(128, 128, 48), help="3D checkpoints only")
    parser.add_argument("--overlap", type=float, default=0.5)
    parser.add_argument(
        "--warmup", type=int, nargs=3, default=None, metavar=("D", "H", "W"),
        help="compile for this scan shape before accepting traffic",
    )
    args = parser.parse_args()

    checkpoint = resolve_checkpoint_arg(args)
    service = SegmentationService(
        checkpoint, crop=not args.no_crop,
        patch_size=tuple(args.patch_size), overlap=args.overlap,
    )
    if args.warmup:
        secs = service.warmup(tuple(args.warmup))
        print(f"warmup {tuple(args.warmup)}: {secs:.1f}s")
    server = serve(service, args.host, args.port)
    print(f"serving {checkpoint} on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
