#!/usr/bin/env python
"""Serving entry point: an HTTP generation service over a trained model.

    python serve.py --run runs/jsb_rnnrbm --port 8787
    python serve.py --config configs/jsb_rnnrbm.json --fresh   # no ckpt (smoke)

Restores the trainer/generator checkpoint artifact (best by default) and
serves continuous-batching generation (multinn_tpu/serving): requests
coalesce into fixed-shape device batches over the fused whole-generation
kernels, with async-dispatch pipelining (BASELINE.md pipelined-serving
rows). Stdlib-only HTTP (the reference has no serving layer — SURVEY §1).

API:
  GET  /healthz    -> {"ok": true, "batch": B, "n_steps": N}
  GET  /stats      -> service counters + latency percentiles
  POST /generate   body (optional JSON): {"format": "midi"|"roll"
                                                    |"roll_packed",
                                          "bpm": 120.0,
                                          "n": 1,   # songs per request (bulk
                                            requests amortize HTTP overhead;
                                            all n coalesce into device batches)
                                          "seed_b64": base64 MIDI bytes or
                                            npz(key "roll") of a frame-space
                                            (T, K, D) pianoroll
                                            to prime on (needs --seed-steps;
                                            with n>1, primes every song),
                                          "given_b64": base64 MIDI bytes
                                            (quantized via the service's
                                            data spec) or npz(key "roll")
                                            of a frame-space pianoroll whose
                                            --accompany-tracks slices are
                                            FIXED while the other tracks are
                                            sampled (accompaniment; mutually
                                            exclusive with seed_b64)}
    -> {"format": ..., "shape": [T, K, D], "provenance": {...},
        "latency_ms": {...},
        "midi_b64": ... | "roll_b64": ...(npz, key "roll")
        | "roll_packed_b64": ...(npz, key "packed" — pitch axis
          np.packbits-ed; inverse: np.unpackbits(z["packed"],
          axis=-1)[..., :D] with D = shape[-1])}
    n>1: "roll_b64" npz holds (n, T, K, D); "midi_b64" becomes a list;
         "provenance"/"latency_ms" become lists
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__, allow_abbrev=False)
    p.add_argument("--run", help="run dir (reads its config.json + ckpt/)")
    p.add_argument("--config", help="explicit config JSON (alternative)")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: best, else latest)")
    p.add_argument("--latest", action="store_true",
                   help="use latest instead of best checkpoint")
    p.add_argument("--fresh", action="store_true",
                   help="serve freshly-initialized params (no checkpoint; "
                        "smoke/load-testing)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--batch", type=int, default=0,
                   help="serving batch (0 = largest fused-gate batch)")
    p.add_argument("--n-steps", type=int, default=0,
                   help="steps per generation (0 = config generate.n_steps)")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="batching window after the first queued request")
    p.add_argument("--pipeline-depth", type=int, default=3,
                   help="max dispatched-but-unfetched device batches")
    p.add_argument("--seed-steps", type=int, default=0,
                   help="enable seeded (priming) requests, normalized to "
                        "this many frames (0 = unseeded-only service)")
    p.add_argument("--accompany-tracks", default="",
                   help="comma-separated track indices: enable ACCOMPANIMENT "
                        "requests ('given_b64' MIDI bytes or npz roll) whose "
                        "listed tracks are fixed while the rest are sampled")
    p.add_argument("--transport", default="auto",
                   choices=("auto", "packed", "sparse"),
                   help="device->host roll transport (ServeConfig.transport)")
    p.add_argument("--accompany-steps", type=int, default=0,
                   help="accompaniment output length (0 = n-steps)")
    p.add_argument("--timeout-s", type=float, default=120.0,
                   help="per-request generation timeout")
    return p.parse_known_args(argv)


def build_service(args, overrides):
    """Config + params -> GenerationService (checkpoint restore mirrors
    generate.py: same artifact, three consumers — SURVEY §5.4)."""
    from multinn_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    from multinn_tpu.utils import config as cfg_mod
    cfg = cfg_mod.load_run_config(args.run, args.config, overrides)

    import jax
    from multinn_tpu.models import multinn
    from multinn_tpu.serving import GenerationService, ServeConfig

    if args.fresh:
        params = multinn.init(jax.random.PRNGKey(cfg.train.seed), cfg.model)
    else:
        from multinn_tpu.data.datasets import Dataset
        from multinn_tpu.training.trainer import Trainer
        trainer = Trainer(cfg, dataset=Dataset(cfg.data))
        step = args.step
        if step is None and not args.latest:
            step = trainer.ckpt.best_step()
        trainer.restore(step=step)
        params = trainer.params
        trainer.close()

    accompany_tracks = tuple(int(t) for t in args.accompany_tracks.split(",")
                             if t.strip() != "")
    serve_cfg = ServeConfig(batch=args.batch, n_steps=args.n_steps,
                            max_wait_ms=args.max_wait_ms,
                            pipeline_depth=args.pipeline_depth,
                            seed=cfg.train.seed,
                            seed_steps=args.seed_steps,
                            accompany_tracks=accompany_tracks,
                            accompany_steps=args.accompany_steps,
                            transport=args.transport)
    return cfg, GenerationService(cfg, params, serve_cfg)


def make_handler(cfg, service, timeout_s: float):
    from multinn_tpu.data import midi as midi_mod
    from multinn_tpu.data import pianoroll as pr
    spec = cfg.data.spec()

    def decode_roll_payload(b64: str, max_steps: int,
                            keep: str = "first") -> np.ndarray:
        """A base64 roll payload: raw MIDI bytes (detected by the SMF
        'MThd' magic; quantized through the service's own grid/track spec,
        mirroring the generate.py --accompany CLI) or an npz with key
        'roll'. Raises on anything else — callers map that to a 400.

        ``max_steps`` caps the decoded roll at what the service actually
        consumes: this is UNTRUSTED input, and a ~100-byte SMF whose
        delta-times sum to billions of ticks would otherwise quantize to
        a multi-GB allocation. ``keep`` matches the downstream
        normalization ("first" for given — _normalize_given reads the
        leading accompany_steps; "last" for seed — _normalize_seed crops
        to the trailing seed_steps). MIDI quantization can only cap from
        the front, so seed MIDI uses a generous bound (set by the caller)
        rather than exactly seed_steps."""
        raw = base64.b64decode(b64)
        if raw[:4] == b"MThd":
            return pr.midi_to_roll(midi_mod.loads(raw), spec,
                                   max_steps=max_steps)
        with np.load(io.BytesIO(raw)) as z:
            roll = z["roll"]
        if keep == "last":
            return (roll[:, -max_steps:] if roll.ndim == 4
                    else roll[-max_steps:])
        return roll[:, :max_steps] if roll.ndim == 4 else roll[:max_steps]

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):          # quiet (stats has the counters)
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True, "batch": service.batch,
                                 "n_steps": service.n_steps})
            elif self.path == "/stats":
                self._send(200, service.stats())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            # drain the body FIRST, whatever the path: under keep-alive an
            # unread body desyncs the connection for the next request
            length = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(length)
            if self.path != "/generate":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                req = json.loads(body or b"{}")
            except ValueError:
                self._send(400, {"error": "body must be JSON"})
                return
            fmt = req.get("format", "midi")
            if fmt not in ("midi", "roll", "roll_packed"):
                self._send(400, {"error": "format must be 'midi', 'roll' "
                                          "or 'roll_packed'"})
                return
            try:
                bpm = float(req.get("bpm", cfg.generate.bpm))
            except (TypeError, ValueError):
                self._send(400, {"error": "bpm must be a number"})
                return
            scfg = service.serve_cfg
            seed = None
            if "seed_b64" in req:
                try:
                    # _normalize_seed crops to the LAST seed_steps; the
                    # 8192-step floor (512 bars) lets any plausible MIDI
                    # quantize fully while still bounding a crafted one
                    seed = decode_roll_payload(
                        req["seed_b64"], max(8192, scfg.seed_steps),
                        keep="last")
                except Exception:
                    self._send(400, {"error": "seed_b64 must be base64 of "
                                              "MIDI bytes or an npz with "
                                              "key 'roll'"})
                    return
            given = None
            if "given_b64" in req:             # accompaniment request
                try:
                    given = decode_roll_payload(
                        req["given_b64"],
                        max(1, scfg.accompany_steps or service.n_steps))
                except Exception:
                    self._send(400, {"error": "given_b64 must be base64 of "
                                              "MIDI bytes or an npz with "
                                              "key 'roll'"})
                    return
            n = req.get("n", 1)
            if type(n) is not int or not 1 <= n <= 1024:
                self._send(400, {"error": "n must be an int in [1, 1024]"})
                return
            try:
                futures = service.submit_many(n, seed=seed, given=given)
            except ValueError as e:            # seed/given validation
                self._send(400, {"error": str(e)})
                return
            except RuntimeError as e:          # service closed
                self._send(503, {"error": str(e)})
                return
            try:
                results = [f.result(timeout=timeout_s) for f in futures]
            except TimeoutError:
                self._send(504, {"error": "generation timed out"})
                return
            except Exception as e:             # drainer-side failure
                self._send(500, {"error": f"generation failed: {e}"})
                return
            prov = [{"batch": r.batch_index, "row": r.row} for r in results]
            lat = [{"queue": round(r.queue_s * 1e3, 2),
                    "total": round(r.total_s * 1e3, 2)} for r in results]
            out = {
                "format": fmt,
                "shape": list(results[0].roll.shape),
                "provenance": prov[0] if n == 1 else prov,
                "latency_ms": lat[0] if n == 1 else lat,
            }
            if fmt == "midi":
                mids = [base64.b64encode(midi_mod.dumps(
                    pr.roll_to_midi(r.roll, spec, bpm=bpm))).decode()
                    for r in results]
                out["midi_b64"] = mids[0] if n == 1 else mids
            else:
                buf = io.BytesIO()
                roll = (results[0].roll if n == 1
                        else np.stack([r.roll for r in results]))
                if fmt == "roll_packed":
                    # pitch axis packbits-ed BEFORE the npz (8x less zlib
                    # input + an 8x smaller decompressed payload for the
                    # client). At MUSICAL densities this measures the
                    # same as "roll" (zlib flies over mostly-zero bytes:
                    # alternated A/B 169.3 vs 168.4 songs/s at full
                    # 64-bar bulks) — the win appears for dense rolls.
                    # Client inverse: np.unpackbits(z["packed"],
                    # axis=-1)[..., :D] with D = shape[-1]
                    np.savez_compressed(buf, packed=np.packbits(roll,
                                                                axis=-1))
                    out["roll_packed_b64"] = base64.b64encode(
                        buf.getvalue()).decode()
                else:
                    np.savez_compressed(buf, roll=roll)
                    out["roll_b64"] = base64.b64encode(
                        buf.getvalue()).decode()
                if n > 1:
                    out["shape"] = list(roll.shape)
            self._send(200, out)

    return Handler


def serve(args, overrides, ready_event: threading.Event = None,
          server_box: list = None) -> int:
    cfg, service = build_service(args, overrides)
    handler = make_handler(cfg, service, args.timeout_s)
    httpd = ThreadingHTTPServer((args.host, args.port), handler)
    is_main = threading.current_thread() is threading.main_thread()
    try:
        # handler installed INSIDE the try: a TERM in the ready/print
        # window below must reach the drain in the finally, not escape
        # serve() as an uncaught KeyboardInterrupt
        if is_main:
            import signal                      # SIGTERM drains like ctrl-C

            def _term(signum, frame):
                raise KeyboardInterrupt
            signal.signal(signal.SIGTERM, _term)
        if server_box is not None:
            server_box.append((httpd, service))
        print(f"serving {cfg.name} on http://{args.host}:{httpd.server_port}"
              f"  (batch={service.batch}, n_steps={service.n_steps}, "
              f"pipeline_depth={service.serve_cfg.pipeline_depth})")
        if ready_event is not None:
            ready_event.set()
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        # shutting down: mask BOTH signals before draining so a repeated
        # ctrl-C / TERM (impatient operator or supervisor) cannot abort
        # the in-flight drain or skip service.close()
        if is_main:
            import signal
            signal.signal(signal.SIGTERM, signal.SIG_IGN)
            signal.signal(signal.SIGINT, signal.SIG_IGN)
        try:                 # a KI already queued before the masking above
            httpd.server_close()
            service.close()
        except KeyboardInterrupt:
            httpd.server_close()
            service.close()
    return 0


def main(argv=None) -> int:
    args, overrides = parse_args(argv)
    try:
        return serve(args, overrides)
    except FileNotFoundError as e:
        print(e, file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
