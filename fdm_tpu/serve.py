"""Batched HTTP serving for the audio -> 3D-face-animation pipeline.

Production-serving surface beyond the reference's script-per-clip model
(reference samples/sample_diffusion_*.py and demo/*.py run batch 1, one
process per clip): a resident server keeps the compiled pipeline warm and
batches CONCURRENT requests into one device call — the measured-fastest
path (per-clip RTF 0.0077 at batch 32 bf16 vs 0.0131 single-clip on v5e;
bench records). Stdlib http.server only; no framework dependency.

  python -m fdm_tpu serve --dataset mead --stage1 s1.msgpack \
      --stage2 s2.msgpack --port 8061

  POST /animate?emotion=happy&style=3[&sampler=ddim&steps=50][&cfg_scale=2.5]
      body: RIFF wav bytes (any PCM rate; resampled to the dataset's 16 kHz)
      -> .npy bytes, (T, in_dim) float32 vertex animation
      headers: X-Frames, X-Fps, X-Batch-Size (clips sharing the device call)
  GET /healthz -> JSON service stats

Requests are grouped by (bucketed length, sampler, steps, cfg_scale) —
XLA programs are shape-specialized, so only same-shape clips share a
call; batch sizes pad up to power-of-two buckets to bound compile count.
"""

from __future__ import annotations

import dataclasses
import io
import json
import queue
import tempfile
import threading
import time
from typing import Optional

import numpy as np


@dataclasses.dataclass
class _Pending:
    wav: np.ndarray                    # float32 mono @ dataset sr
    emotion: Optional[str]
    style: int
    sampler: str
    steps: Optional[int]
    cfg_scale: Optional[float]
    seed: int
    dtype: str = "float32"             # response dtype; float16 halves the
                                       # device->host payload (cast ON
                                       # device, before the download)
    deadline: Optional[float] = None   # time.monotonic() bound; the worker
                                       # drops requests whose client has
                                       # already timed out (no dead device
                                       # work after a backend stall)
    # filled by _prepare / the worker
    T: int = 0
    T_pad: int = 0
    done: threading.Event = dataclasses.field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    batch_size: int = 0
    error: Optional[str] = None


class RequestTimeout(RuntimeError):
    """A request waited longer than the service's timeout (e.g. a wedged
    device backend); mapped to HTTP 503 so clients can retry elsewhere."""


class AnimationService:
    """Holds the warm pipeline and a batching worker thread.

    `submit()` blocks until the animation is ready (HTTP handler threads
    park here); the single worker drains the queue in `batch_window_ms`
    windows and executes one jitted generate per shape-compatible group.
    """

    def __init__(self, cfg, stage1: Optional[str] = None,
                 stage2: Optional[str] = None,
                 audio_params: Optional[str] = None,
                 template_file: Optional[str] = None,
                 flame_model: Optional[str] = None,
                 seed: int = 0, allow_tiny: bool = False,
                 max_batch: int = 8, batch_window_ms: float = 30.0,
                 request_timeout_s: float = 900.0,
                 allowed_steps: Optional[tuple] = None,
                 dp: bool = False):
        import jax
        import jax.numpy as jnp
        from fdm_tpu.cli.common import (
            AudioFrontend, load_params, make_pipeline, resolve_template,
        )

        self.cfg = cfg
        self.max_batch = int(max_batch)
        self.batch_window_s = float(batch_window_ms) / 1000.0
        # default bound for HTTP-boundary waits: a wedged device backend
        # (documented 20-40 min tunnel stalls) must not pin handler threads
        # and queued requests forever
        self.request_timeout_s = float(request_timeout_s)
        # XLA specializes the sampler program on `steps`, so a free-running
        # client value would compile a fresh program per distinct integer
        # (minutes each on remote-compile backends) — bound it to a small
        # menu. None in the set stands for "dataset default".
        if allowed_steps is None:
            menu = {None, 10, 25, 50, 100, 250, 500, 1000}
            allowed_steps = tuple(
                s for s in menu
                if s is None or s <= cfg.diffusion.timesteps
            )
        self.allowed_steps = tuple(allowed_steps)
        self.frontend = AudioFrontend(
            cfg, audio_params, seed=seed, allow_tiny=allow_tiny
        )
        self.ld = make_pipeline(cfg)
        self.template = resolve_template(cfg, template_file, flame_model)
        # device-resident once: generate() only ever adds the template to
        # the decoded motion, which broadcasts (1, 1, in_dim) over any B —
        # re-uploading a per-batch broadcast copy would cost ~10 ms/batch
        # over slow links and make the program's input shape B-dependent
        self._template_dev = jax.device_put(self.template)

        key = jax.random.PRNGKey(seed)
        T0 = cfg.train.frame_bucket
        if stage1:
            self.vq_params = load_params(stage1)
        else:
            emo0 = (
                jnp.eye(cfg.fdm.emotion_classes)[None, 0]
                if cfg.fdm.emotion_classes else None
            )
            self.vq_params = jax.jit(self.ld.vqvae.init)(
                key, jnp.zeros((1, T0, cfg.vqvae.in_dim)),
                jnp.asarray(self.template), emo0,
            )
        if stage2:
            self.fdm_params = load_params(stage2)
        else:
            L = T0 * cfg.fdm.tokens_per_frame
            hidden0 = self.frontend(
                np.zeros((1, int(T0 * cfg.dataset.audio_sr / cfg.dataset.fps)
                          + 320), np.float32), T0,
            )
            emo0 = (
                jnp.eye(cfg.fdm.emotion_classes)[None, 0]
                if cfg.fdm.emotion_classes else None
            )
            self.fdm_params = jax.jit(self.ld.fdm.init)(
                jax.random.PRNGKey(seed + 1),
                jnp.zeros((1, L, cfg.vqvae.zquant_dim)),
                jnp.zeros((1,), jnp.int32), hidden0,
                jnp.eye(cfg.fdm.style_classes)[None, 0], emo0,
            )

        # params stay jit ARGUMENTS (closure capture bakes them into the
        # program as HLO constants — minutes of compile per shape)
        def _generate(vq_p, fdm_p, hidden, tmpl, style, emo, k,
                      sampler, steps, cfg_scale, cfg_off):
            # cfg_off (STATIC) forces guidance off with python 0.0 — a
            # traced zero would take the CFG branch and return the
            # UNCONDITIONAL output instead of the conditional one
            return self.ld.generate(
                vq_p, fdm_p, k, hidden, tmpl, style, emo,
                sampler=sampler, num_steps=steps,
                cfg_scale=0.0 if cfg_off else cfg_scale,
            )

        # cfg_scale stays a TRACED argument (None => server config
        # default, decided statically by pytree structure): it is
        # client-controlled, and a static float would compile a fresh
        # sampler program per distinct guidance strength
        self._generate = jax.jit(
            _generate, static_argnames=("sampler", "steps", "cfg_off")
        )

        # --dp: data-parallel serving over every visible chip. Params and
        # the template replicate once; _execute pads each batch to a
        # multiple of the mesh size and shards its leading axis, so XLA
        # partitions the whole sampler row-wise over ICI (generation is
        # per-clip independent — no collectives). Throughput scales with
        # the slice; per-batch latency stays the single-row latency.
        self._data_sharding = None
        self._dp_size = 1
        if dp:
            if jax.device_count() > 1:
                from fdm_tpu.parallel import (
                    batch_sharding, make_mesh, replicated_sharding,
                )

                mesh = make_mesh()
                repl = replicated_sharding(mesh)
                self.vq_params, self.fdm_params = jax.device_put(
                    (self.vq_params, self.fdm_params), repl
                )
                self._template_dev = jax.device_put(self.template, repl)
                self._data_sharding = batch_sharding(mesh)
                self._dp_size = int(mesh.devices.size)
            else:
                print("note: serve --dp with a single visible device "
                      "is a no-op")

        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "clips_batched": 0,
                      "errors": 0, "expired": 0}
        # handler threads and the worker both bump counters; += is a
        # non-atomic read-modify-write across threads
        self._stats_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _count(self, key: str, n: int = 1) -> None:
        with self._stats_lock:
            self.stats[key] += n

    def warmup(self, seconds=(10.0,), batch_sizes=None,
               steps=(None,)) -> None:
        """Precompile the serving programs for the given clip lengths,
        batch buckets, and step counts BEFORE the first client arrives (a
        cold first request pays the sampler compile — measured 23-60 s per
        shape on remote-compile backends; the persistent compilation cache
        makes later restarts fast).

        batch_sizes=None warms EVERY power-of-two bucket up to max_batch —
        the only batch shapes _execute can produce — so no live flush,
        whatever the 30 ms window accumulated, compiles on the request
        path (an unwarmed intermediate bucket was the round-4 serve-bench
        p95 tail). `steps` should list the step counts production traffic
        will request (None = the config default): the scan length is baked
        into the program, so each distinct count is its own compile.

        Builds the batches DIRECTLY (bypassing the queue) so the intended
        (length-bucket, batch-bucket) program compiles deterministically —
        funneling concurrent submits through the live batch window was a
        timing race that could silently warm only B=1 — and RAISES on any
        failure instead of reporting success over swallowed errors."""
        from fdm_tpu.cli.common import default_sampler

        if batch_sizes is None:
            # _execute pads every flush to a power-of-two bucket, so the
            # reachable batch shapes are the pow2 ladder up to the first
            # power of two >= max_batch (not max_batch itself)
            batch_sizes, b = [], 1
            while b < self.max_batch:
                batch_sizes.append(b)
                b *= 2
            batch_sizes.append(b)

        sampler = default_sampler(self.cfg)
        for secs in seconds:
            n = int(secs * self.cfg.dataset.audio_sr)
            for b in batch_sizes:
                for step in steps:
                    reqs = [
                        _Pending(
                            wav=np.zeros(n, np.float32), emotion=None,
                            style=0, sampler=sampler, steps=step,
                            cfg_scale=None, seed=0,
                        )
                        for _ in range(b)
                    ]
                    for req in reqs:
                        self._prepare(req)
                    key = (reqs[0].T_pad, sampler, step, None, "float32")
                    self._execute(key, reqs)
                    errors = [r.error for r in reqs if r.error is not None]
                    if errors:
                        raise RuntimeError(
                            f"warmup failed at {secs} s x batch {b}: "
                            f"{errors[0]}"
                        )
                    if reqs[0].batch_size != b:
                        raise RuntimeError(
                            f"warmup batch {b} executed as batch "
                            f"{reqs[0].batch_size}"
                        )

    # ---------------- request side ----------------

    def submit(self, wav: np.ndarray, emotion: Optional[str] = None,
               style: int = 0, sampler: Optional[str] = None,
               steps: Optional[int] = None,
               cfg_scale: Optional[float] = None,
               seed: int = 0, dtype: str = "float32",
               timeout: Optional[float] = None):
        """Blocking: float32 mono waveform -> (T, in_dim) float32 array.

        Raises RuntimeError on worker-side failure or timeout.

        Reproducibility semantics: every request gets its OWN per-row
        noise stream keyed by `seed` (diffusion/gaussian.py per-row keys),
        so mixed-seed requests batch together and a request's noise never
        depends on what it is co-batched with. The sample is therefore
        seed-deterministic up to float-level variation from batch-shape-
        dependent XLA scheduling (padding/bucket size); for bit-exact
        replay run --max_batch 1 or use the demo CLI."""
        from fdm_tpu.cli.common import default_sampler

        cfg = self.cfg
        default = default_sampler(cfg)
        if dtype not in ("float32", "float16"):
            raise ValueError(f"dtype must be float32|float16, got {dtype!r}")
        if sampler is not None and sampler not in ("ddpm", "ddim"):
            raise ValueError(f"sampler must be ddpm|ddim, got {sampler!r}")
        if steps is not None and steps not in self.allowed_steps:
            # each distinct steps value is a fresh compiled sampler program
            # (minutes on remote-compile backends); unbounded client choice
            # would be a compile-DoS on the single worker
            raise ValueError(
                f"steps={steps} not in the served menu "
                f"{sorted(s for s in self.allowed_steps if s)} "
                f"(omit for the dataset default)"
            )
        if emotion is not None:
            if not self.cfg.fdm.emotion_classes:
                # reject rather than silently ignore: this dataset's model
                # has no emotion conditioning at all
                raise ValueError(
                    f"dataset {self.cfg.dataset.name!r} is not "
                    f"emotion-conditioned; drop the emotion parameter"
                )
            # validate BEFORE batching: an unknown label raised inside the
            # batched device call would fail every co-batched request
            from fdm_tpu.cli.common import encode_emotion_row

            encode_emotion_row(self.cfg, emotion)
        if cfg_scale is not None and cfg_scale <= 0:
            # an EXPLICIT non-positive scale means "guidance off" — keep it
            # as python 0.0 (generate's static no-CFG branch); mapping to
            # None would silently re-enable the server's config default
            cfg_scale = 0.0
        wav = np.asarray(wav, np.float32)
        if wav.ndim != 1:
            raise ValueError(
                f"wav must be 1-D mono float32, got shape {wav.shape}"
            )
        req = _Pending(
            wav=wav, emotion=emotion,
            style=int(style), sampler=sampler or default,
            steps=steps, cfg_scale=cfg_scale, seed=seed, dtype=dtype,
            deadline=(
                time.monotonic() + timeout if timeout is not None else None
            ),
        )
        self._count("requests")
        self._q.put(req)
        if not req.done.wait(timeout):
            raise RequestTimeout(
                f"animation request timed out after {timeout} s"
            )
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.result, req.batch_size

    # ---------------- worker side ----------------

    def _prepare(self, req: _Pending):
        from fdm_tpu.audio.features import frames_for_duration, pad_audio
        from fdm_tpu.data.common import bucket_frames

        cfg = self.cfg
        sr, fps = cfg.dataset.audio_sr, cfg.dataset.fps
        wav = pad_audio(req.wav, sr, seconds=1.0)  # reference demo +1 s pad
        num_frames = frames_for_duration(len(wav), sr, fps)
        req.T_pad = bucket_frames(
            num_frames, cfg.train.frame_bucket, cfg.train.max_frames
        )
        req.T = min(num_frames, req.T_pad)
        samples = int(req.T_pad * sr / fps) + 320  # collate conv-hop match
        out = np.zeros(samples, np.float32)
        out[: min(len(wav), samples)] = wav[:samples]
        req.wav = out

    def _conditions(self, reqs):
        import jax.numpy as jnp
        from fdm_tpu.cli.common import encode_emotion_row

        cfg = self.cfg
        style = np.stack([
            np.eye(cfg.fdm.style_classes, dtype=np.float32)[
                r.style % cfg.fdm.style_classes
            ] for r in reqs
        ])
        emotion = None
        if cfg.fdm.emotion_classes:
            # labels were validated in submit(); encode_emotion_row shares
            # the training-order one-hot with the demo CLI
            emotion = jnp.asarray(np.stack([
                encode_emotion_row(cfg, r.emotion or "neutral")
                for r in reqs
            ]))
        return jnp.asarray(style), emotion

    def _run(self):
        while True:
            first = self._q.get()
            batch = [first]
            deadline = time.monotonic() + self.batch_window_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            live = []
            for req in batch:
                # expired clients already got their 503 — don't burn a
                # device call on work nobody will read
                if (
                    req.deadline is not None
                    and time.monotonic() > req.deadline
                ):
                    req.error = "expired before execution"
                    req.done.set()
                    self._count("expired")
                    continue
                try:
                    # PER-REQUEST isolation: one bad waveform must not
                    # fail its co-batched neighbors
                    self._prepare(req)
                except Exception as e:  # noqa: BLE001 — per-request
                    req.error = f"{type(e).__name__}: {e}"
                    req.done.set()
                    self._count("errors")
                    continue
                live.append(req)
            groups = {}
            for req in live:
                # seed is NOT part of the group key: the sampler accepts a
                # batch of PER-ROW PRNG keys (diffusion/gaussian.py
                # _per_row_keys), so mixed-seed requests — the normal
                # production traffic — share one device call and each row's
                # noise still depends only on its own seed
                key = (req.T_pad, req.sampler, req.steps, req.cfg_scale,
                       req.dtype)
                groups.setdefault(key, []).append(req)
            for key, reqs in groups.items():
                self._execute(key, reqs)

    def _execute(self, key, reqs):
        import jax
        import jax.numpy as jnp

        T_pad, sampler, steps, cfg_scale, dtype = key
        try:
            B = len(reqs)
            # pad the batch to a power-of-two bucket: XLA programs are
            # shape-specialized, so free-running B would compile per size
            B_pad = 1
            while B_pad < B:
                B_pad *= 2
            # DP serving: the sharded leading axis must divide by the mesh
            # (padding rows are computed on otherwise-idle chips, so they
            # cost no latency)
            dp = self._dp_size
            B_pad = ((B_pad + dp - 1) // dp) * dp
            padded = reqs + [reqs[0]] * (B_pad - B)
            audio = np.stack([r.wav for r in padded])
            hidden = self.frontend(audio, T_pad)
            style, emotion = self._conditions(padded)
            if self._data_sharding is not None:
                hidden, style = jax.device_put(
                    (hidden, style), self._data_sharding
                )
                if emotion is not None:
                    emotion = jax.device_put(emotion, self._data_sharding)
            # (1, 1, in_dim), device-resident since __init__: generate
            # only adds it to the decoded motion, which broadcasts over B
            tmpl = self._template_dev
            cfg_off = cfg_scale is not None and cfg_scale <= 0
            scale = (
                jnp.float32(cfg_scale)
                if (cfg_scale is not None and not cfg_off) else None
            )
            # one PRNG key PER ROW, built on the host CPU (a device
            # PRNGKey() here would dispatch one tiny remote program per
            # request); padding rows reuse row 0's key — their output is
            # dropped
            with jax.default_device(jax.devices("cpu")[0]):
                row_keys = np.stack([
                    np.asarray(jax.random.PRNGKey(r.seed)) for r in padded
                ])
            out_dev = self._generate(
                self.vq_params, self.fdm_params, hidden, tmpl, style,
                emotion, row_keys,
                sampler, steps, scale, cfg_off,
            )
            if dtype == "float16":
                # cast ON device so the device->host transfer halves too
                # (a 10 s MEAD clip is 14.5 MB of fp32 vertices per item)
                out_dev = out_dev.astype(jnp.float16)
            out = np.asarray(out_dev)
            self._count("batches")
            self._count("clips_batched", B)
            for i, req in enumerate(reqs):
                req.result = out[i, : req.T]
                req.batch_size = B
                req.done.set()
        except Exception as e:  # noqa: BLE001 — surfaced per request
            for req in reqs:
                req.error = f"{type(e).__name__}: {e}"
                req.done.set()
            self._count("errors", len(reqs))


# ---------------- HTTP layer ----------------


def make_handler(service: AnimationService):
    from http.server import BaseHTTPRequestHandler
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet; stats via /healthz
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path != "/healthz":
                return self._json(404, {"error": "unknown path"})
            self._json(200, {"status": "ok", **service.stats})

        def do_POST(self):
            from fdm_tpu.data.common import read_wav

            if urlparse(self.path).path != "/animate":
                return self._json(404, {"error": "unknown path"})
            q = parse_qs(urlparse(self.path).query)

            def arg(name, cast, default=None):
                return cast(q[name][0]) if name in q else default

            try:
                n = int(self.headers.get("Content-Length", 0))
                if n <= 0:
                    return self._json(400, {"error": "empty body (want wav)"})
                raw = self.rfile.read(n)
                with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                    f.write(raw)
                    f.flush()
                    wav = read_wav(
                        f.name, target_sr=service.cfg.dataset.audio_sr
                    )
                # fp16 responses: the reference itself round-trips vertices
                # through fp16 in its loaders (datasets/data_loader.py:
                # 42-43, quirk Q9), and the cast happens on device so the
                # accelerator->host payload halves as well
                result, bsz = service.submit(
                    wav,
                    emotion=arg("emotion", str),
                    style=arg("style", int, 0),
                    sampler=arg("sampler", str),
                    steps=arg("steps", int),
                    cfg_scale=arg("cfg_scale", float),
                    seed=arg("seed", int, 0),
                    dtype=arg("dtype", str, "float32"),
                    timeout=service.request_timeout_s,
                )
            except RequestTimeout as e:
                return self._json(503, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — HTTP boundary
                return self._json(400, {"error": f"{type(e).__name__}: {e}"})
            buf = io.BytesIO()
            np.save(buf, result)
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Frames", str(result.shape[0]))
            self.send_header("X-Fps", str(service.cfg.dataset.fps))
            self.send_header("X-Batch-Size", str(bsz))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def serve_forever(service: AnimationService, host: str, port: int):
    """Blocking server loop; returns the bound server for tests."""
    server = make_server(service, host, port)
    server.serve_forever()


def make_server(service: AnimationService, host: str, port: int):
    from http.server import ThreadingHTTPServer

    return ThreadingHTTPServer((host, port), make_handler(service))
