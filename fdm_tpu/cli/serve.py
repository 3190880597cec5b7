"""Serve CLI: resident HTTP server batching concurrent animation requests.

Beyond the reference's one-process-per-clip scripts: keeps the compiled
pipeline warm and batches concurrent POSTs into one device call (the
measured-fastest serving path — see fdm_tpu/serve.py and docs/PERF.md).

  python -m fdm_tpu serve --dataset mead --stage1 s1.msgpack \
      --stage2 s2.msgpack --audio_params audio.msgpack --port 8061
  curl -s -X POST --data-binary @clip.wav \
      'localhost:8061/animate?emotion=happy&style=3' > anim.npy
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    from fdm_tpu.cli.common import add_common_args

    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8061)
    parser.add_argument("--stage1", default=None)
    parser.add_argument("--stage2", default=None)
    parser.add_argument("--audio_params", default=None)
    parser.add_argument("--template_file", default=None)
    parser.add_argument("--flame_model", default=None)
    parser.add_argument("--max_batch", type=int, default=8,
                        help="max clips per device call")
    parser.add_argument("--batch_window_ms", type=float, default=30.0,
                        help="how long the batcher waits to fill a batch")
    parser.add_argument("--request_timeout_s", type=float, default=900.0,
                        help="per-request wait bound; a wedged backend "
                             "returns HTTP 503 instead of pinning handler "
                             "threads forever")
    parser.add_argument("--allowed_steps", default=None,
                        help="comma list of permitted ?steps values (each "
                             "distinct value is one compiled sampler "
                             "program); default 10,25,50,100,250,500,1000 "
                             "clipped to the schedule")
    parser.add_argument("--warmup_seconds", default=None,
                        help="comma list of clip lengths (s) to precompile "
                             "before accepting traffic (a cold first "
                             "request otherwise pays the sampler compile)")
    parser.add_argument("--warmup_batch_sizes", default="1",
                        help="comma list of batch buckets to precompile "
                             "per warmup length")
    parser.add_argument("--dp", action="store_true",
                        help="data-parallel serving: replicate the model "
                             "over all visible devices and shard each "
                             "batch's clips across them (throughput "
                             "scales with the slice; batches pad to a "
                             "multiple of the device count)")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from fdm_tpu.cli.common import build_config, enable_compilation_cache
    from fdm_tpu.serve import AnimationService, make_server

    enable_compilation_cache()
    cfg = build_config(args)
    service = AnimationService(
        cfg, stage1=args.stage1, stage2=args.stage2,
        audio_params=args.audio_params, template_file=args.template_file,
        flame_model=args.flame_model, seed=args.seed,
        allow_tiny=args.tiny or args.synthetic,
        max_batch=args.max_batch, batch_window_ms=args.batch_window_ms,
        request_timeout_s=args.request_timeout_s, dp=args.dp,
        allowed_steps=(
            (None,) + tuple(
                int(s) for s in args.allowed_steps.split(",") if s.strip()
            )
            if args.allowed_steps else None
        ),
    )
    if args.warmup_seconds:
        seconds = tuple(
            float(s) for s in args.warmup_seconds.split(",") if s.strip()
        )
        batches = tuple(
            int(b) for b in args.warmup_batch_sizes.split(",") if b.strip()
        )
        print(f"warming up {seconds} s x batch {batches} ...", flush=True)
        service.warmup(seconds, batches)
        print("warmup done", flush=True)
    server = make_server(service, args.host, args.port)
    print(f"serving {cfg.dataset.name} on http://{args.host}:"
          f"{server.server_address[1]} (max_batch={args.max_batch}, "
          f"window={args.batch_window_ms} ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
