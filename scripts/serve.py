"""Serving launcher: continuous-batching HTTP inference server.

Beyond-reference entry point (the reference ships no serving stack; its only
inference entries are batch-1 eval drivers). Loads the model once, then
coalesces concurrent HTTP requests into device batches via
``ufvideo_tpu.serve.BatchingScheduler`` — the measured single-chip serving
configuration is the int8 LLM at batch 8 (PERF.md: 1.20 videos/s vs 0.73 at
batch 1).

    python scripts/serve.py --model-path <hf ckpt> --sam-path sam2.pt \
        --quant int8 --port 8000 --max-batch 8

Smoke mode (no checkpoint): random tiny weights, byte tokenizer:

    python scripts/serve.py --tiny --port 8000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", default="")
    p.add_argument("--sam-path", default="")
    p.add_argument("--tokenizer-path", default="")
    p.add_argument("--tiny", action="store_true",
                   help="random tiny-config weights (offline smoke mode)")
    p.add_argument("--quant", default="int8", choices=["none", "int8", "int4"],
                   help="LLM weight quantization (int8 is the single-chip "
                        "serving configuration; 'none' = bf16)")
    p.add_argument("--kv-quant", action="store_true",
                   help="int8 KV cache (capacity lever for large batches)")
    p.add_argument("--prefill-chunk", type=int, default=0,
                   help="chunked prefill: sequences per prefill dispatch "
                        "(bounds activation transients at large batches)")
    p.add_argument("--spec-decode", type=int, default=0,
                   help="prompt-lookup speculative decoding draft length "
                        "(greedy-exact; serves greedy requests with fewer "
                        "weight-read passes; 0 = off)")
    p.add_argument("--engine", action="store_true",
                   help="slot-based continuous batching (in-flight request "
                        "admission; greedy QA only — concurrent streams "
                        "share each weight pass instead of serializing)")
    p.add_argument("--engine-chunk", type=int, default=8,
                   help="decode steps per engine dispatch")
    p.add_argument("--engine-spec", type=int, default=0,
                   help="engine speculative draft length (composes slot "
                        "batching with prompt-lookup speculation; 0 = off)")
    p.add_argument("--max-new-cap", type=int, default=512,
                   help="engine per-request max_new_tokens cap (sizes the "
                        "persistent KV cache)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=50.0)
    p.add_argument("--max-queue", type=int, default=256)
    p.add_argument("--request-timeout-s", type=float, default=600.0)
    p.add_argument("--platform", default="", choices=["", "cpu", "tpu"],
                   help="JAX platform override; --tiny defaults to cpu so "
                        "smoke serving never opens the remote TPU tunnel")
    args = p.parse_args()

    platform = args.platform or ("cpu" if args.tiny else "")
    if platform == "cpu":
        # must be set after `import jax` and before backend init (a
        # sitecustomize pins the axon TPU platform; env vars are too late)
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ufvideo_tpu.api import model_init
    from ufvideo_tpu.configs import UFVideoConfig, tiny_config
    from ufvideo_tpu.serve import BatchingScheduler, serve_http

    cfg = tiny_config() if args.tiny else UFVideoConfig()
    if args.quant != "none":
        cfg = cfg.replace(quant_llm=args.quant)
    if args.kv_quant:
        cfg = cfg.replace(quant_kv=True)
    if args.prefill_chunk:
        cfg = cfg.replace(prefill_chunk=args.prefill_chunk)
    if args.spec_decode:
        cfg = cfg.replace(spec_decode=args.spec_decode)

    model, _, tokenizer = model_init(
        args.model_path or None,
        cfg=cfg,
        sam_path=args.sam_path or None,
        tokenizer_path=args.tokenizer_path or None,
    )

    if args.engine:
        from ufvideo_tpu.engine import StreamingEngine

        scheduler = StreamingEngine(
            model, tokenizer,
            max_slots=args.max_batch,
            chunk=args.engine_chunk,
            max_new_cap=args.max_new_cap,
            max_queue=args.max_queue,
            spec_k=args.engine_spec,
        )
    else:
        scheduler = BatchingScheduler(
            model, tokenizer,
            max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms,
            max_queue=args.max_queue,
        )
    server = serve_http(
        scheduler, host=args.host, port=args.port,
        request_timeout_s=args.request_timeout_s,
    )
    mode = "engine" if args.engine else "scheduler"
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"({mode}, max_batch={args.max_batch}, quant={args.quant})",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        server.server_close()
        scheduler.close()


if __name__ == "__main__":
    main()
