"""Benchmark driver. Prints ONE JSON line with the headline metric.

Default benchmark: Qwen2-7B greedy decode throughput, bf16, batch 1
(tokens/sec/chip; SURVEY §6 target 30 on v5e — measured 49+ here; int8
weight-only reaches 90+, batch 8 int8 reaches 448 aggregate). Other
benchmarks via argv:

    python bench.py [decode|decode_int8|decode_int8_kvq8|prefill|vit_encode|
                     sam_encode|projector|e2e|e2e_batch|e2e_batch16|all]

The default (driver) invocation is HANG-PROOF (round 3 lost its entire
record to one hung remote compile, rc=124 with no output): every mode —
headline included — runs in its own subprocess with a hard per-mode
deadline, the cumulative record is flushed to BENCH_PARTIAL.json as each
mode completes, and a SIGTERM/SIGINT/atexit handler prints the partial
record as valid JSON if the driver is killed mid-suite. A mode that hangs,
crashes, or doesn't fit the remaining time budget (UFVIDEO_BENCH_BUDGET
seconds, default 4200) falls back to its last recorded value, explicitly
flagged {"stale": true}. Note on the vit_encode baseline: 2000
frames/s/chip for SigLIP-SO400M at 384² exceeds the v5e bf16 flop ceiling
(576 GFLOP/frame ⇒ ~340 f/s at 100% MFU; see PERF.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINES = {
    "vit_encode_frames_per_sec": 2000.0,  # BASELINE.json north star
    "qwen2_7b_decode_tokens_per_sec": 30.0,
    "projector_clips_per_sec": 0.0,
}


def _timeit_device_loop(step_fn, params, x, iters=8):
    """Time ``iters`` sequentially-dependent evaluations of ``step_fn``
    inside ONE jitted lax.scan with a scalar output.

    This is the only honest timing on remote-execution runtimes where
    block_until_ready is a no-op and full-buffer readback is slow: the chain
    prevents caching/elision, the scalar keeps readback negligible, and the
    (N, 1)-iteration difference cancels dispatch+readback overhead.
    """
    import jax
    import jax.numpy as jnp

    cap = os.environ.get("UFVIDEO_BENCH_ITERS", "")
    if cap:
        # lean driver runs: scale the scan length with the rep cap but
        # keep >=4 chained steps so the (N,1) difference stays well above
        # dispatch noise
        iters = max(4, min(iters, 2 * int(cap)))

    def loop(n):
        @jax.jit
        def run(p, x0):
            def body(carry, _):
                # bounded perturbation: keeps the chain un-elidable without
                # growing the magnitude of unnormalized outputs
                x = x0 * (1.0 + 1e-6 * jnp.tanh(carry)).astype(x0.dtype)
                out = step_fn(p, x)
                return jnp.mean(out.astype(jnp.float32)), None

            s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return s

        # warm compile
        float(run(params, x))
        t0 = time.perf_counter()
        v = float(run(params, x))
        dt = time.perf_counter() - t0
        assert v == v, "NaN from benchmark step"
        return dt

    t1 = loop(1)
    tn = loop(iters)
    return max((tn - t1) / (iters - 1), 1e-9)


def _timeit(fn, *args, warmup=1, iters=3):
    """Host-loop timing with scalar readback per iteration (for functions
    that can't be expressed as a scan step, e.g. full generate loops).

    UFVIDEO_BENCH_ITERS caps ``iters`` (driver runs set it to fit the
    round budget; variance across reps measured <2% on the chip, so fewer
    reps trade negligible precision for wall time)."""
    import jax.numpy as jnp
    import numpy as np

    cap = os.environ.get("UFVIDEO_BENCH_ITERS", "")
    if cap:
        iters = max(1, min(iters, int(cap)))

    def run():
        out = fn(*args)
        return float(np.asarray(jnp.sum(out).astype(jnp.float32)))

    for _ in range(warmup):
        run()
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    return (time.perf_counter() - t0) / iters


def _random_params(shapes, scale=0.02):
    """Random (not zero!) params: all-zeros weights let parts of the stack
    short-circuit and wildly overstate throughput.

    Generated ON DEVICE inside one jit: the per-leaf eager version cost a
    remote dispatch round-trip per leaf (~300 leaves for the 7B ≈ minutes
    of pure RTT on this runtime, billed to every bench mode as 'weight
    generation'); one fused executable is persistent-cacheable and leaves
    the host out of the weight path entirely. int4 leaves stay on the
    eager path (the axon PJRT client cannot relay S4 jit outputs)."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(shapes)

    def gen(k, s):
        if jnp.issubdtype(s.dtype, jnp.integer):
            return jax.random.randint(k, s.shape, -127, 128, jnp.int32).astype(
                s.dtype
            )
        return scale * jax.random.normal(k, s.shape, s.dtype)

    fused = [
        s.dtype != jnp.int4 if hasattr(jnp, "int4") else True for s in leaves
    ]

    def gen_fused():
        keys = jax.random.split(jax.random.PRNGKey(0), len(leaves))
        return [
            gen(k, s) for k, s, f in zip(keys, leaves, fused) if f
        ]

    fused_vals = iter(jax.jit(gen_fused)() if any(fused) else [])
    keys = jax.random.split(jax.random.PRNGKey(0), len(leaves))
    vals = [
        next(fused_vals) if f else gen(k, s)
        for k, s, f in zip(keys, leaves, fused)
    ]
    return jax.tree.unflatten(treedef, vals)


def bench_vit_encode(batch: int = 64, quant: bool = False):
    """SigLIP-SO400M encode. ``quant``: W8A8 int8 encoder — the dense
    matmuls (the tower's flop majority) run s8×s8→s32 on the MXU at 2× the
    bf16 peak, raising the ~340 f/s bf16 flop ceiling (PERF.md)."""
    import jax
    import jax.numpy as jnp

    from ufvideo_tpu.configs import SiglipVisionConfig
    from ufvideo_tpu.models.siglip import SiglipVisionTower

    cfg = SiglipVisionConfig()
    model = SiglipVisionTower(
        cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, quant=quant
    )
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.bfloat16),
        )["params"]
    )
    params = _random_params(shapes)
    frames = jax.random.normal(
        jax.random.PRNGKey(1),
        (batch, cfg.image_size, cfg.image_size, 3),
        jnp.bfloat16,
    )
    dt = _timeit_device_loop(
        lambda p, x: model.apply({"params": p}, x), params, frames
    )
    fps = batch / dt
    name = "vit_encode_int8" if quant else "vit_encode"
    return name + "_frames_per_sec", fps, "frames/s/chip"


def bench_projector(batch: int = 4, frames: int = 32):
    import jax
    import jax.numpy as jnp

    from ufvideo_tpu.configs import ProjectorConfig
    from ufvideo_tpu.models.projector import build_projector

    cfg = ProjectorConfig()
    model = build_projector(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    x = jax.random.normal(
        jax.random.PRNGKey(0), (batch, frames, 729, 1152), jnp.bfloat16
    )
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x)["params"])
    params = _random_params(shapes)
    dt = _timeit_device_loop(
        lambda p, v: model.apply({"params": p}, v), params, x
    )
    return "projector_clips_per_sec", batch / dt, "clips/s/chip"


def bench_decode(
    batch: int = 1,
    prompt_len: int = 512,
    new_tokens: int = 64,
    quant: bool = None,
    kv_quant: bool = False,
    num_layers: int = None,
    vocab_size: int = None,
):
    """7B greedy decode throughput (tokens/sec/chip).

    ``num_layers`` / ``vocab_size`` overrides exist for on-chip cost
    bisection of the decode step (int8 bs-1 sits at 90.2 of a ~117 tok/s
    weight-bandwidth ceiling): t(28 layers) vs t(14) separates the
    per-layer cost from the fixed per-step cost (lm_head+argmax+sampling
    plumbing+dispatch), and a shrunk vocab isolates the lm_head share of
    the fixed part."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ufvideo_tpu.configs import Qwen2Config
    from ufvideo_tpu.models.generate import greedy_generate
    from ufvideo_tpu.models.qwen2 import Qwen2LM

    cfg = Qwen2Config()
    if os.environ.get("UFVIDEO_BENCH_SMALL", "") == "1":
        cfg = dataclasses.replace(cfg, num_layers=4)
    if num_layers:
        cfg = dataclasses.replace(cfg, num_layers=num_layers)
    if vocab_size:
        cfg = dataclasses.replace(cfg, vocab_size=vocab_size)
    if quant is None:
        quant = os.environ.get("UFVIDEO_BENCH_QUANT", "") == "1"
    model = Qwen2LM(
        cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, quant=quant
    )
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))[
            "params"
        ]
    )
    params = _random_params(shapes)
    embeds = jax.random.normal(
        jax.random.PRNGKey(1), (batch, prompt_len, cfg.hidden_size), jnp.bfloat16
    )
    seq_lens = jnp.full((batch,), prompt_len, jnp.int32)

    def run():
        # stop_ids unreachable (-1): measures the full new_tokens loop
        return greedy_generate(
            model, params, embeds, seq_lens,
            max_new_tokens=new_tokens, stop_ids=(-1,),
            cache_max_len=prompt_len + new_tokens,
            kv_quant=kv_quant,
        ).tokens

    dt = _timeit(run, warmup=1, iters=3)
    tps = batch * new_tokens / dt
    name = "qwen2_7b_decode"
    if quant:
        name += "_int4" if quant in (4, "int4", "4bit") else "_int8"
    name += "_kvq8" if kv_quant else ""
    if batch > 1:
        name += f"_batch{batch}"
    if prompt_len != 512:
        name += f"_c{(prompt_len + new_tokens) // 1024}k"
    if num_layers:
        name += f"_L{num_layers}"
    if vocab_size:
        name += f"_v{vocab_size // 1000}k"
    return name + "_tokens_per_sec", tps, "tokens/s/chip"


def bench_decode_spec(
    best: bool = True,
    k: int = 4,
    prompt_len: int = 512,
    new_tokens: int = 64,
    quant: bool = True,
):
    """Prompt-lookup speculative decode, acceptance-bracket benchmarks.

    Acceptance is workload-dependent, so this measures the two ends:
    ``best=True`` zeroes the weights (constant logits → every draft
    accepted) — the upper bound, where each weight-read pass emits K+1
    tokens; ``best=False`` uses random weights + random prompt ids (~zero
    acceptance) — the worst case, plain decode plus the verify overhead.
    Real workloads land in between; output exactness is unconditional
    (tests/test_speculative.py)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ufvideo_tpu.configs import Qwen2Config
    from ufvideo_tpu.models.qwen2 import Qwen2LM
    from ufvideo_tpu.models.speculative import spec_generate

    cfg = Qwen2Config()
    if os.environ.get("UFVIDEO_BENCH_SMALL", "") == "1":
        cfg = dataclasses.replace(cfg, num_layers=4)
    model = Qwen2LM(
        cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, quant=quant
    )
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))[
            "params"
        ]
    )
    params = _random_params(shapes)
    if best:
        params = jax.tree.map(jnp.zeros_like, params)
    ids = jax.random.randint(
        jax.random.PRNGKey(1), (1, prompt_len), 3, cfg.vocab_size
    ).astype(jnp.int32)
    embeds = model.apply({"params": params}, ids, method=Qwen2LM.embed)
    seq_lens = jnp.full((1,), prompt_len, jnp.int32)

    def run():
        return spec_generate(
            model, params, embeds, seq_lens, ids,
            max_new_tokens=new_tokens, stop_ids=(-1,),
            cache_max_len=prompt_len + new_tokens + k, draft_k=k,
        ).tokens

    dt = _timeit(run, warmup=1, iters=3)
    name = "qwen2_7b_decode" + ("_int8" if quant else "")
    name += f"_spec{k}_" + ("best" if best else "worst")
    return name + "_tokens_per_sec", new_tokens / dt, "tokens/s/chip"


def bench_prefill(batch: int = 1, seq: int = 2048):
    """7B prefill throughput (prompt tokens/sec/chip)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ufvideo_tpu.configs import Qwen2Config
    from ufvideo_tpu.models.qwen2 import Qwen2LM

    cfg = Qwen2Config()
    quant = os.environ.get("UFVIDEO_BENCH_QUANT", "") == "1"
    model = Qwen2LM(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, quant=quant)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))[
            "params"
        ]
    )
    params = _random_params(shapes)
    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, seq), 3, 10000)

    def step(p, x):
        # chain-perturbable float input → embed-space forward
        from ufvideo_tpu.models.qwen2 import Qwen2LM as _M

        hidden, _ = model.apply(
            {"params": p}, x, jnp.broadcast_to(
                jnp.arange(seq, dtype=jnp.int32), (batch, seq)
            ), None, None, None, "train", method=_M.backbone,
        )
        return hidden

    embeds = model.apply({"params": params}, ids, method=Qwen2LM.embed)
    dt = _timeit_device_loop(step, params, embeds, iters=4)
    return "qwen2_7b_prefill_tokens_per_sec", batch * seq / dt, "tokens/s/chip"


def bench_sam_encode(frames: int = 8, quant: bool = False):
    """SAM2 Hiera-L image-encoder throughput at 1024² (frames/s/chip).
    ``quant``: W8A8 int8 trunk (fused int8 whole-block kernel)."""
    import jax
    import jax.numpy as jnp

    from ufvideo_tpu.configs import SAM2Config
    from ufvideo_tpu.models.sam2 import SAM2

    cfg = SAM2Config()
    model = SAM2(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, quant=quant)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 3), jnp.bfloat16)
        )["params"]
    )
    params = _random_params(shapes)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (frames, 1024, 1024, 3), jnp.bfloat16
    )

    def step(p, xx):
        out = model.apply({"params": p}, xx, method=type(model).forward_image)
        return out["backbone_fpn"][2]

    dt = _timeit_device_loop(step, params, x, iters=4)
    name = "sam2_encode_int8" if quant else "sam2_encode"
    return name + "_frames_per_sec", frames / dt, "frames/s/chip"


def bench_e2e(
    num_frames: int = 32,
    sam_frames: int = 8,
    new_tokens: int = 64,
    batch: int = 1,
    kv_quant: bool = False,
    llm_quant="int8",
    vision_quant: bool = False,
    spec: int = 0,
    spec_best: bool = False,
):
    """Full PixRQA-style pipeline on one chip (BASELINE.json metric
    'PixRQA e2e latency'): 32-frame SigLIP encode → STC projector → splice →
    7B prefill → greedy decode → SAM2 encode + [SEG] mask propagation.

    Runs the int8 weight-only LLM so the whole stack fits a single 16GB v5e
    (bf16 7B + towers exceed HBM). Reports videos/sec/chip. ``batch`` > 1 is
    the serving-throughput configuration: encode/prefill/decode batch over
    videos (amortizing the decode loop's weight traffic — the dominant
    batch-1 cost) and SAM2 propagation loops per video.

    ``spec`` > 0 composes prompt-lookup speculative decoding into the
    pipeline (the composite is decode-weight-traffic dominated, and
    speculation is the one mechanism that attacks that term: accepted
    drafts share a weight pass). Acceptance is workload-dependent, so the
    two brackets are measured: ``spec_best`` zeroes the LLM weights
    (constant logits → all drafts accepted — the upper bound) and the
    default random weights accept ~nothing (plain decode + free verify —
    the floor). Greedy-exactness of the spec path is unconditional
    (tests/test_speculative.py).
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ufvideo_tpu.configs import UFVideoConfig
    from ufvideo_tpu.constants import VIDEO_TOKEN_INDEX
    from ufvideo_tpu.models.generate import greedy_generate
    from ufvideo_tpu.models.sam2 import SAM2
    from ufvideo_tpu.models.sam2.video import (
        encode_video_frames,
        propagate_video,
        propagate_videos_batched,
    )
    from ufvideo_tpu.models.ufvideo import UFVideoModel
    from ufvideo_tpu.splicing import plan_splice

    cfg = UFVideoConfig(quant_llm=llm_quant, quant_vision=vision_quant)
    cfg = cfg.replace(
        budget=dataclasses.replace(
            cfg.budget, num_frames=num_frames, max_seq_len=4096
        )
    )
    model = UFVideoModel(cfg)
    sam = SAM2(cfg.sam, dtype=cfg.compute_dtype, param_dtype=cfg.param_dtype,
               quant=vision_quant)

    shapes = jax.eval_shape(lambda: model.init_params(jax.random.PRNGKey(0)))
    params = _random_params(shapes)
    if spec and spec_best:
        # constant logits → every draft accepted (see docstring); towers
        # stay random so encode/SAM cost is honest
        params["llm"] = jax.tree.map(jnp.zeros_like, params["llm"])
    params["sam"] = _random_params(
        jax.eval_shape(
            lambda: sam.init(
                jax.random.PRNGKey(1),
                jnp.zeros((1, 1024, 1024, 3), jnp.bfloat16),
            )["params"]
        )
    )

    # raw inputs (450 MB pixels + 768 MB SAM frames at batch 16) stay
    # device-resident when the weight budget allows (int4 LLM frees
    # 3.8 GB); otherwise they stream from the host per encode chunk.
    # Streaming over this harness's remote tunnel runs at ~50-100 MB/s —
    # orders below a production host's PCIe — so device-resident is the
    # honest serving configuration whenever it fits.
    stream_inputs = batch > 8 and llm_quant not in (4, "int4", "4bit")
    pixels = jax.random.normal(
        jax.random.PRNGKey(2), (batch, num_frames, 384, 384, 3), jnp.bfloat16
    )
    images_sam = jax.random.normal(
        jax.random.PRNGKey(3), (batch * sam_frames, 1024, 1024, 3), jnp.bfloat16
    )
    if stream_inputs:
        import numpy as _np

        pixels = _np.asarray(pixels)
        images_sam = _np.asarray(images_sam)
    prompt = [151644, 872, 198, VIDEO_TOKEN_INDEX] + list(range(100, 140)) + [151645]
    plan = plan_splice(
        [prompt] * batch,
        num_video_tokens=cfg.num_video_tokens,
        region_token_counts=[[]] * batch,
        region_token_id=-1,
        max_seq_len=cfg.budget.max_seq_len,
    )

    # length bucketing: the splice plan pads to the static max_seq_len
    # budget, but the true length is host-known — trim prefill and the kv
    # cache to the 256-rounded actual length (a 2.7k-token PixRQA prompt in
    # a 4096 budget otherwise wastes ~33% of prefill and decode-read time).
    # The trim is fused into the front jit so the full-budget embeds are
    # never materialized in HBM.
    real_len = int(max(plan.seq_lens))
    trim = min((real_len + 255) // 256 * 256, cfg.budget.max_seq_len)

    front = jax.jit(
        lambda p, px, tids, kind, idx: model.splice_embeds(
            p, tids, kind, idx, model.encode_video(p, px), None
        )[:, :trim]
    )
    # encoder compute is chunked at large batch: 16 videos' SigLIP (512
    # frames) / Hiera (128 1024² frames) activations alongside the int8 LLM
    # exhaust the 16 GB HBM in one dispatch; ≤4-video chunks keep the
    # transient encoder activations bounded while prefill/decode stay
    # batched across all videos
    chunk = min(batch, 8 if batch <= 8 else 4)

    def run():
        tids = jnp.asarray(plan.text_ids)
        kind = jnp.asarray(plan.src_kind)
        idx = jnp.asarray(plan.src_idx)
        embeds = jnp.concatenate([
            front(
                params, jnp.asarray(pixels[i : i + chunk]),
                tids[i : i + chunk],
                kind[i : i + chunk], idx[i : i + chunk],
            )
            for i in range(0, batch, chunk)
        ]) if batch > chunk else front(params, pixels, tids, kind, idx)
        prefill_chunk = int(
            os.environ.get(
                "UFVIDEO_PREFILL_CHUNK", "4" if batch > 4 else "0"
            )
        )
        if spec:
            from ufvideo_tpu.models.speculative import spec_generate
            from ufvideo_tpu.splicing import plan_lookup_ids

            res = spec_generate(
                model.llm, params["llm"], embeds,
                jnp.asarray(plan.seq_lens),
                jnp.asarray(plan_lookup_ids(plan))[:, :trim],
                max_new_tokens=new_tokens, stop_ids=(-1,),
                cache_max_len=trim + new_tokens + spec, draft_k=spec,
                kv_quant=kv_quant, prefill_chunk=prefill_chunk,
            )
        else:
            res = greedy_generate(
                model.llm, params["llm"], embeds,
                jnp.asarray(plan.seq_lens),
                max_new_tokens=new_tokens, stop_ids=(-1,),
                cache_max_len=trim + new_tokens,
                kv_quant=kv_quant,
                # batch prefill transients (one MLP activation is
                # [B*S, 18944]) dominate peak HBM at serving batches;
                # chunked prefill bounds them while the decode loop stays
                # fully batched
                prefill_chunk=prefill_chunk,
            )
        seg_embed = model.seg_embeddings(params, res.hidden[:, :1, :])
        fchunk = chunk * sam_frames
        if batch > chunk:
            parts = [
                encode_video_frames(
                    sam, params["sam"], jnp.asarray(images_sam[i : i + fchunk])
                )
                for i in range(0, batch * sam_frames, fchunk)
            ]
            sfeats = type(parts[0])(
                *(jnp.concatenate([p[i] for p in parts]) for i in range(3)),
                parts[0].pos2,  # frame-invariant
            )
        else:
            sfeats = encode_video_frames(sam, params["sam"], images_sam)
        acc = jnp.sum(res.tokens).astype(jnp.float32)
        if batch == 1:
            low = propagate_video(
                sam, params["sam"], sfeats, seg_embed[0][:, None]
            )
            acc = acc + jnp.sum(low.astype(jnp.float32))
        else:
            # videos ride the object-batch dim of the memory machinery
            vfeats = sfeats.map_frames(
                lambda a: a.reshape(batch, sam_frames, *a.shape[1:])
            )
            low = propagate_videos_batched(
                sam, params["sam"], vfeats, seg_embed
            )
            acc = acc + jnp.sum(low.astype(jnp.float32))
        return acc

    dt = _timeit(run, warmup=1, iters=3)
    name = "pixrqa_e2e_videos_per_sec" + (f"_batch{batch}" if batch > 1 else "")
    if llm_quant in (4, "int4", "4bit"):
        name += "_int4"
    if vision_quant:
        name += "_int8v"
    if spec:
        name += f"_spec{spec}_" + ("best" if spec_best else "worst")
    return name, batch / dt, "videos/s/chip"


# Last numbers RECORDED from live `python bench.py <mode>` runs on this
# round's chip. Used ONLY as a fallback when a mode hangs, crashes, or does
# not fit the driver's remaining time budget — and then each fallback value
# is explicitly flagged {"stale": true}. `python bench.py all` prints the
# whole suite live.
RECORDED_HEADLINE = ("qwen2_7b_decode_tokens_per_sec", 49.73, "tokens/s/chip")
RECORDED = {
    # mode -> (metric name, value, unit)
    # [recorded from the round-5 live sweep, 2026-08-20, except as noted]
    "vit_encode": ("vit_encode_frames_per_sec", 241.12, "frames/s/chip"),
    # W8A8 int8 encoder via the fused whole-layer Pallas kernel (round-4
    # chip measured 337.47 on the same code; day-to-day runtime variance)
    "vit_encode_int8": (
        "vit_encode_int8_frames_per_sec", 331.28, "frames/s/chip"),
    "sam_encode": ("sam2_encode_frames_per_sec", 48.93, "frames/s/chip"),
    # W8A8 trunk, fused int8 whole-block kernel + fused special-block
    # routing (UFVIDEO_SAM2_INT8_SPECIAL=1, +10.7% over the generic W8A8
    # routing in a same-day A/B: 49.29 vs 44.5, and the round-4 CODE also
    # measures 44.63 on this day's runtime — the r4 record's 61.06 is not
    # reproducible today on ANY code state; every other mode is stable
    # across the same pair of days, see PERF.md round 5)
    "sam_encode_int8": (
        "sam2_encode_int8_frames_per_sec", 49.29, "frames/s/chip"),
    "decode_int8": ("qwen2_7b_decode_int8_tokens_per_sec", 91.35, "tokens/s/chip"),
    "prefill": ("qwen2_7b_prefill_tokens_per_sec", 11899.15, "tokens/s/chip"),
    "e2e": ("pixrqa_e2e_videos_per_sec", 0.72, "videos/s/chip"),
    "e2e_batch": ("pixrqa_e2e_videos_per_sec_batch8", 1.19, "videos/s/chip"),
    "decode_int8_spec_best": (
        "qwen2_7b_decode_int8_spec4_best_tokens_per_sec", 316.83,
        "tokens/s/chip"),
    "decode_int8_spec_worst": (
        "qwen2_7b_decode_int8_spec4_worst_tokens_per_sec", 89.59,
        "tokens/s/chip"),
    "decode_int8_kvq8": (
        "qwen2_7b_decode_int8_kvq8_tokens_per_sec", 91.25, "tokens/s/chip"),
    # StreamingEngine offered-load (8 clients, 32 requests, 64 new tokens,
    # full per-request vision+prefill admission) with client prestaging +
    # pipelined/batched admission, measured live 2026-08-20 (round-4
    # serial-admission baseline was 0.15)
    "serve_loadtest": (
        "serve_loadtest_requests_per_sec", 0.27, "requests/s/chip"),
}

# Modes the driver line re-measures live, highest-value-per-cost first, with
# COLD-compile cost estimates (seconds). EVERY RECORDED mode must appear
# here so a budget miss degrades to a stale-flagged fallback rather than
# silently dropping the metric from the round record.
#
# The cold estimates are only the floor of the scheduling logic: the driver
# prefers the last MEASURED wall cost of each mode (BENCH_COSTS.json,
# updated after every live run — single-mode invocations included) whenever
# the persistent compile cache is warm (<repo>/.jax_cache non-empty).
# Round 4's record went 9/12-stale precisely because these cold numbers
# (1100-1900 s) were used to budget modes whose warm cost is 70-350 s.
DRIVER_EXTRA_MODES = (
    # round-5 deltas first: pipelined-admission engine, re-routed int8
    # Hiera special blocks, the int8 towers — the numbers this round
    # changed re-measure before the stable legacy rows
    ("serve_loadtest", 1500),
    ("sam_encode_int8", 700),
    ("vit_encode_int8", 600),
    ("decode_int8", 600),
    ("decode_int8_spec_best", 400),
    ("decode_int8_spec_worst", 300),
    ("vit_encode", 600),
    ("sam_encode", 1100),
    ("decode_int8_kvq8", 400),
    ("e2e", 1600),
    ("prefill", 500),
    ("e2e_batch", 1900),
    # speculation composed into the two composite records whose dominant
    # cost is decode weight traffic (VERDICT r4 #3). Upper brackets only:
    # the floors are the plain serve_loadtest / e2e_batch rows above (the
    # verify pass measured free, decode_int8_spec_worst ≈ decode_int8).
    # Not in RECORDED until first measured live — a budget miss drops them
    # from the record instead of inventing a constant.
    ("serve_loadtest_spec4_best", 700),
    ("e2e_batch_int8v_spec_best", 800),
)

_COSTS_PATH_ENV = "UFVIDEO_BENCH_COSTS"


def _costs_path() -> str:
    return os.environ.get(_COSTS_PATH_ENV) or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_COSTS.json"
    )


def _load_costs() -> dict:
    try:
        with open(_costs_path()) as f:
            d = json.load(f)
        return d if isinstance(d, dict) else {}
    except (OSError, ValueError):
        return {}


def _record_cost(mode: str, seconds: float) -> None:
    """Persist a mode's measured wall cost (compile-cache-warm after the
    first run) so the driver budgets future runs from reality instead of
    the cold-compile constants."""
    costs = _load_costs()
    costs[mode] = round(float(seconds), 1)
    try:
        with open(_costs_path(), "w") as f:
            f.write(json.dumps(costs, indent=0, sort_keys=True) + "\n")
    except OSError:
        pass


def _cache_is_warm() -> bool:
    """True when the persistent compile cache has entries — the condition
    under which BENCH_COSTS.json's measured (warm) costs are trustworthy.
    A code change invalidates specific executables, not the whole cache;
    the 2x deadline slack in the driver absorbs partial misses."""
    cache_dir = os.environ.get("UFVIDEO_JAX_CACHE", "") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    if cache_dir.lower() == "off":
        return False
    try:
        return any(True for _ in os.scandir(cache_dir))
    except OSError:
        return False


def bench_serve_loadtest(
    clients: int = 8, requests: int = 32, max_new: int = 64, spec: int = 0,
    zero_llm: bool = False,
):
    """Serving-core offered-load benchmark: drives scripts/loadtest.py
    (StreamingEngine, int8 LLM, random weights) in a subprocess and reports
    aggregate requests/s. Token work per request is fixed (stop ids
    unreachable on random weights), so the number measures the continuous-
    batching engine, not model quality. ``spec`` composes prompt-lookup
    speculation into the engine (spec_k); random weights accept ~no drafts
    (the speculation FLOOR under load, verify-pass overhead included) and
    ``zero_llm`` zeroes the LLM for the repetitive-generation UPPER bracket
    — both report the engine's measured acceptance rate on stderr for
    PERF.md."""
    import subprocess

    script = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts", "loadtest.py"
    )
    cmd = [
        sys.executable, script, "--quant", "int8", "--mode", "engine",
        "--clients", str(clients), "--requests", str(requests),
        "--max-new", str(max_new), "--max-batch", "8",
        "--spec", str(spec),
    ]
    if zero_llm:
        cmd.append("--zero-llm")
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=5400)
    if r.returncode != 0:
        raise RuntimeError(f"loadtest rc={r.returncode}: {r.stderr[-400:]}")
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
            stats = d.get("backend_stats", {})
            if "spec" in stats:
                print(
                    f"spec acceptance: {stats['spec']}", file=sys.stderr
                )
            name = "serve_loadtest_requests_per_sec"
            if spec:
                name = f"serve_loadtest_spec{spec}_requests_per_sec"
                if zero_llm:
                    name = name.replace("_requests", "_best_requests")
            return name, float(d["requests_per_s"]), "requests/s/chip"
        except (ValueError, KeyError):
            continue
    raise RuntimeError("loadtest printed no JSON")


def _fake_mode_fns():
    """UFVIDEO_BENCH_FAKE=1: instant stub measurements (no jax import) so the
    driver's hang-proofing machinery is testable on CPU in seconds.
    UFVIDEO_BENCH_FAKE_HANG=<mode>[,<mode>...] makes those stubs sleep
    forever, simulating a hung remote compile."""
    hang = set(
        m for m in os.environ.get("UFVIDEO_BENCH_FAKE_HANG", "").split(",") if m
    )
    names = {m: rec[0] for m, rec in RECORDED.items()}
    names["decode"] = RECORDED_HEADLINE[0]
    names.setdefault("projector", "projector_clips_per_sec")

    def make(mode):
        def fn():
            if mode in hang:
                time.sleep(3600)
            return names.get(mode, mode + "_fake"), 1.0, "fake/s"

        return fn

    modes = set(names) | {
        "vit_encode", "sam_encode", "prefill", "e2e", "e2e_batch",
        "serve_loadtest_spec4_best", "e2e_batch_int8v_spec_best",
    }
    return {m: make(m) for m in modes}


def _mode_fns():
    if os.environ.get("UFVIDEO_BENCH_FAKE", "") == "1":
        return _fake_mode_fns()
    return {
        "vit_encode": bench_vit_encode,
        "vit_encode_int8": lambda: bench_vit_encode(quant=True),
        "projector": bench_projector,
        "decode": bench_decode,
        "decode_int8": lambda: bench_decode(quant=True),
        "decode_int8_kvq8": lambda: bench_decode(quant=True, kv_quant=True),
        "decode_int4": lambda: bench_decode(quant="int4"),
        "decode_int4_kvq8": lambda: bench_decode(quant="int4", kv_quant=True),
        # on-chip decode-cost bisection (see bench_decode docstring)
        "decode_int8_L14": lambda: bench_decode(quant=True, num_layers=14),
        "decode_int8_v50k": lambda: bench_decode(quant=True, vocab_size=50304),
        # long-context decode: where the KV-cache read starts to rival the
        # int8 weight traffic, and where kvq8 should start paying (VERDICT
        # r4 #8; reference context_len 2048, model/__init__.py:149-152).
        # Cache ≈ prompt + 64 new tokens; per-step cache read at 4k ≈
        # 28L×2×4H×4096×128×2B = 235 MB vs 7.6 GB weights (~3%), at 16k
        # (4x the reference budget, engine long-context headroom) ~13%.
        "decode_int8_c2k": lambda: bench_decode(
            quant=True, prompt_len=2048 - 64),
        "decode_int8_c4k": lambda: bench_decode(
            quant=True, prompt_len=4096 - 64),
        "decode_int8_c16k": lambda: bench_decode(
            quant=True, prompt_len=16384 - 64),
        "decode_int8_kvq8_c2k": lambda: bench_decode(
            quant=True, kv_quant=True, prompt_len=2048 - 64),
        "decode_int8_kvq8_c4k": lambda: bench_decode(
            quant=True, kv_quant=True, prompt_len=4096 - 64),
        "decode_int8_kvq8_c16k": lambda: bench_decode(
            quant=True, kv_quant=True, prompt_len=16384 - 64),
        # speculative-decode acceptance brackets (see bench_decode_spec)
        "decode_int8_spec_best": lambda: bench_decode_spec(best=True),
        "decode_int8_spec_worst": lambda: bench_decode_spec(best=False),
        "prefill": bench_prefill,
        "sam_encode": bench_sam_encode,
        "sam_encode_int8": lambda: bench_sam_encode(quant=True),
        "e2e": bench_e2e,
        "e2e_batch": lambda: bench_e2e(batch=8),
        "e2e_int8v": lambda: bench_e2e(vision_quant=True),
        "e2e_batch_int8v": lambda: bench_e2e(batch=8, vision_quant=True),
        "serve_loadtest": bench_serve_loadtest,
        "serve_loadtest_spec4": lambda: bench_serve_loadtest(spec=4),
        "serve_loadtest_spec4_best": lambda: bench_serve_loadtest(
            spec=4, zero_llm=True
        ),
        "e2e_batch_int8v_spec_best": lambda: bench_e2e(
            batch=8, vision_quant=True, spec=4, spec_best=True
        ),
        "e2e_batch_int8v_spec_worst": lambda: bench_e2e(
            batch=8, vision_quant=True, spec=4, spec_best=False
        ),
        "e2e_batch16": lambda: bench_e2e(batch=16, kv_quant=True),
        "e2e_batch16_int4": lambda: bench_e2e(
            batch=16, kv_quant=True, llm_quant="int4"
        ),
    }


def _maybe_enable_compile_cache():
    """Persistent compilation cache, ON by default (UFVIDEO_JAX_CACHE=off
    to disable, =<dir> to relocate; default <repo>/.jax_cache).

    Verified on the axon TPU 2026-08-19: executable serialization works —
    the headline decode bench ran 821 s cold vs 350 s warm (the remaining
    warm time is the measurement itself plus host weight generation). Every
    driver mode subprocess inherits the env, so repeat rounds pay each jit
    variant's 3-25 min remote compile once per code change, not once per
    run (see PERF.md 'compile cache')."""
    if os.environ.get("UFVIDEO_BENCH_FAKE", "") == "1":
        return  # fake modes never touch jax (and run under python -S)
    cache_dir = os.environ.get("UFVIDEO_JAX_CACHE", "")
    if cache_dir.lower() == "off":
        return
    if not cache_dir:
        cache_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
        )
        os.environ["UFVIDEO_JAX_CACHE"] = cache_dir  # propagate to subprocesses
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def _backend_reachable(deadline_s: float = 240.0) -> bool:
    """Bounded device probe in a SUBPROCESS. The axon tunnel can go down
    for hours (12h+ outage observed 2026-08-18), and a backend init then
    hangs the process for ~25 min before failing — a subprocess with a hard
    deadline keeps the driver's bench invocation from hanging forever."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; assert jax.devices()"],
            timeout=deadline_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _stale_record() -> dict:
    """Record skeleton with every metric at its RECORDED value, all stale —
    the floor the driver improves on as live modes complete."""
    metric, value, unit = RECORDED_HEADLINE
    baseline = BASELINES.get(metric, 0.0)
    return {
        "metric": metric,
        "value": value,
        "unit": unit,
        "vs_baseline": round(value / baseline, 4) if baseline else None,
        "stale": True,
        "extra": {
            RECORDED[m][0]: {"value": RECORDED[m][1], "stale": True}
            for m in RECORDED
        },
    }


def _run_mode_subprocess(mode: str, deadline_s: float):
    """Run ``python bench.py <mode>`` with a hard deadline; return the
    (metric, value, unit) parsed from its last JSON stdout line.

    The subprocess boundary is the hang-proofing: a stuck remote compile
    (3-25 min observed; axon outages can pin a backend init for hours) dies
    at the deadline instead of taking the whole driver record with it."""
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), mode]
    if os.environ.get("UFVIDEO_BENCH_FAKE", "") == "1":
        # fake modes are stdlib-only: skip site (the host sitecustomize
        # imports jax, 2.5 s) so test deadlines measure the driver logic
        cmd.insert(1, "-S")
    env = dict(os.environ)
    # driver children run lean: 2 timed reps (<2% variance on-chip) so
    # more modes fit the round budget; manual runs keep the default 3
    env.setdefault("UFVIDEO_BENCH_ITERS", "2")
    r = subprocess.run(
        cmd,
        timeout=deadline_s,
        capture_output=True,
        text=True,
        env=env,
    )
    if r.returncode != 0:
        raise RuntimeError(f"{mode} rc={r.returncode}: {r.stderr[-500:]}")
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
            return d["metric"], float(d["value"]), d.get("unit", "")
        except (ValueError, KeyError):
            continue
    raise RuntimeError(f"{mode}: no JSON line in output")


def _driver():
    """Driver invocation: start from the all-stale record, upgrade each
    metric in place as its bounded subprocess completes, and guarantee ONE
    valid JSON line on stdout no matter how this process dies (short of
    SIGKILL): normal completion prints it, and a SIGTERM/SIGINT/atexit
    handler prints the partial record — live values for the modes that
    finished, stale for the rest."""
    import atexit
    import signal

    record = _stale_record()
    # UFVIDEO_BENCH_PARTIAL relocates the incremental checkpoint file —
    # the test suite points it at a tmpdir so a fake-mode driver run can
    # never clobber the repo-root record of a real (possibly killed) bench.
    partial_path = os.environ.get("UFVIDEO_BENCH_PARTIAL") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_PARTIAL.json"
    )
    state = {"emitted": False}

    def emit(partial: bool) -> None:
        if state["emitted"]:
            return
        state["emitted"] = True
        if partial:
            record["partial"] = True
        print(json.dumps(record), flush=True)

    def on_signal(signum, frame):
        emit(partial=True)
        # SystemExit propagates into subprocess.run's bare-except, killing
        # the in-flight child before atexit finishes the shutdown
        sys.exit(1)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)
    atexit.register(lambda: emit(partial=True))

    def checkpoint() -> None:
        try:
            with open(partial_path, "w") as f:
                f.write(json.dumps(record) + "\n")
        except OSError:
            pass

    fake = os.environ.get("UFVIDEO_BENCH_FAKE", "") == "1"
    if not fake and not _backend_reachable():
        record["backend_unreachable"] = True
        emit(partial=False)
        return

    # default lowered 4200 → 3300: rounds 3-4 were rc=124 — the DRIVER'S
    # external timeout killed the suite before this budget elapsed, so the
    # budget must undercut it for the record to ever finish with rc=0
    budget = float(os.environ.get("UFVIDEO_BENCH_BUDGET", 3300.0))
    deadline_cap = float(os.environ.get("UFVIDEO_BENCH_DEADLINE", 1e9))
    t_start = time.perf_counter()
    costs = _load_costs() if _cache_is_warm() else {}

    def run_live(mode: str, est_seconds: float) -> bool:
        """One bounded live measurement; returns True and upgrades the
        record on success, leaves the stale entry (annotated) otherwise.
        ``est_seconds`` (the cold-compile constant) is replaced by the
        mode's last measured wall cost when the compile cache is warm."""
        if mode in costs:
            est_seconds = min(est_seconds, costs[mode] * 1.4 + 30.0)
        remaining = budget - (time.perf_counter() - t_start)
        if remaining < est_seconds:
            return False
        deadline = min(max(est_seconds * 2.0, est_seconds + 90.0),
                       remaining, deadline_cap)
        name_fallback = (
            RECORDED_HEADLINE[0] if mode == "decode"
            else RECORDED[mode][0] if mode in RECORDED else None
        )
        metric = None
        for attempt in (0, 1):
            t_mode = time.perf_counter()
            try:
                metric, value, unit = _run_mode_subprocess(mode, deadline)
                if not fake:
                    _record_cost(mode, time.perf_counter() - t_mode)
                break
            except Exception as e:
                err = type(e).__name__
                crashed_fast = (time.perf_counter() - t_mode) < 0.5 * deadline
                # transient TPU RESOURCE_EXHAUSTED observed 2026-08-19: the
                # remote runtime can take ~1 min to free a dead process's
                # HBM, and the bf16 7B headline needs nearly all of it —
                # one quick-crash retry recovers it. Timeouts never retry
                # (the second attempt would also eat the budget).
                if attempt == 0 and crashed_fast and not fake:
                    time.sleep(60.0)
                    continue
                if mode == "decode":
                    record["headline_error"] = err
                elif name_fallback is not None:
                    record["extra"][name_fallback] = {
                        "value": RECORDED[mode][1], "stale": True,
                        "error": err,
                    }
                else:
                    # no recorded constant to fall back on (first-round
                    # mode): note the error, don't invent a value
                    record.setdefault("mode_errors", {})[mode] = err
                checkpoint()
                return False
        if metric is None:
            return False
        if mode == "decode":
            baseline = BASELINES.get(metric, 0.0)
            record.update(
                metric=metric,
                value=round(value, 2),
                vs_baseline=round(value / baseline, 4) if baseline else None,
                unit=unit,
            )
            record.pop("stale", None)
        else:
            record["extra"][metric] = round(value, 2)
        checkpoint()
        return True

    headline_est = float(os.environ.get("UFVIDEO_BENCH_HEADLINE_EST", 600.0))
    run_live("decode", headline_est)
    for mode, est_seconds in DRIVER_EXTRA_MODES:
        run_live(mode, est_seconds)
    emit(partial=False)


def main():
    _maybe_enable_compile_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "driver"
    if which == "driver":
        _driver()
        return
    fns = _mode_fns()
    if which == "all":
        for name, fn in fns.items():
            try:
                metric, value, unit = fn()
                print(json.dumps({"metric": metric, "value": round(float(value), 2), "unit": unit}), flush=True)
            except Exception as e:  # e.g. e2e_batch16 (int8) exceeds HBM
                print(json.dumps({"mode": name, "error": type(e).__name__}),
                      flush=True)
        return
    t0 = time.perf_counter()
    metric, value, unit = fns[which]()
    if os.environ.get("UFVIDEO_BENCH_FAKE", "") != "1":
        # manual runs warm the compile cache AND teach the driver this
        # mode's true wall cost (plus interpreter/import overhead ~10 s,
        # which the driver's subprocess pays too)
        _record_cost(which, time.perf_counter() - t0 + 10.0)
    baseline = BASELINES.get(metric, 0.0)
    print(json.dumps({
        "metric": metric,
        "value": round(float(value), 2),
        "unit": unit,
        "vs_baseline": round(float(value) / baseline, 4) if baseline else None,
    }))


if __name__ == "__main__":
    main()
