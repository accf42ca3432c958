"""Continuous-batching engine: in-flight admission correctness on the tiny
model (slot outputs must match mm_infer regardless of batchmates), plus
surface checks."""

import threading
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # real tiny model, compile-heavy

from ufvideo_tpu.api import mm_infer, model_init
from ufvideo_tpu.configs import tiny_config
from ufvideo_tpu.engine import StreamingEngine


@pytest.fixture(scope="module")
def runtime():
    return model_init(None, cfg=tiny_config())


def _video(cfg, seed):
    rng = np.random.RandomState(seed)
    return rng.randn(
        cfg.budget.num_frames, cfg.vision.image_size, cfg.vision.image_size, 3
    ).astype(np.float32)


def test_engine_matches_mm_infer_with_staggered_admission(runtime):
    model, _, tok = runtime
    cfg = model.cfg
    videos = [_video(cfg, i) for i in range(3)]
    prompts = [f"What happens in scene {i}?" for i in range(3)]
    expect = [
        mm_infer(v, p, model, tok, max_new_tokens=6)[0]
        for v, p in zip(videos, prompts)
    ]

    with StreamingEngine(model, tok, max_slots=2, chunk=2,
                         max_new_cap=8) as eng:
        # request 0 starts alone; 1 joins mid-decode; 2 queues behind the
        # 2-slot limit and admits when a slot frees — all three must match
        # their solo mm_infer outputs exactly
        f0 = eng.submit({"video": videos[0], "instruct": prompts[0]},
                        max_new_tokens=6)
        time.sleep(0.3)
        f1 = eng.submit({"video": videos[1], "instruct": prompts[1]},
                        max_new_tokens=6)
        f2 = eng.submit({"video": videos[2], "instruct": prompts[2]},
                        max_new_tokens=6)
        got = [f.result(timeout=600) for f in (f0, f1, f2)]
        st = eng.stats()
    for i, (text, out) in enumerate(got):
        assert text == expect[i], i
        assert out["pred_masks"] == []
    assert st["completed"] == 3 and st["errors"] == 0
    assert st["admissions"] == 3


def test_engine_streams_share_the_batch(runtime):
    model, _, tok = runtime
    cfg = model.cfg
    v = _video(cfg, 7)
    expect = mm_infer(v, "Describe.", model, tok, max_new_tokens=6)[0]

    with StreamingEngine(model, tok, max_slots=3, chunk=2,
                         max_new_cap=8) as eng:
        futs = [
            eng.submit_stream({"video": v, "instruct": "Describe."},
                              max_new_tokens=6)
            for _ in range(3)
        ]
        texts = ["".join(f).strip() for f in futs]
        st = eng.stats()
    assert texts == [expect] * 3
    # three concurrent streams decoded in shared chunks, not serialized:
    # a serialized engine would need ~3x the chunk dispatches
    assert st["chunks"] <= 2 * (6 // 2 + 2)


def test_engine_spec_mode_matches_mm_infer(runtime):
    """spec_k composes slot batching with speculation: staggered admission,
    outputs still token-exact vs solo mm_infer."""
    model, _, tok = runtime
    cfg = model.cfg
    videos = [_video(cfg, 20 + i) for i in range(2)]
    prompts = [f"Describe object {i}." for i in range(2)]
    expect = [
        mm_infer(v, p, model, tok, max_new_tokens=6)[0]
        for v, p in zip(videos, prompts)
    ]
    with StreamingEngine(model, tok, max_slots=2, chunk=2, max_new_cap=8,
                         spec_k=2) as eng:
        f0 = eng.submit({"video": videos[0], "instruct": prompts[0]},
                        max_new_tokens=6)
        time.sleep(0.3)
        f1 = eng.submit({"video": videos[1], "instruct": prompts[1]},
                        max_new_tokens=6)
        got = [f.result(timeout=600) for f in (f0, f1)]
        st = eng.stats()
    for i, (text, _out) in enumerate(got):
        assert text == expect[i], i
    assert st["completed"] == 2 and st["errors"] == 0
    assert st["spec"]["drafted"] > 0  # the spec path actually ran


def test_engine_rejects_unsupported(runtime):
    model, _, tok = runtime
    with StreamingEngine(model, tok, max_slots=2, max_new_cap=8) as eng:
        with pytest.raises(ValueError, match="greedy-only"):
            eng.submit({"instruct": "x"}, modal="text", do_sample=True)
        with pytest.raises(ValueError, match="QA-only"):
            eng.submit(
                {"instruct": "x", "images_sam": np.zeros((1, 8, 8, 3))},
                modal="text",
            )
        with pytest.raises(ValueError, match="cap"):
            eng.submit({"instruct": "x"}, modal="text", max_new_tokens=99)


def test_engine_batched_admission_matches_solo(runtime):
    """The admission pipeline batches same-shaped queued video requests
    into ONE encode/splice/prefill dispatch chain. Every stage is
    row-independent, so the prepared state (scratch KV rows, first token,
    lengths) must equal the solo chain bit-for-bit — this is what makes
    engine outputs token-identical to mm_infer regardless of who was
    queued alongside."""
    import jax

    from ufvideo_tpu import engine as engine_mod
    from ufvideo_tpu.api import _assemble_input_ids
    from ufvideo_tpu.constants import DEFAULT_VIDEO_TOKEN
    from ufvideo_tpu.serve import ServeFuture

    model, _, tok = runtime
    cfg = model.cfg
    videos = [_video(cfg, 40 + i) for i in range(3)]
    prompts = [
        "What happens?",
        "Describe the third object in this scene in detail.",
        "Why?",
    ]
    with StreamingEngine(model, tok, max_slots=4, max_new_cap=8) as eng:
        reqs = [
            engine_mod._EngineRequest(
                {"video": v, "instruct": p}, "video", 1,
                {"max_new_tokens": 6}, ServeFuture(), False,
            )
            for v, p in zip(videos, prompts)
        ]
        batched = eng._prepare(reqs)
        assert all(isinstance(b, engine_mod._Prepared) for b in batched)
        # batching actually happened: same-shape videos share a scratch
        assert batched[0].scratch is batched[1].scratch
        # batched prepare consumes (drops) each request's video payload, so
        # the solo comparison runs on freshly-built requests
        for v, p, prep in zip(videos, prompts, batched):
            ids = _assemble_input_ids(p, 1, DEFAULT_VIDEO_TOKEN, tok)
            solo_req = engine_mod._EngineRequest(
                {"video": v, "instruct": p}, "video", 1,
                {"max_new_tokens": 6}, ServeFuture(), False,
            )
            solo = eng._prepare_one(solo_req, ids)
            assert prep.t0 == solo.t0
            assert prep.real_len == solo.real_len
            jax.tree.map(
                lambda a, b, src=prep.src: np.testing.assert_array_equal(
                    np.asarray(a)[:, src], np.asarray(b)[:, 0]
                ),
                prep.scratch, solo.scratch,
            )


def test_engine_kv_quant_cache(runtime):
    """Quantized persistent cache: _copy_slot/decode must route the scale
    leaves too, and outputs still match the (same-quantization) solo path."""
    model0, _, tok = runtime
    model, _, tok2 = model_init(None, cfg=tiny_config().replace(quant_kv=True))
    cfg = model.cfg
    v = _video(cfg, 11)
    expect = mm_infer(v, "What is shown?", model, tok2, max_new_tokens=5)[0]
    with StreamingEngine(model, tok2, max_slots=2, chunk=2,
                         max_new_cap=8) as eng:
        got = eng.submit({"video": v, "instruct": "What is shown?"},
                         max_new_tokens=5).result(timeout=600)
    assert got[0] == expect


def test_engine_close_drains_queue(runtime):
    model, _, tok = runtime
    cfg = model.cfg
    v = _video(cfg, 9)
    eng = StreamingEngine(model, tok, max_slots=1, chunk=2, max_new_cap=8)
    f1 = eng.submit({"video": v, "instruct": "a?"}, max_new_tokens=4)
    f2 = eng.submit({"video": v, "instruct": "b?"}, max_new_tokens=4)
    eng.close(timeout=600)
    assert isinstance(f1.result(timeout=1)[0], str)
    assert isinstance(f2.result(timeout=1)[0], str)


def test_engine_concurrent_admitters_exact(runtime):
    """admitters=3 pipelines the latency-bound admission chain across
    threads (slot claims atomic under _admit_lock). Eight requests flood a
    4-slot engine from 8 client threads; every output must still match its
    solo mm_infer exactly and every slot be admitted exactly once."""
    model, _, tok = runtime
    cfg = model.cfg
    videos = [_video(cfg, 20 + i) for i in range(8)]
    prompts = [f"Scene {i} shows?" for i in range(8)]
    expect = [
        mm_infer(v, p, model, tok, max_new_tokens=5)[0]
        for v, p in zip(videos, prompts)
    ]
    results = [None] * 8
    with StreamingEngine(model, tok, max_slots=4, chunk=2,
                         max_new_cap=8, admitters=3) as eng:
        def client(i):
            results[i] = eng.submit(
                {"video": videos[i], "instruct": prompts[i]},
                max_new_tokens=5,
            ).result(timeout=600)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        st = eng.stats()
    for i, got in enumerate(results):
        assert got is not None and got[0] == expect[i], i
    assert st["completed"] == 8 and st["errors"] == 0
    assert st["admissions"] == 8
