"""Eval metrics: parity with the reference scorers (oracle import with
stubbed native deps) + harness plumbing round-trips."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from ufvideo_tpu.eval.metrics import (
    _disk,
    accuracy,
    boundary_f_measure,
    match_mc_answer,
    parse_temporal_span,
    recall_at_k,
    region_similarity,
    temporal_iou,
)
from ufvideo_tpu.eval.util import (
    get_chunk,
    load_mask_pngs,
    rank_output_path,
    read_all_ranks,
    save_mask_pngs,
    split_chunks,
)

REF_SEG = "/root/reference/ufvideo/eval/eval_video_Seg.py"


@pytest.fixture(scope="module")
def ref_seg():
    if not os.path.exists(REF_SEG):
        pytest.skip("reference not mounted")
    # stub the native deps the oracle imports but our checks don't exercise
    if "pycocotools" not in sys.modules:
        pc = types.ModuleType("pycocotools")
        pc.mask = types.ModuleType("pycocotools.mask")
        sys.modules["pycocotools"] = pc
        sys.modules["pycocotools.mask"] = pc.mask
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        morph = types.ModuleType("skimage.morphology")
        morph.disk = _disk
        sk.morphology = morph
        sys.modules["skimage"] = sk
        sys.modules["skimage.morphology"] = morph
    spec = importlib.util.spec_from_file_location("ref_seg", REF_SEG)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _random_masks(seed, n=4, h=48, w=64):
    rng = np.random.RandomState(seed)
    masks = []
    for _ in range(n):
        m = np.zeros((h, w), np.uint8)
        cy, cx = rng.randint(10, h - 10), rng.randint(10, w - 10)
        r = rng.randint(4, 10)
        y, x = np.ogrid[:h, :w]
        m[(y - cy) ** 2 + (x - cx) ** 2 <= r * r] = 1
        masks.append(m)
    return masks


def test_region_similarity_matches_reference(ref_seg):
    gts = _random_masks(0)
    preds = _random_masks(1)
    for gt, pred in zip(gts, preds):
        want = ref_seg.db_eval_iou(gt, pred)
        got = region_similarity(gt, pred)
        np.testing.assert_allclose(got, want, atol=1e-9)
    # empty-union convention
    z = np.zeros((8, 8), np.uint8)
    assert region_similarity(z, z) == ref_seg.db_eval_iou(z, z) == 1


def test_boundary_f_matches_reference(ref_seg):
    gts = _random_masks(2)
    preds = _random_masks(3)
    for gt, pred in zip(gts, preds):
        want = ref_seg.db_eval_boundary(gt, pred)
        got = boundary_f_measure(gt, pred)
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_temporal_iou():
    assert temporal_iou([0, 10], [5, 15]) == pytest.approx(5 / 15)
    assert temporal_iou([0, 5], [5, 10]) == 0.0
    assert temporal_iou([2, 4], [2, 4]) == 1.0
    r = recall_at_k([0.2, 0.4, 0.6, 0.8])
    assert r[0.3] == 75.0 and r[0.5] == 50.0 and r[0.7] == 25.0


def test_parse_temporal_span():
    assert parse_temporal_span("from <TEMP-010> to <TEMP-099>.") == (
        pytest.approx(10 / 99), pytest.approx(1.0)
    )
    assert parse_temporal_span("{12.5, 30.0}") == (12.5, 30.0)
    assert parse_temporal_span("no numbers") is None


def test_match_mc_answer():
    opts = ["a red car", "a blue bike", "a green bus"]
    assert match_mc_answer("(B) a blue bike", opts) == "B"
    assert match_mc_answer("B.", opts) == "B"
    assert match_mc_answer("I think it is a green bus", opts) == "C"
    # reference default: unmatched outputs fall to option index 2
    # (inference_video_mcqa_mvbench.py:195-196)
    assert match_mc_answer("no idea", opts) == "C"
    # 'Answer'/'answer' words are stripped before letter search
    assert match_mc_answer("Answer: (A)", opts) == "A"
    assert accuracy([{"pred": "A", "gt": "A"}, {"pred": "B", "gt": "C"}]) == 50.0


def test_chunking_and_rank_files(tmp_path):
    items = list(range(10))
    chunks = split_chunks(items, 3)
    assert sum(len(c) for c in chunks) == 10
    assert get_chunk(items, 3, 0) == [0, 1, 2, 3]
    assert rank_output_path("out.json", 2) == "out_rank2.json"

    from ufvideo_tpu.eval.util import JsonlWriter

    for rank in range(2):
        w = JsonlWriter(str(tmp_path / f"res_rank{rank}.json"))
        w.write({"rank": rank})
        w.close()
    merged = read_all_ranks(str(tmp_path / "res.json"))
    assert len(merged) == 2


def test_mask_png_roundtrip(tmp_path):
    masks = np.stack(_random_masks(5, n=3))
    save_mask_pngs(str(tmp_path), "vid1", masks)
    loaded = load_mask_pngs(str(tmp_path), "vid1")
    assert len(loaded) == 3
    np.testing.assert_array_equal(np.stack(loaded), masks)


def test_span_parsing_reference_parity():
    """replace_and_normalize / parse_span_from_text / format_1d_box /
    format_2d_box vs the reference implementations, exec'd from source
    (inference_PixTRQA.py:165-198, inference_video_TVG.py:38-62)."""
    import ast
    import os
    import re as _re

    from ufvideo_tpu.eval.metrics import (
        format_1d_box,
        format_2d_box,
        parse_span_from_text,
        replace_and_normalize,
    )

    ref_dir = "/root/reference/ufvideo/eval"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference oracle not mounted")

    def extract(path, names):
        src = open(path).read()
        out = {}
        for node in ast.parse(src).body:
            if isinstance(node, ast.FunctionDef) and node.name in names:
                out[node.name] = ast.get_source_segment(src, node)
        ns = {"re": _re, "print": lambda *a, **k: None}
        for n in names:
            exec(out[n], ns)
        return ns

    trqa = extract(os.path.join(ref_dir, "inference_PixTRQA.py"),
                   ["replace_and_normalize", "parse_span_from_text"])
    tvg = extract(os.path.join(ref_dir, "inference_video_TVG.py"),
                  ["format_1d_box", "format_2d_box"])

    corpus = [
        "The event happens at {<TEMP-012>, <TEMP-087>} in the video.",
        "{<TEMP-012>,<TEMP-087>,}",
        "box [<WIDTH-10>, <HEIGHT-20>, <WIDTH-90>, <HEIGHT-80>]",
        "span {1.2, 3.4} and box [0.1, 0.2, 0.3, 0.4]",
        "{ 5 , 9 }",
        "nothing to parse here",
        "<TEMP-000> only one",
        "[12, 34, 56, 78,]",
    ]
    for s in corpus:
        for rt in (False, True):
            assert replace_and_normalize(s, rt) == \
                trqa["replace_and_normalize"](s, rt), (s, rt)
        norm = replace_and_normalize(s)
        assert parse_span_from_text(norm) == trqa["parse_span_from_text"](norm), s
        assert format_1d_box(norm) == tvg["format_1d_box"](norm), s
        assert format_2d_box(norm) == tvg["format_2d_box"](norm), s


def test_parse_temporal_span_reference_formats():
    # the full reference pipeline: TEMP tokens normalized then brace-parsed
    s = parse_temporal_span("at {<TEMP-012>, <TEMP-087>}.")
    assert s is not None
    assert abs(s[0] - 12 / 99) < 1e-5 and abs(s[1] - 87 / 99) < 1e-5
    # brace span with raw floats (a real model's '{1.2, 3.4}')
    assert parse_temporal_span("the span is {1.2, 3.4} ok") == (1.2, 3.4)
