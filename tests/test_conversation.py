"""Prompt byte-parity against the reference.

Three oracles:
  1. reference ufvideo/conversation.py Conversation.get_prompt — loaded
     read-only as a package module; every shared template key must produce
     byte-identical prompts on a shared corpus.
  2. the public Qwen2 ChatML jinja template (what the reference gets from
     HF tokenizer.apply_chat_template) rendered with jinja2, vs our
     apply_chat_template.
  3. reference train.py preprocess/preprocess_plain (label masking) —
     function sources extracted by AST (train.py's module imports need
     decord, which this image lacks) and exec'd with the same tokenizer.
"""

import ast
import importlib
import importlib.util
import os
import sys

import pytest

REF_DIR = "/root/reference/ufvideo"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference oracle not mounted"
)

from ufvideo_tpu import conversation as ours
from ufvideo_tpu.constants import IGNORE_INDEX, MODAL_INDEX_MAP
from ufvideo_tpu.conversation import apply_chat_template
from ufvideo_tpu.mm_utils import tokenizer_multimodal_token
from ufvideo_tpu.tokenization import ByteTokenizer
from ufvideo_tpu.train.data import preprocess_conversation, preprocess_plain


@pytest.fixture(scope="module")
def ref_conv():
    """Load reference conversation.py as part of a synthetic package so its
    relative `from .constants import ...` resolves."""
    pkg_name = "_refufv"
    if pkg_name in sys.modules:
        return sys.modules[pkg_name + ".conversation"]
    spec = importlib.machinery.ModuleSpec(pkg_name, None, is_package=True)
    spec.submodule_search_locations = [REF_DIR]
    pkg = importlib.util.module_from_spec(spec)
    sys.modules[pkg_name] = pkg
    return importlib.import_module(pkg_name + ".conversation")


# Every key present in our registry must exist in the reference's and
# produce identical bytes.
SHARED_KEYS = [
    "qwen", "qwen_plain", "plain", "v0_plain", "default", "v0",
    "v1", "vicuna_v1", "llava_v1", "llama2", "mistral",
]

# (first-user, assistant, second-user, assistant) corpus with the tags the
# pipeline actually produces
TURNS = [
    ("<video>\nWhat is the object <region> doing?", "It is running. [SEG]"),
    ("Where does it go between <TEMP-012> and <TEMP-087>?", "Into the house."),
]


def _fill(conv, n_turns=2, trailing_none=False, tuple_first=False):
    for i, (q, a) in enumerate(TURNS[:n_turns]):
        if i == 0 and tuple_first:
            conv.append_message(conv.roles[0], (q, None, "Default"))
        else:
            conv.append_message(conv.roles[0], q)
        conv.append_message(conv.roles[1], a)
    if trailing_none:
        conv.messages[-1][1] = None
    return conv


@pytest.mark.parametrize("key", SHARED_KEYS)
@pytest.mark.parametrize(
    "n_turns,trailing_none,tuple_first",
    [(1, False, False), (2, False, False), (1, True, False), (2, True, False),
     (1, False, True), (2, True, True)],
)
def test_get_prompt_byte_parity(ref_conv, key, n_turns, trailing_none,
                                tuple_first):
    theirs = _fill(ref_conv.conv_templates[key].copy(), n_turns,
                   trailing_none, tuple_first)
    mine = _fill(ours.conv_templates[key].copy(), n_turns,
                 trailing_none, tuple_first)
    assert mine.get_prompt() == theirs.get_prompt(), key


def test_get_prompt_video_modality(ref_conv):
    for key in ("qwen", "v1"):
        theirs = ref_conv.conv_templates[key].copy()
        theirs.modality = "video"
        mine = ours.conv_templates[key].copy()
        mine.modality = "video"
        for c in (theirs, mine):
            c.append_message(c.roles[0], ("say <video> something", None, "Default"))
            c.append_message(c.roles[1], None)
        assert mine.get_prompt() == theirs.get_prompt(), key


# The Qwen2 chat template string shipped in the public Qwen2 tokenizer_config
# (the reference calls tokenizer.apply_chat_template; train.py:205-224).
QWEN2_JINJA = (
    "{% for message in messages %}"
    "{% if loop.first and messages[0]['role'] != 'system' %}"
    "{{ '<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n' }}"
    "{% endif %}"
    "{{'<|im_start|>' + message['role'] + '\n' + message['content'] "
    "+ '<|im_end|>' + '\n'}}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
)


def _jinja_chat(messages, add_generation_prompt):
    import jinja2

    return jinja2.Template(QWEN2_JINJA).render(
        messages=messages, add_generation_prompt=add_generation_prompt
    )


@pytest.mark.parametrize("agp", [False, True])
def test_apply_chat_template_matches_qwen2_jinja(agp):
    corpora = [
        [{"role": "user", "content": "<video>\nDescribe."}],
        [{"role": "user", "content": "hi <region>"},
         {"role": "assistant", "content": "ok [SEG]"},
         {"role": "user", "content": "more?"}],
        [{"role": "system", "content": "custom sys"},
         {"role": "user", "content": "q"}],
    ]
    for messages in corpora:
        assert apply_chat_template(messages, add_generation_prompt=agp) == \
            _jinja_chat(messages, agp)


# ---------------------------------------------------------------------------
# label-mask parity vs reference train.py preprocess / preprocess_plain
# ---------------------------------------------------------------------------

def _extract_functions(path, names):
    src = open(path).read()
    tree = ast.parse(src)
    out = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in names:
            out[node.name] = ast.get_source_segment(src, node)
    assert set(out) == set(names), (set(names) - set(out), path)
    return out


class _OracleTokenizer(ByteTokenizer):
    """Our deterministic byte tokenizer + the jinja ChatML oracle, quacking
    like the HF tokenizer the reference preprocess expects."""

    def apply_chat_template(self, messages, tokenize=False,
                            add_generation_prompt=False):
        assert not tokenize
        return _jinja_chat(messages, add_generation_prompt)


@pytest.fixture(scope="module")
def ref_preprocess():
    import copy as _copy

    import torch

    fns = _extract_functions(
        os.path.join(REF_DIR, "train.py"), ["preprocess", "preprocess_plain"]
    )
    tok_fn = _extract_functions(
        os.path.join(REF_DIR, "mm_utils.py"), ["tokenizer_multimodal_token"]
    )
    import transformers

    ns = {
        "copy": _copy,
        "torch": torch,
        "transformers": transformers,
        "IGNORE_INDEX": IGNORE_INDEX,
        "MODAL_INDEX_MAP": MODAL_INDEX_MAP,
        "DEFAULT_IMAGE_TOKEN": "<image>",
        "Dict": dict,
        "Sequence": list,
    }
    exec(tok_fn["tokenizer_multimodal_token"], ns)
    exec(fns["preprocess"], ns)
    exec(fns["preprocess_plain"], ns)
    return ns


CONVS = [
    [
        {"from": "human", "value": "<video>\nWhat is happening?"},
        {"from": "gpt", "value": "A dog runs."},
    ],
    [
        {"from": "human", "value": "<video>\nSegment the object <region>."},
        {"from": "gpt", "value": "Sure, [SEG]."},
        {"from": "human", "value": "And between <TEMP-000> and <TEMP-099>?"},
        {"from": "gpt", "value": "It jumps."},
    ],
    [
        {"from": "gpt", "value": "stray leading turn"},
        {"from": "human", "value": "<video>\nhello"},
        {"from": "gpt", "value": "hi"},
    ],
]


@pytest.mark.parametrize("conv_idx", range(len(CONVS)))
def test_preprocess_label_mask_parity(ref_preprocess, conv_idx):
    tok = _OracleTokenizer()
    source = CONVS[conv_idx]
    ref_out = ref_preprocess["preprocess"](
        [source], tok, modal_token="<video>"
    )
    ids, labels = preprocess_conversation(source, tok, modal_token="<video>")
    assert ids == ref_out["input_ids"][0].tolist()
    assert labels == ref_out["labels"][0].tolist()
    assert any(l == IGNORE_INDEX for l in labels)
    assert any(l != IGNORE_INDEX for l in labels)


def test_preprocess_plain_parity(ref_preprocess):
    tok = _OracleTokenizer()
    source = [
        {"from": "human", "value": "<video>"},
        {"from": "gpt", "value": "a cat sits on a mat"},
    ]
    ref_out = ref_preprocess["preprocess_plain"](
        [source], tok, modal_token="<video>"
    )
    ids, labels = preprocess_plain(source, tok, modal_token="<video>")
    assert ids == ref_out["input_ids"][0].tolist()
    assert labels == ref_out["labels"][0].tolist()
