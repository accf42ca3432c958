"""Model-wide constants and token conventions.

Behavioral parity with the reference constants (reference:
ufvideo/constants.py:1-57) — same sentinel ids, frame budgets, temporal-token
format, and segmentation prompt templates — so that datasets, prompts, and
eval records produced for the reference remain valid for this framework.
"""

# Loss / label conventions -------------------------------------------------
IGNORE_INDEX = -100

# Modal sentinel token ids (negative so they can never collide with real
# vocabulary ids; interleaved into input_ids by the multimodal tokenizer).
IMAGE_TOKEN_INDEX = -200
VIDEO_TOKEN_INDEX = -201
AUDIO_TOKEN_INDEX = -202

DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_VIDEO_TOKEN = "<video>"
DEFAULT_AUDIO_TOKEN = "<audio>"

MODAL_INDEX_MAP = {
    "<image>": IMAGE_TOKEN_INDEX,
    "<video>": VIDEO_TOKEN_INDEX,
    "<audio>": AUDIO_TOKEN_INDEX,
}

# Frame budgets (reference: ufvideo/constants.py:20-22).
NUM_FRAMES = 32
MAX_FRAMES = 32
NUM_FRAMES_PER_SECOND = 1
# Number of frames fed to the SAM2 video branch during training
# (reference: ufvideo/train.py:311-315 get_dense_indices samples 4).
NUM_FRAMES_SAM = 4

# Temporal grounding: 100 discrete relative-timestamp tokens
# (reference: ufvideo/constants.py:28).
TEMPORAL_TOKEN_FORMAT = "<TEMP-{:03d}>"
NUM_TEMPORAL_TOKENS = 100

# Region / segmentation special tokens (reference: videorefer_arch.py:373-379).
REGION_TOKEN = "<region>"
SEG_TOKEN = "[SEG]"

# Segmentation QA templates (reference: ufvideo/constants.py:44-57).
QUESTION_LIST = [
    "Can you segment the {class_name} in this image?",
    "Please segment the {class_name} in this image.",
    "What is {class_name} in this image? Please respond with segmentation mask.",
    "What is {class_name} in this image? Please output segmentation mask.",
]

ANSWER_LIST = [
    "It is [SEG].",
    "Sure, [SEG].",
    "Sure, it is [SEG].",
    "Sure, the segmentation result is [SEG].",
    "[SEG].",
]


def temporal_tokens() -> list:
    """The 100 `<TEMP-000>..<TEMP-099>` temporal grounding tokens."""
    return [TEMPORAL_TOKEN_FORMAT.format(i) for i in range(NUM_TEMPORAL_TOKENS)]


def extra_special_tokens() -> list:
    """All tokens added on top of the base LLM tokenizer, in the order the
    reference adds them (videorefer_arch.py:373-379): <region>, 100 temporal
    tokens, then [SEG]."""
    return [REGION_TOKEN, *temporal_tokens(), SEG_TOKEN]
