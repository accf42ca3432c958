"""Conversation prompt templates.

Behavioral re-implementation of the reference's prompt builder (reference:
ufvideo/conversation.py:19-118 Conversation.get_prompt and the template
registry at :480-505). Only the styles the pipeline actually exercises are
kept: QWEN (ChatML — the model's template), PLAIN (pretraining pairs), and
SINGLE/TWO/LLAMA2 for registry parity.
"""

from __future__ import annotations

import dataclasses
from enum import Enum, auto
from typing import List, Sequence, Tuple


class SeparatorStyle(Enum):
    SINGLE = auto()
    TWO = auto()
    PLAIN = auto()
    LLAMA2 = auto()
    QWEN = auto()


@dataclasses.dataclass
class Conversation:
    system: str
    roles: Tuple[str, str]
    messages: List[List[str]]
    offset: int = 0
    sep_style: SeparatorStyle = SeparatorStyle.SINGLE
    sep: str = "###"
    sep2: str = ""
    version: str = "Unknown"
    modality: str = "image"

    def get_prompt(self) -> str:
        messages = self.messages
        modality_token = f"<{self.modality}>"
        if messages and isinstance(messages[0][1], tuple):
            messages = [list(m) for m in self.messages]
            init_role, init_msg = messages[0]
            init_msg = init_msg[0].replace(modality_token, "").strip()
            messages[0] = [init_role, f"{modality_token}\n" + init_msg]

        if self.sep_style == SeparatorStyle.SINGLE:
            ret = self.system + self.sep
            for role, message in messages:
                if message:
                    if isinstance(message, tuple):
                        message = message[0]
                    ret += role + ": " + message + self.sep
                else:
                    ret += role + ":"
            return ret

        if self.sep_style == SeparatorStyle.TWO:
            seps = [self.sep, self.sep2]
            ret = self.system + seps[0]
            for i, (role, message) in enumerate(messages):
                if message:
                    if isinstance(message, tuple):
                        message = message[0]
                    ret += role + ": " + message + seps[i % 2]
                else:
                    ret += role + ":"
            return ret

        if self.sep_style == SeparatorStyle.QWEN:
            # ChatML (conversation.py:88-104): system + <|im_end|>\n, then
            # "<|im_start|>role\n" + msg + "<|im_end|>\n"; a trailing bare
            # role opens the generation turn.
            ret = self.system + self.sep + "\n"
            for i, (role, message) in enumerate(messages):
                if message:
                    if isinstance(message, tuple):
                        message = message[0]
                    ret += role + message + self.sep + "\n"
                else:
                    ret += role
            return ret

        if self.sep_style == SeparatorStyle.PLAIN:
            seps = [self.sep, self.sep2]
            ret = self.system
            for i, (role, message) in enumerate(messages):
                if message:
                    if isinstance(message, tuple):
                        message = message[0]
                    ret += role + message + seps[i % 2]
                else:
                    ret += role
            return ret

        if self.sep_style == SeparatorStyle.LLAMA2:
            def wrap_sys(msg):
                return f"<<SYS>>\n{msg}\n<</SYS>>\n\n" if msg else msg

            def wrap_inst(msg):
                return f"[INST] {msg} [/INST]"

            ret = ""
            for i, (role, message) in enumerate(messages):
                if i == 0 and message:
                    message = wrap_sys(self.system) + (
                        message[0] if isinstance(message, tuple) else message
                    )
                if message:
                    if isinstance(message, tuple):
                        message = message[0]
                    if i % 2 == 0:
                        ret += self.sep + wrap_inst(message)
                    else:
                        ret += " " + message + " " + self.sep2
                else:
                    ret += ""
            return ret.lstrip(self.sep)

        raise ValueError(f"Invalid style: {self.sep_style}")

    def append_message(self, role: str, message) -> None:
        self.messages.append([role, message])

    def copy(self) -> "Conversation":
        return Conversation(
            system=self.system,
            roles=self.roles,
            messages=[list(m) for m in self.messages],
            offset=self.offset,
            sep_style=self.sep_style,
            sep=self.sep,
            sep2=self.sep2,
            version=self.version,
            modality=self.modality,
        )


conv_qwen = Conversation(
    system="<|im_start|>system\nYou are a helpful assistant.",
    roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
    messages=[],
    sep_style=SeparatorStyle.QWEN,
    sep="<|im_end|>",
    version="qwen",
)

conv_qwen_plain = Conversation(
    system="",
    roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
    messages=[],
    sep_style=SeparatorStyle.PLAIN,
    sep="<|im_end|>",
    sep2="<|im_end|>",
    version="qwen_plain",
)

conv_vicuna_v1 = Conversation(
    system=(
        "A chat between a curious user and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite "
        "answers to the user's questions."
    ),
    roles=("USER", "ASSISTANT"),
    messages=[],
    sep_style=SeparatorStyle.TWO,
    sep=" ",
    sep2="</s>",
    version="v1",
)

conv_llama2 = Conversation(
    system=(
        "You are a helpful, respectful and honest assistant. Always answer "
        "as helpfully as possible, while being safe."
    ),
    roles=("USER", "ASSISTANT"),
    messages=[],
    sep_style=SeparatorStyle.LLAMA2,
    sep="<s>",
    sep2="</s>",
    version="llama2",
)

conv_mistral = Conversation(
    system=(
        "A chat between a curious user and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite "
        "answers to the user's questions."
    ),
    roles=("USER", "ASSISTANT"),
    messages=[],
    sep_style=SeparatorStyle.LLAMA2,
    sep="",
    sep2="</s>",
    version="llama2",
)

conv_templates = {
    "qwen": conv_qwen,
    "qwen_plain": conv_qwen_plain,
    "plain": conv_qwen_plain,
    "default": conv_qwen,
    "v1": conv_vicuna_v1,
    "vicuna_v1": conv_vicuna_v1,
    "llava_v1": conv_vicuna_v1,
    "llama2": conv_llama2,
    "mistral": conv_mistral,
}

DEFAULT_SYSTEM = "You are a helpful assistant."


def apply_chat_template(
    messages: Sequence[dict], add_generation_prompt: bool = True
) -> str:
    """Qwen2 ChatML template (what the reference gets from HF
    tokenizer.apply_chat_template, ufvideo/__init__.py:104): inserts the
    default system turn when none is provided."""
    out = []
    if not messages or messages[0].get("role") != "system":
        out.append(f"<|im_start|>system\n{DEFAULT_SYSTEM}<|im_end|>\n")
    for m in messages:
        out.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
    if add_generation_prompt:
        out.append("<|im_start|>assistant\n")
    return "".join(out)
