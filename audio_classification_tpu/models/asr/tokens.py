"""Token table: sherpa-style ``tokens.txt`` (symbol<space>id per line).

Decoding mirrors sherpa-onnx text assembly: sentencepiece-style pieces use
"▁" as the word boundary; bare CJK chars concatenate; ``<blk>``/``<unk>``
and SenseVoice prompt tokens (``<|zh|>`` etc.) are filtered.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterable, List

BLANK_TOKENS = {"<blk>", "<blank>", "<pad>", "<eps>"}
SPECIAL_PREFIX = "<|"


class TokenTable:
    def __init__(self, id_to_sym: Dict[int, str], blank_id: int = 0):
        self.id_to_sym = dict(id_to_sym)
        self.sym_to_id = {s: i for i, s in self.id_to_sym.items()}
        self.blank_id = blank_id

    @property
    def vocab_size(self) -> int:
        return max(self.id_to_sym) + 1 if self.id_to_sym else 0

    @classmethod
    def load(cls, path: str | Path) -> "TokenTable":
        id_to_sym: Dict[int, str] = {}
        blank_id = 0
        for line in Path(path).read_text(encoding="utf-8").splitlines():
            if not line.strip():
                continue
            # token text may itself contain a space only via the ▁ marker, so
            # rsplit on the last whitespace run
            parts = line.rsplit(None, 1)
            if len(parts) != 2:
                continue
            sym, idx = parts[0], int(parts[1])
            id_to_sym[idx] = sym
            if sym in BLANK_TOKENS:
                blank_id = idx
        return cls(id_to_sym, blank_id)

    @classmethod
    def char_table(cls, chars: str) -> "TokenTable":
        """Tiny synthetic table for tests: blank=0, then one id per char."""
        table = {0: "<blk>"}
        for i, ch in enumerate(sorted(set(chars)), start=1):
            table[i] = ch
        return cls(table, blank_id=0)

    def encode(self, text: str) -> List[int]:
        """Char-level encode (test/synthetic vocab only)."""
        return [self.sym_to_id[ch] for ch in text if ch in self.sym_to_id]

    def decode(self, ids: Iterable[int]) -> str:
        out: List[str] = []
        for i in ids:
            sym = self.id_to_sym.get(int(i), "")
            if not sym or sym in BLANK_TOKENS or sym == "<unk>":
                continue
            if sym.startswith(SPECIAL_PREFIX) and sym.endswith("|>"):
                continue  # SenseVoice language/itn/event prompt tokens
            if sym.startswith("▁"):
                out.append(" " + sym[1:])
            elif sym.startswith("@@"):
                out.append(sym[2:])
            else:
                out.append(sym)
        return "".join(out).strip()
