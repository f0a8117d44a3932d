"""Real CLIP byte-pair-encoding tokenizer.

Reference behavior:
/root/reference/featurenerf_robo/correspondence/simple_tokenizer.py:62-131
(SimpleTokenizer: byte-level BPE with ``</w>`` word terminals, lowercasing,
whitespace collapse) and
/root/reference/featurenerf_robo/correspondence/clip.py:642 (``tokenize``:
``<|startoftext|> ids <|endoftext|>`` framing, zero-padded to 77).

This is a from-scratch implementation of the (public, standard) algorithm,
parameterized by the standard ``bpe_simple_vocab_16e6.txt.gz`` merges file.
That learned-merges file is *data* the reference downloads at install time;
it is not bundled here (zero egress), so callers pass its path when
available. Algorithm parity is locked by a golden test against the
independent HuggingFace ``CLIPTokenizer`` implementation built from the
same vocabulary files (tests/test_clip_bpe.py).

Differences from the reference implementation, by design:
  - ``ftfy.fix_text`` (mojibake repair) is applied only when ftfy is
    installed; it is the identity on the ASCII task instructions this
    framework consumes.
"""
from __future__ import annotations

import gzip
import html
from functools import lru_cache
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np
import regex

# CLIP's word-splitting pattern: special tokens, common English
# contractions, letter runs, single digits, punctuation runs.
_WORD_PATTERN = regex.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
    regex.IGNORECASE,
)

SOT = "<|startoftext|>"
EOT = "<|endoftext|>"


@lru_cache()
def byte_to_unicode() -> Dict[int, str]:
    """GPT-2 style reversible byte->printable-unicode map (no whitespace or
    control chars among the values, so BPE never merges across real
    spaces)."""
    keep = (list(range(ord("!"), ord("~") + 1))
            + list(range(ord("\xa1"), ord("\xac") + 1))
            + list(range(ord("\xae"), ord("\xff") + 1)))
    table: Dict[int, str] = {b: chr(b) for b in keep}
    fill = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + fill)
            fill += 1
    return table


def _clean(text: str) -> str:
    try:  # mojibake repair if available; identity for well-formed text
        import ftfy
        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    return regex.sub(r"\s+", " ", text).strip().lower()


class ClipBPETokenizer:
    """Byte-level BPE with ``</w>`` end-of-word markers, CLIP vocabulary
    layout: 256 byte tokens, 256 ``byte</w>`` tokens, one token per merge,
    then SOT and EOT (ids 49406/49407 with the standard 48894-merge file).
    """

    def __init__(self, merges: Sequence[Tuple[str, str]]):
        b2u = byte_to_unicode()
        units = list(b2u.values())
        tokens: List[str] = units + [u + "</w>" for u in units]
        tokens += ["".join(pair) for pair in merges]
        tokens += [SOT, EOT]
        self.rank = {pair: i for i, pair in enumerate(merges)}
        self.token_to_id = {tok: i for i, tok in enumerate(tokens)}
        self.id_to_token = tokens
        self._b2u = b2u
        self._cache: Dict[str, List[str]] = {SOT: [SOT], EOT: [EOT]}

    @classmethod
    def from_file(cls, path: str, n_merges: int = 49152 - 256 - 2
                  ) -> "ClipBPETokenizer":
        """Load the standard ``bpe_simple_vocab_16e6.txt.gz`` (or a plain
        text merges file whose first line is a header)."""
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [tuple(line.split()) for line in lines[1:n_merges + 1]
                  if line.strip()]
        return cls(merges)  # type: ignore[arg-type]

    @property
    def vocab_size(self) -> int:
        return len(self.id_to_token)

    @property
    def sot_id(self) -> int:
        return self.token_to_id[SOT]

    @property
    def eot_id(self) -> int:
        return self.token_to_id[EOT]

    def _bpe(self, word: str) -> List[str]:
        """Merge the unicode-mapped characters of one word (last char
        carries ``</w>``) greedily by merge rank."""
        if word in self._cache:
            return self._cache[word]
        parts: List[str] = list(word[:-1]) + [word[-1] + "</w>"]
        while len(parts) > 1:
            pairs = zip(parts[:-1], parts[1:])
            best = min(pairs, key=lambda p: self.rank.get(p, float("inf")))
            if best not in self.rank:
                break
            merged: List[str] = []
            i = 0
            while i < len(parts):
                if (i + 1 < len(parts)
                        and (parts[i], parts[i + 1]) == best):
                    merged.append(parts[i] + parts[i + 1])
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        self._cache[word] = parts
        return parts

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for chunk in _WORD_PATTERN.findall(_clean(text)):
            mapped = "".join(self._b2u[b] for b in chunk.encode("utf-8"))
            ids.extend(self.token_to_id[t] for t in self._bpe(mapped))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.id_to_token[i] for i in ids)
        u2b = {u: b for b, u in self._b2u.items()}
        raw = bytes(u2b[c] for c in text if c in u2b)
        return (raw.decode("utf-8", errors="replace")
                .replace("</w>", " ").strip())

    def tokenize(self, texts, context_length: int = 77,
                 truncate: bool = True) -> np.ndarray:
        """(B, context_length) int32 with SOT/EOT framing, zero padding —
        the contract `models.clip_text.ClipTextEncoder` consumes (EOT must
        be the max id for argmax pooling; it is, by vocabulary layout)."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot_id] + self.encode(t) + [self.eot_id]
            if len(ids) > context_length:
                if not truncate:
                    raise ValueError(
                        f"'{t}' needs {len(ids)} > {context_length} tokens")
                ids = ids[:context_length - 1] + [self.eot_id]
            out[i, :len(ids)] = ids
        return out

    # -- interop -----------------------------------------------------------
    def vocab_dict(self) -> Dict[str, int]:
        """token -> id mapping (e.g. to build a HuggingFace CLIPTokenizer
        from the same data for cross-validation)."""
        return dict(self.token_to_id)
