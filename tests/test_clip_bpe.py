"""Golden tests for the real CLIP BPE tokenizer.

The standard learned-merges file is not bundled (zero egress), so algorithm
parity is established against the *independent* HuggingFace
``transformers.CLIPTokenizer`` implementation, constructed from the very
same vocabulary files our tokenizer defines. Identical ids on a realistic
instruction set means only the data file differs from the reference
tokenizer (/root/reference/featurenerf_robo/correspondence/
simple_tokenizer.py:62-131), not the algorithm.
"""
import json

import numpy as np
import pytest

from real_robot_nerf_actor_tpu.models.clip_bpe import (
    EOT, SOT, ClipBPETokenizer, byte_to_unicode)

# Handcrafted but realistic merge list (valid construction order: every
# element is a byte unit or the result of an earlier merge).
MERGES = [
    ("t", "h"), ("th", "e</w>"), ("e", "r</w>"), ("o", "n</w>"),
    ("a", "n"), ("an", "d</w>"), ("i", "n"), ("in", "g</w>"),
    ("o", "p"), ("op", "e"), ("ope", "n</w>"), ("d", "r"),
    ("a", "w"), ("dr", "aw"), ("draw", "er</w>"), ("f", "a"),
    ("u", "c"), ("e", "t</w>"), ("fa", "uc"), ("fauc", "et</w>"),
    ("t", "u"), ("r", "n</w>"), ("tu", "rn</w>"), ("p", "u"),
    ("pu", "t</w>"), ("t", "o"), ("to", "p</w>"), ("o", "v"),
    ("ov", "e"), ("ove", "n</w>"), ("d", "o"), ("do", "o"),
    ("doo", "r</w>"), ("t", "a"), ("s", "k</w>"), ("ta", "sk</w>"),
    ("i", "t"), ("e", "m</w>"), ("it", "em</w>"), ("o", "f"),
    ("of", "f</w>"), ("c", "l"), ("o", "s"), ("os", "e</w>"),
    ("cl", "ose</w>"), ("b", "o"), ("t", "t"), ("tt", "om</w>"),
    ("o", "m</w>"), ("bo", "ttom</w>"),
]

INSTRUCTIONS = [
    "turn on the faucet",
    "open the top oven door",
    "close the bottom drawer",
    "put the item in the drawer",
    "Turn   OFF the faucet ",   # case + whitespace normalization
    "press 3 buttons; then stop!",  # digits + punctuation runs
]


@pytest.fixture(scope="module")
def tok():
    return ClipBPETokenizer(MERGES)


def test_vocab_layout(tok):
    # 256 bytes + 256 byte</w> + merges + SOT/EOT, EOT has the max id
    assert tok.vocab_size == 512 + len(MERGES) + 2
    assert tok.eot_id == tok.vocab_size - 1
    assert tok.sot_id == tok.vocab_size - 2
    assert tok.id_to_token[tok.eot_id] == EOT


def test_matches_huggingface_clip_tokenizer(tok, tmp_path):
    transformers = pytest.importorskip("transformers")
    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    vocab_file.write_text(json.dumps(tok.vocab_dict()))
    merges_file.write_text(
        "#version: golden\n" + "\n".join(" ".join(m) for m in MERGES) + "\n")
    hf = transformers.CLIPTokenizer(str(vocab_file), str(merges_file))
    for text in INSTRUCTIONS:
        ours = [tok.sot_id] + tok.encode(text) + [tok.eot_id]
        theirs = hf(text).input_ids
        assert ours == theirs, (text, ours, theirs)


def test_framing_padding_truncation(tok):
    arr = tok.tokenize(INSTRUCTIONS[:2], context_length=77)
    assert arr.shape == (2, 77) and arr.dtype == np.int32
    for row in arr:
        assert row[0] == tok.sot_id
        n = int(np.argmax(row))        # EOT is the max id in every row
        assert row[n] == tok.eot_id
        assert (row[n + 1:] == 0).all()
    tiny = tok.tokenize("open the top oven door", context_length=4)
    assert tiny[0, 0] == tok.sot_id and tiny[0, -1] == tok.eot_id
    with pytest.raises(ValueError):
        tok.tokenize("open the top oven door", context_length=4,
                     truncate=False)


def test_roundtrip_and_merges_apply(tok):
    assert tok.decode(tok.encode("open the drawer")) == "open the drawer"
    # whole-word merges actually fire: "faucet" is a single token
    assert len(tok.encode("faucet")) == 1
    # unseen words fall back to finer pieces but still encode
    assert len(tok.encode("zxq")) >= 1


def test_byte_table_reversible():
    t = byte_to_unicode()
    assert len(t) == 256 and len(set(t.values())) == 256
    assert all(not c.isspace() for c in t.values())
